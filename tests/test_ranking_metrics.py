"""Pin our DataFrame ranking metrics to pyspark.mllib RankingMetrics
semantics on a hand-built micro-fixture (FIXTURES.md B4, SURVEY §7.3).

Cases covered: |pred|>k, |pred|<k, duplicate predictions, all-miss users,
boundary k — exactly the sharp edges SURVEY flags (precision divides by k;
MAP divides by min(|labels|,k); NDCG ideal-DCG term count).
"""

from __future__ import annotations

import math

import pytest

from bigdata_capstone_spark.operators.ranking_metrics import (
    explode_ranked_array,
    per_user_ranking_metrics,
    ranking_metrics,
)

CASES = [
    # (user, predictions_in_rank_order, labels)
    (1, [1, 2, 3, 4, 5, 6], [1, 3, 7]),
    (2, [10, 11], [11, 12, 13, 14]),
    (3, [20, 20, 21], [20]),          # duplicate prediction counts twice
    (4, [30, 31, 32], [40, 41]),      # all misses
]
K = 4


@pytest.fixture(scope="module")
def fixture_dfs(spark):
    preds = spark.createDataFrame(
        [(u, p) for u, p, _ in CASES], ["userId", "pred_items"]
    )
    labels = spark.createDataFrame(
        [(u, i) for u, _, ls in CASES for i in ls], ["userId", "movieId"]
    )
    exploded = explode_ranked_array(preds, "userId", "pred_items")
    return exploded, labels


def mllib_metrics(spark, k):
    from pyspark.mllib.evaluation import RankingMetrics

    rdd = spark.sparkContext.parallelize(
        [(p, ls) for _, p, ls in CASES]
    )
    rm = RankingMetrics(rdd)
    return {
        "precision_at_k": rm.precisionAt(k),
        "map_at_k": rm.meanAveragePrecisionAt(k),
        "ndcg_at_k": rm.ndcgAt(k),
        "recall_at_k": rm.recallAt(k),
    }


def test_global_metrics_match_mllib(spark, fixture_dfs):
    exploded, labels = fixture_dfs
    ours = ranking_metrics(exploded, labels, K).collect()[0].asDict()
    theirs = mllib_metrics(spark, K)
    assert ours["n_users"] == len(CASES)
    for key, want in theirs.items():
        assert math.isclose(ours[key], want, rel_tol=1e-12), (
            key, ours[key], want,
        )


def test_per_user_hand_computed(spark, fixture_dfs):
    exploded, labels = fixture_dfs
    rows = {
        r["userId"]: r.asDict()
        for r in per_user_ranking_metrics(exploded, labels, K).collect()
    }
    # user 1: preds[:4]=[1,2,3,4], hits at pos 0,2 → P=2/4
    assert math.isclose(rows[1]["precision_at_k"], 2 / 4)
    assert math.isclose(rows[1]["recall_at_k"], 2 / 3)
    # AP = (1/1 + 2/3)/min(3,4)
    assert math.isclose(rows[1]["avg_precision_at_k"], (1 + 2 / 3) / 3)
    dcg = 1 / math.log(2) + 1 / math.log(4)
    idcg = sum(1 / math.log(i + 2) for i in range(3))
    assert math.isclose(rows[1]["ndcg_at_k"], dcg / idcg)
    # user 2: short preds, hit at pos 1 → P=1/4 (divides by k!), R=1/4
    assert math.isclose(rows[2]["precision_at_k"], 1 / 4)
    assert math.isclose(rows[2]["recall_at_k"], 1 / 4)
    # user 3: duplicate hits at pos 0 and 1 → hits=2 even though |labels|=1
    assert math.isclose(rows[3]["precision_at_k"], 2 / 4)
    # user 4: all-miss → zeros
    assert rows[4]["precision_at_k"] == 0.0
    assert rows[4]["ndcg_at_k"] == 0.0


def test_multi_k_sweep_equals_single_k_runs(spark):
    """ranking_metrics_at_ks must reproduce the single-k results exactly
    for every cutoff in the sweep."""
    from bigdata_capstone_spark.operators.ranking_metrics import (
        ranking_metrics,
        ranking_metrics_at_ks,
    )

    preds = spark.createDataFrame(
        [
            (u, item, pos)
            for u in range(1, 9)
            for pos, item in enumerate(range(u, u + 12))
        ],
        "userId long, movieId long, pos long",
    )
    labels = spark.createDataFrame(
        [(u, u + d) for u in range(1, 9) for d in (0, 2, 3, 7, 15)],
        "userId long, movieId long",
    )
    ks = [1, 5, 10]
    sweep = {r["k"]: r for r in ranking_metrics_at_ks(preds, labels, ks).collect()}
    for k in ks:
        single = ranking_metrics(preds, labels, k).collect()[0]
        got = sweep[k]
        assert got["n_users"] == single["n_users"]
        for m in ("precision_at_k", "recall_at_k", "map_at_k", "ndcg_at_k"):
            assert abs(got[m] - single[m]) < 1e-12, (k, m)
