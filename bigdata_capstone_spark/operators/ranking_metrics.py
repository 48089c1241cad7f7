"""DataFrame-native ranking metrics (SURVEY §2.9 M7, §7.3).

Reimplements ``pyspark.mllib.evaluation.RankingMetrics`` (used at
popularity_model.py:61-67 and als_recommendation.py:37-42 via a
collect()/parallelize() RDD detour, SURVEY §4.2-1) as ONE hash-aggregation
pass over pure DataFrame ops — Arrow-fast, shuffle-minimal, and ANSI-SQL
expressible so the DuckDB oracle can check it.

Pinned mllib semantics (RankingMetrics.scala, Spark 3.x):

- ``precisionAt(k)``   = |hits in first min(k,|pred|) predictions| / k
  (divides by k even when |pred| < k)
- ``recallAt(k)``      = same hit count / |label set|
- ``meanAveragePrecisionAt(k)``: per user
  sum over hit positions i<min(k,|pred|) of (hits≤i)/(i+1), divided by
  min(|labels|, k)
- ``ndcgAt(k)``: binary gain 1/ln(i+2) at position i; DCG over the first
  min(k,|pred|) predictions; ideal DCG = sum of the first min(|labels|,k)
  gains
- duplicates in the prediction list count at every occurrence (no dedup);
  the label set is a set
- users with an empty label set score 0 on all metrics

Universe semantics: the reference pairs predictions with labels via an
*inner* join on user (popularity_model.py:58, als_recommendation.py:33), so
users lacking either side are excluded — we preserve that.

Scale shape: explode(preds) is a narrow op; one shuffle groups by user
(window + final agg share the same hash partitioning on user, so Catalyst
reuses the exchange); global means are a tiny second-stage reduce. No
driver round-trip, no RDD.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def per_user_ranking_metrics(
    preds: DataFrame,
    labels: DataFrame,
    k: int,
    user_col: str = "userId",
    item_col: str = "movieId",
    pos_col: str = "pos",
) -> DataFrame:
    """Per-user P@k / Recall@k / AP@k / NDCG@k.

    ``preds``: exploded ranked predictions ``(user, item, pos)`` with pos
    0-based by rank (callers with array columns: ``posexplode`` first).
    ``labels``: relevant ``(user, item)`` pairs (dedup'd here).

    Returns one row per user present in BOTH inputs with columns
    ``precision_at_k, recall_at_k, avg_precision_at_k, ndcg_at_k``.
    """
    p = preds.select(
        F.col(user_col).alias("u"),
        F.col(item_col).alias("i"),
        F.col(pos_col).cast("long").alias("pos"),
    ).filter(F.col("pos") < k)
    lab = labels.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("i")
    ).distinct()
    label_counts = lab.groupBy("u").agg(F.count(F.lit(1)).alias("m"))

    marked = p.join(
        lab.withColumn("hit", F.lit(1)), on=["u", "i"], how="left"
    ).fillna({"hit": 0})

    w = Window.partitionBy("u").orderBy("pos")
    scored = marked.withColumn("cum_hits", F.sum("hit").over(w)).select(
        "u",
        "hit",
        (F.col("hit") * F.col("cum_hits") / (F.col("pos") + 1)).alias("ap_contrib"),
        (F.col("hit") / F.log(F.col("pos") + 2)).alias("dcg_contrib"),
    )
    per_user = scored.groupBy("u").agg(
        F.sum("hit").alias("hits"),
        F.sum("ap_contrib").alias("ap_num"),
        F.sum("dcg_contrib").alias("dcg"),
    )

    # ideal DCG over min(m, k) unit gains, evaluated per user from m alone
    m_eff = F.least(F.col("m"), F.lit(k))
    max_dcg = F.aggregate(
        F.sequence(F.lit(1), m_eff),
        F.lit(0.0),
        lambda acc, x: acc + 1.0 / F.log(x.cast("double") + 1.0),
    )
    return (
        per_user.join(label_counts, on="u")
        .select(
            F.col("u").alias(user_col),
            (F.col("hits") / F.lit(float(k))).alias("precision_at_k"),
            (F.col("hits") / F.col("m")).alias("recall_at_k"),
            (F.col("ap_num") / m_eff).alias("avg_precision_at_k"),
            (F.col("dcg") / max_dcg).alias("ndcg_at_k"),
        )
    )


def ranking_metrics(
    preds: DataFrame,
    labels: DataFrame,
    k: int,
    user_col: str = "userId",
    item_col: str = "movieId",
    pos_col: str = "pos",
) -> DataFrame:
    """Global means of the four metrics — the numbers the reference printed
    (popularity_model.py:85-103). One row:
    ``(n_users, precision_at_k, recall_at_k, map_at_k, ndcg_at_k)``."""
    pu = per_user_ranking_metrics(preds, labels, k, user_col, item_col, pos_col)
    return pu.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.avg("precision_at_k").alias("precision_at_k"),
        F.avg("recall_at_k").alias("recall_at_k"),
        F.avg("avg_precision_at_k").alias("map_at_k"),
        F.avg("ndcg_at_k").alias("ndcg_at_k"),
    )


def explode_ranked_array(
    df: DataFrame, user_col: str, array_col: str, item_col: str = "movieId"
) -> DataFrame:
    """Adapter: ``(user, [item...])`` array form → exploded ``(user, item,
    pos)`` rows consumed by the metric functions (pos is 0-based)."""
    return df.select(
        F.col(user_col), F.posexplode(F.col(array_col)).alias("pos", item_col)
    )


def ranking_metrics_at_ks(
    preds: DataFrame,
    labels: DataFrame,
    ks: list[int],
    user_col: str = "userId",
    item_col: str = "movieId",
    pos_col: str = "pos",
) -> DataFrame:
    """Global P@k / Recall@k / MAP@k / NDCG@k for SEVERAL cutoffs in ONE
    pass — the evaluation-sweep shape (k ∈ {10, 50, 100}) without
    re-scanning predictions per k. Same pinned mllib semantics as
    :func:`per_user_ranking_metrics`; per-k quantities are conditional
    aggregates over a single exploded+windowed frame, so the whole sweep
    costs one shuffle on user + one tiny reduce.

    Returns one row per k: (k, n_users, precision_at_k, recall_at_k,
    map_at_k, ndcg_at_k).
    """
    kmax = max(ks)
    p = preds.select(
        F.col(user_col).alias("u"),
        F.col(item_col).alias("i"),
        F.col(pos_col).cast("long").alias("pos"),
    ).filter(F.col("pos") < kmax)
    lab = labels.select(
        F.col(user_col).alias("u"), F.col(item_col).alias("i")
    ).distinct()
    label_counts = lab.groupBy("u").agg(F.count(F.lit(1)).alias("m"))

    marked = p.join(
        lab.withColumn("hit", F.lit(1)), on=["u", "i"], how="left"
    ).fillna({"hit": 0})
    w = Window.partitionBy("u").orderBy("pos")
    scored = marked.withColumn("cum_hits", F.sum("hit").over(w))

    aggs = []
    for k in ks:
        in_k = F.col("pos") < k
        aggs.append(F.sum(F.when(in_k, F.col("hit")).otherwise(0)).alias(f"hits_{k}"))
        aggs.append(
            F.sum(
                F.when(
                    in_k,
                    F.col("hit") * F.col("cum_hits") / (F.col("pos") + 1),
                ).otherwise(0.0)
            ).alias(f"apnum_{k}")
        )
        aggs.append(
            F.sum(
                F.when(in_k, F.col("hit") / F.log(F.col("pos") + 2)).otherwise(0.0)
            ).alias(f"dcg_{k}")
        )
    per_user = scored.groupBy("u").agg(*aggs).join(label_counts, on="u")

    rows = []
    for k in ks:
        m_eff = F.least(F.col("m"), F.lit(k))
        max_dcg = F.aggregate(
            F.sequence(F.lit(1), m_eff),
            F.lit(0.0),
            lambda acc, x: acc + 1.0 / F.log(x.cast("double") + 1.0),
        )
        rows.append(
            F.struct(
                F.lit(k).alias("k"),
                (F.col(f"hits_{k}") / F.lit(float(k))).alias("precision_at_k"),
                (F.col(f"hits_{k}") / F.col("m")).alias("recall_at_k"),
                (F.col(f"apnum_{k}") / m_eff).alias("avg_precision_at_k"),
                (F.col(f"dcg_{k}") / max_dcg).alias("ndcg_at_k"),
            )
        )
    long = per_user.select(F.explode(F.array(*rows)).alias("s")).select("s.*")
    return (
        long.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.avg("precision_at_k").alias("precision_at_k"),
            F.avg("recall_at_k").alias("recall_at_k"),
            F.avg("avg_precision_at_k").alias("map_at_k"),
            F.avg("ndcg_at_k").alias("ndcg_at_k"),
        )
        .orderBy("k")
    )
