"""ALS collaborative-filtering wrapper (SURVEY §2.9 M6; als_recommendation.py).

Thin by design — ``pyspark.ml.recommendation.ALS`` is the right primitive.
What the rebuild changes vs. the reference:

- top-k per user comes from ``recommendForAllUsers(k)`` (blocked factor
  matmul inside the JVM) instead of transform-all-pairs + window rank
  (als_recommendation.py:19-24);
- evaluation feeds the DataFrame-native ranking metrics directly — the
  reference's ``collect()``/``parallelize()`` round-trip and RDD
  ``groupByKey`` (als_recommendation.py:26-34; SURVEY §4.2-1/2) are gone;
- ``coldStartStrategy="drop"`` kept (als_recommendation.py:15).

ALS factor reductions are float and order-dependent → metrics are checked
with tolerance, never value-hashed (SURVEY §7.3).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class ALSResult:
    model: object
    recommendations: DataFrame  # (user, item, pos) exploded, rank order


def train_als_recommend(
    train: DataFrame,
    k: int = 100,
    rank: int = 10,
    reg_param: float = 0.05,
    max_iter: int = 10,
    seed: int = 42,
    user_col: str = "userId",
    item_col: str = "movieId",
    rating_col: str = "rating",
    implicit_prefs: bool = False,
    alpha: float = 1.0,
) -> ALSResult:
    """Fit ALS and return exploded top-k recommendations per user.

    ``implicit_prefs=True`` switches to the implicit-feedback objective
    (Hu/Koren/Volinsky): ratings become confidence weights
    ``1 + alpha·r`` over binary preference — the right mode when the
    signal is counts (views, clicks, purchases) rather than explicit
    scores. Same factor shapes, same recommend path.
    """
    from pyspark.ml.recommendation import ALS

    als = ALS(
        userCol=user_col,
        itemCol=item_col,
        ratingCol=rating_col,
        rank=rank,
        maxIter=max_iter,
        regParam=reg_param,
        coldStartStrategy="drop",
        seed=seed,
        implicitPrefs=implicit_prefs,
        alpha=alpha,
    )
    model = als.fit(train)
    recs = model.recommendForAllUsers(k)
    exploded = recs.select(
        user_col, F.posexplode("recommendations").alias("pos", "rec")
    ).select(user_col, F.col("rec." + item_col).alias(item_col), "pos")
    return ALSResult(model=model, recommendations=exploded)


def grid_search_als(
    train: DataFrame,
    val_labels: DataFrame,
    ranks: list[int],
    reg_params: list[float],
    k: int = 100,
    metric: str = "ndcg_at_k",
    **als_kwargs,
) -> tuple[dict, list[dict]]:
    """Grid search à la als_recommendation.py:47-72: train per (rank, reg),
    score NDCG@k on validation labels, return (best, all results)."""
    from bigdata_capstone_spark.operators.ranking_metrics import ranking_metrics

    results = []
    for r in ranks:
        for reg in reg_params:
            res = train_als_recommend(train, k=k, rank=r, reg_param=reg, **als_kwargs)
            row = ranking_metrics(
                res.recommendations, val_labels, k,
                user_col=als_kwargs.get("user_col", "userId"),
                item_col=als_kwargs.get("item_col", "movieId"),
            ).collect()[0]
            results.append({"rank": r, "regParam": reg, **row.asDict()})
    best = max(results, key=lambda d: d[metric])
    return best, results
