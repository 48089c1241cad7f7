"""Reference-parity catalog extension with FULL value oracles.

The reference's headline pipelines (customer_segmentation_1/2.py) ran on
MovieLens ratings; our MovieLens-shaped fixture (sources/ratings.py) is
generated from the same md5 PRF in both engines, so the reference's exact
semantics — twin pairs by Jaccard over movie sets, and the twins-vs-random
correlation methodology — get value-hash oracles here instead of the
rows-only checks the ml-estimator variants (movie_twins_lsh, ALS) must
settle for.

- ``movie_twins_exact`` — customer_segmentation_1.py:14-37 semantics with
  the SURVEY Q2 determinism fix: per-user distinct movie sets (≥5 movies),
  exact Jaccard ≥ 0.5 via co-occurrence join, top-100 with (sim, userA,
  userB) tie-break.
- ``hash_pair_correlation`` — customer_segmentation_2.py:58-96 semantics
  (the random-pair correlation baseline) with the Q4 fix taken one step
  further: instead of unseeded driver-side random.sample, pair selection
  is a md5 PRF rank (order users by md5('pair:'||id), pair rank 2k-1 with
  2k) — "random" in the PRF sense yet reproducible in ANY engine, so even
  the sampling step is oracle-checked. Variance>0 and ≥2-common-movie
  guards mirror the reference (customer_segmentation_2.py:59, :88).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_capstone_spark.catalog import register
from bigdata_capstone_spark.functions.portable import md5_long
from bigdata_capstone_spark.sources.ratings import (
    ratings_oracle_cte,
    synthetic_ratings,
)

_CLEAN_SQL = """
    clean AS (
      SELECT userId, movieId, rating FROM ratings
      WHERE userId IS NOT NULL AND movieId IS NOT NULL AND rating IS NOT NULL
    )"""


def _clean_ratings(spark: SparkSession) -> DataFrame:
    return synthetic_ratings(spark).dropna(subset=["userId", "movieId", "rating"])


@register(
    "movie_twins_exact",
    oracle=f"""
    WITH {ratings_oracle_cte()},
    {_CLEAN_SQL},
    ui AS (SELECT DISTINCT userId, movieId FROM clean),
    sizes AS (SELECT userId, count(*) AS n FROM ui GROUP BY userId),
    act AS (SELECT userId FROM sizes WHERE n >= 5),
    common AS (
      SELECT a.userId AS userA, b.userId AS userB, count(*) AS c
      FROM ui a
      JOIN ui b ON a.movieId = b.movieId AND a.userId < b.userId
      JOIN act aa ON aa.userId = a.userId
      JOIN act ab ON ab.userId = b.userId
      GROUP BY 1, 2
    ),
    sims AS (
      SELECT userA, userB,
             c * 1.0 / (sa.n + sb.n - c) AS sim
      FROM common
      JOIN sizes sa ON sa.userId = userA
      JOIN sizes sb ON sb.userId = userB
    )
    SELECT userA, userB, round(sim, 6) AS similarity_r
    FROM sims WHERE sim >= 0.5
    ORDER BY similarity_r DESC, userA, userB
    LIMIT 100
    """,
)
def movie_twins_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 movie-twin pairs by EXACT Jaccard ≥ 0.5 over per-user
    distinct movie sets (≥5 movies) — the reference's headline result
    (capstone_final_report.pdf p.2: identical rating sets ⇒ similarity
    1.0) made deterministic (Q2) and value-checked. The LSH variant
    (movie_twins_lsh) approximates exactly this output."""
    from bigdata_capstone_spark.operators.relational import top_k
    from bigdata_capstone_spark.operators.similarity import exact_jaccard_pairs

    pairs = exact_jaccard_pairs(
        _clean_ratings(spark), min_similarity=0.5, min_items=5
    )
    scored = pairs.select(
        "userA", "userB", F.round("similarity", 6).alias("similarity_r")
    )
    return top_k(
        scored, [F.desc("similarity_r"), F.col("userA"), F.col("userB")], 100
    )


@register(
    "hash_pair_correlation",
    oracle=f"""
    WITH {ratings_oracle_cte()},
    {_CLEAN_SQL},
    active AS (
      SELECT userId FROM clean GROUP BY userId
      HAVING count(*) >= 5 AND var_samp(rating) > 0
    ),
    hashed AS (
      SELECT userId,
             ('0x' || substr(md5('pair:' || userId::VARCHAR), 1, 15))::BIGINT
               AS h
      FROM active
    ),
    sampled AS (
      SELECT userId, row_number() OVER (ORDER BY h, userId) AS rn
      FROM (SELECT * FROM hashed ORDER BY h, userId LIMIT 100)
    ),
    pairs AS (
      SELECT a.userId AS userA, b.userId AS userB
      FROM sampled a JOIN sampled b ON b.rn = a.rn + 1
      WHERE a.rn % 2 = 1
    ),
    joined AS (
      SELECT p.userA, p.userB, ra.rating AS ratingA, rb.rating AS ratingB
      FROM pairs p
      JOIN clean ra ON ra.userId = p.userA
      JOIN clean rb ON rb.userId = p.userB AND rb.movieId = ra.movieId
    ),
    corrs AS (
      SELECT userA, userB, corr(ratingA, ratingB) AS c
      FROM joined GROUP BY userA, userB
      HAVING count(*) >= 2 AND corr(ratingA, ratingB) IS NOT NULL
         AND NOT isnan(corr(ratingA, ratingB))
    )
    SELECT count(*)::BIGINT AS n_pairs,
           round(avg(round(c, 6)), 6) AS avg_correlation
    FROM corrs
    """,
)
def hash_pair_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-baseline pair correlation with PRF sampling: 50 pseudo-random
    active-user pairs (md5 rank pairing — reproducible anywhere, unlike
    rand(seed)), Pearson corr over ≥2 common movies, averaged.

    Scale shape: the PRF top-100 is ``orderBy(h).limit`` →
    TakeOrderedAndProject (per-partition heaps, no global sort); the
    100-row window and pair join are driver-trivial; the per-pair rating
    join broadcasts the 50-pair table against the fact."""
    clean = _clean_ratings(spark)
    active = (
        clean.groupBy("userId")
        .agg(F.count(F.lit(1)).alias("n"), F.variance("rating").alias("v"))
        .filter((F.col("n") >= 5) & (F.col("v") > 0))
        .select("userId")
    )
    hashed = active.select(
        "userId", md5_long(F.concat(F.lit("pair:"), F.col("userId"))).alias("h")
    )
    top100 = hashed.orderBy("h", "userId").limit(100)
    sampled = top100.select(
        "userId", F.row_number().over(Window.orderBy("h", "userId")).alias("rn")
    )
    a = sampled.select(F.col("userId").alias("userA"), F.col("rn").alias("rnA"))
    b = sampled.select(F.col("userId").alias("userB"), F.col("rn").alias("rnB"))
    pairs = (
        a.join(b, F.col("rnB") == F.col("rnA") + 1)
        .filter(F.col("rnA") % 2 == 1)
        .select("userA", "userB")
    )
    ra = clean.select(
        F.col("userId").alias("userA"), "movieId", F.col("rating").alias("ratingA")
    )
    rb = clean.select(
        F.col("userId").alias("userB"), "movieId", F.col("rating").alias("ratingB")
    )
    joined = F.broadcast(pairs).join(ra, on="userA").join(rb, on=["userB", "movieId"])
    corrs = (
        joined.groupBy("userA", "userB")
        .agg(
            F.corr("ratingA", "ratingB").alias("c"),
            F.count(F.lit(1)).alias("n_points"),
        )
        .filter(
            (F.col("n_points") >= 2)
            & F.col("c").isNotNull()
            & ~F.isnan(F.col("c"))
        )
    )
    return corrs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg(F.round("c", 6)), 6).alias("avg_correlation"),
    )
