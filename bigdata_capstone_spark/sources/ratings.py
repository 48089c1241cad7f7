"""Deterministic MovieLens-shaped ratings fixture (FIXTURES.md B1).

The reference's core input is ``ratings.csv(userId, movieId, rating,
timestamp)`` (splitting_data.py:13-16). The driver testdata has no such
table, so reference-exact semantics (splits, popularity, twins, corr) are
exercised on this synthetic table: generated *distributed* (``spark.range``
+ md5-derived pseudo-randomness — no driver-side loops, unlike
customer_segmentation_2.py:62-69) and fully determined by ``seed``.

Embedded edge cases required by the reference's semantics quirks
(SURVEY §2.12):
- two user pairs with *identical* movie sets → Jaccard 1.0 twins (Q2)
- a pair with exactly one common movie → corr is null (Q6)
- a constant rater → rating variance 0, filtered (customer_segmentation_2.py:59)
- users with <5 ratings and movies with <5 ratings → activity filters bite
- rows with null rating/movieId → dropna path (splitting_data.py:16)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_capstone_spark.functions.portable import MD5_LONG_MAX, salted_md5_long
from bigdata_capstone_spark.sources.tables import RATINGS_SCHEMA


def _u01(col, salt: int):
    """Deterministic uniform [0,1) from an id column."""
    return salted_md5_long(col.cast("string"), salt) / F.lit(float(MD5_LONG_MAX))


def synthetic_ratings(
    spark: SparkSession,
    n_rows: int = 20_000,
    n_users: int = 200,
    n_movies: int = 300,
    seed: int = 42,
) -> DataFrame:
    """Zipf-skewed ratings table with the B1 edge cases appended."""
    u1 = _u01(F.col("id"), seed + 1)
    base = spark.range(n_rows).select(
        (F.floor(_u01(F.col("id"), seed) * n_users)).alias("userId"),
        # cube the uniform → head-heavy movie popularity so twin candidates
        # and <5-rating tail movies both exist. Explicit u·u·u, NOT pow(u,3):
        # pow is correctly-rounded to the true cube while (u·u)·u rounds
        # twice — engines' libm pow implementations differ in the last ulp,
        # the two-multiply form is bit-identical everywhere (oracle CTE).
        (F.floor(u1 * u1 * u1 * n_movies)).alias("movieId"),
        (0.5 + F.floor(_u01(F.col("id"), seed + 2) * 10) * 0.5).alias("rating"),
        (F.lit(1_500_000_000) + (salted_md5_long(F.col("id").cast("string"), seed + 3) % 100_000_000)).alias(
            "timestamp"
        ),
    )
    # one rating per (user, movie), deterministically keeping the max rating
    base = base.groupBy("userId", "movieId").agg(
        F.max("rating").alias("rating"), F.max("timestamp").alias("timestamp")
    )

    twin_movies_a = [11, 23, 35, 47, 59, 71]
    twin_movies_b = [12, 24, 36, 48, 60]
    special = []
    # twins: identical movie sets, correlated-but-not-identical ratings
    for i, m in enumerate(twin_movies_a):
        special.append((9001, m, 1.0 + 0.5 * i, 1_600_000_000 + i))
        special.append((9002, m, 1.5 + 0.5 * i, 1_600_000_100 + i))
    for i, m in enumerate(twin_movies_b):
        special.append((9003, m, 5.0 - 0.5 * i, 1_600_000_200 + i))
        special.append((9004, m, 4.5 - 0.5 * i, 1_600_000_300 + i))
    # exactly one common movie (corr undefined → null, Q6)
    special += [(9005, 101, 4.0, 1_600_001_000), (9005, 102, 3.0, 1_600_001_001),
                (9005, 103, 2.0, 1_600_001_002), (9005, 104, 5.0, 1_600_001_003),
                (9005, 105, 1.0, 1_600_001_004),
                (9006, 101, 2.0, 1_600_001_100), (9006, 111, 3.5, 1_600_001_101),
                (9006, 112, 4.5, 1_600_001_102), (9006, 113, 0.5, 1_600_001_103),
                (9006, 114, 3.0, 1_600_001_104)]
    # constant rater (variance 0)
    special += [(9007, m, 3.0, 1_600_002_000 + m) for m in (11, 23, 35, 47, 59)]
    # low-activity user (<5 ratings)
    special += [(9008, 11, 4.0, 1_600_003_000), (9008, 23, 2.0, 1_600_003_001)]
    special_df = spark.createDataFrame(special, ["userId", "movieId", "rating", "timestamp"])

    nulls = spark.createDataFrame(
        [(9101, 11, None, 1_600_004_000), (9102, None, 3.0, 1_600_004_001)],
        RATINGS_SCHEMA,
    )

    df = base.unionByName(special_df).unionByName(nulls)
    return df.select(
        F.col("userId").cast("long"),
        F.col("movieId").cast("long"),
        F.col("rating").cast("double"),
        F.col("timestamp").cast("long"),
    )


def synthetic_structured_ratings(
    spark: SparkSession,
    n_rows: int = 20_000,
    n_users: int = 200,
    n_movies: int = 300,
    latent_dim: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Ratings with genuine LATENT-FACTOR structure (deterministic).

    The plain :func:`synthetic_ratings` fixture draws rating independent
    of (user, movie) — pure noise, on which a personalized model cannot
    beat a global ranking. The reference's model-comparison finding (ALS
    NDCG 0.9720 > popularity 0.7879 on MovieLens, capstone_final_report
    p.5-6) needs preference structure to reproduce: here each user and
    movie gets a ``latent_dim``-dim PRF vector with entries in [-1, 1],
    and rating = half-star rounding of ``3 + 0.75·(p_u·q_m)`` clipped to
    [0.5, 5]. ALS can recover the factors; a single global popularity
    ordering cannot, so the directional gap is structural, not luck.
    Fully determined by ``seed`` (md5 PRF, distributed generation).
    """

    def latent(col, who: str, d: int):
        return _u01(F.concat(F.lit(f"{who}{d}:"), col.cast("string")), seed + 100 + d) * 2 - 1

    base = spark.range(n_rows).select(
        (F.floor(_u01(F.col("id"), seed) * n_users)).alias("userId"),
        (F.floor(_u01(F.col("id"), seed + 1) * n_movies)).alias("movieId"),
    ).dropDuplicates(["userId", "movieId"])
    dot = None
    for d in range(latent_dim):
        term = latent(F.col("userId"), "u", d) * latent(F.col("movieId"), "m", d)
        dot = term if dot is None else dot + term
    raw = F.lit(3.0) + F.lit(0.75) * dot
    clipped = F.greatest(F.lit(0.5), F.least(F.lit(5.0), raw))
    rating = F.floor(clipped * 2 + 0.5) / 2
    return base.select(
        F.col("userId").cast("long"),
        F.col("movieId").cast("long"),
        rating.cast("double").alias("rating"),
        F.lit(1_500_000_000).alias("timestamp"),
    )


def ratings_oracle_cte(
    n_rows: int = 20_000,
    n_users: int = 200,
    n_movies: int = 300,
    seed: int = 42,
) -> str:
    """DuckDB CTE body reproducing :func:`synthetic_ratings` bit-for-bit
    (timestamp column omitted — no catalog query reads it).

    Every pseudo-random draw is the same md5 PRF both engines evaluate
    identically (functions/portable.py), so queries over the ratings
    fixture get full value-hash oracles, not rows-only checks. Use as:
    ``WITH {ratings_oracle_cte()}, mine AS (... FROM ratings ...)``.
    """

    def u(salt: int) -> str:
        return (
            f"(('0x' || substr(md5('{salt}:' || i::VARCHAR), 1, 15))::BIGINT"
            f" / {float(MD5_LONG_MAX)!r})"
        )

    specials = []
    twin_movies_a = [11, 23, 35, 47, 59, 71]
    twin_movies_b = [12, 24, 36, 48, 60]
    for i, m in enumerate(twin_movies_a):
        specials.append((9001, m, 1.0 + 0.5 * i))
        specials.append((9002, m, 1.5 + 0.5 * i))
    for i, m in enumerate(twin_movies_b):
        specials.append((9003, m, 5.0 - 0.5 * i))
        specials.append((9004, m, 4.5 - 0.5 * i))
    specials += [(9005, 101, 4.0), (9005, 102, 3.0), (9005, 103, 2.0),
                 (9005, 104, 5.0), (9005, 105, 1.0),
                 (9006, 101, 2.0), (9006, 111, 3.5), (9006, 112, 4.5),
                 (9006, 113, 0.5), (9006, 114, 3.0)]
    specials += [(9007, m, 3.0) for m in (11, 23, 35, 47, 59)]
    specials += [(9008, 11, 4.0), (9008, 23, 2.0)]
    special_rows = ", ".join(f"({u_}, {m}, {r!r})" for u_, m, r in specials)

    return f"""
    __r_base AS (
      SELECT floor({u(seed)} * {n_users})::BIGINT AS userId,
             floor({u(seed + 1)} * {u(seed + 1)} * {u(seed + 1)}
                   * {n_movies})::BIGINT AS movieId,
             (0.5 + floor({u(seed + 2)} * 10) * 0.5)::DOUBLE AS rating
      FROM generate_series(0, {n_rows - 1}) t(i)
    ),
    __r_dedup AS (
      SELECT userId, movieId, max(rating) AS rating
      FROM __r_base GROUP BY userId, movieId
    ),
    __r_special (userId, movieId, rating) AS (VALUES {special_rows}),
    ratings AS (
      SELECT userId::BIGINT AS userId, movieId::BIGINT AS movieId,
             rating::DOUBLE AS rating
      FROM __r_dedup
      UNION ALL
      SELECT userId::BIGINT, movieId::BIGINT, rating::DOUBLE FROM __r_special
      UNION ALL
      SELECT * FROM (VALUES (9101::BIGINT, 11::BIGINT, NULL::DOUBLE),
                            (9102::BIGINT, NULL::BIGINT, 3.0::DOUBLE))
    )"""
