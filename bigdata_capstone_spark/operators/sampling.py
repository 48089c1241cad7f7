"""Seeded distributed sampling (SURVEY §2.9 M9, §2.12 Q4).

The reference sampled 100 random user pairs *on the driver* with unseeded
``random.sample`` over a collected user list (customer_segmentation_2.py:
62-72) — O(users) collect, irreproducible, and a scale wall. Here sampling
is distributed and keyed by a seeded md5 hash, so it is deterministic for a
given seed, independent of partitioning, and never collects the population.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from bigdata_capstone_spark.functions.portable import salted_md5_long


def seeded_sample_n(df: DataFrame, key_col: str, n: int, seed: int = 42) -> DataFrame:
    """Deterministic n-row sample: order by a seeded hash of the key and
    take n. Plans as TakeOrderedAndProject — no global sort materialized."""
    return df.orderBy(
        salted_md5_long(F.col(key_col).cast("string"), seed), F.col(key_col)
    ).limit(n)


def seeded_random_pairs(
    population: DataFrame, key_col: str, n_pairs: int, seed: int = 42
) -> DataFrame:
    """n disjoint random (a, b) pairs with a < b, fully distributed.

    Takes 2n hash-sampled rows, indexes them with row_number over the hash
    order, and mates row 2i with row 2i+1 — the distributed replacement for
    the reference's driver-side ``random.sample(users, 2)`` loop, with an
    explicit seed (Q4 fix).
    """
    sample = seeded_sample_n(population.select(key_col).distinct(), key_col, 2 * n_pairs, seed)
    w = Window.orderBy(
        salted_md5_long(F.col(key_col).cast("string"), seed), F.col(key_col)
    )
    indexed = sample.withColumn("__idx", F.row_number().over(w) - 1)
    left = indexed.filter(F.col("__idx") % 2 == 0).select(
        (F.col("__idx") / 2).cast("long").alias("__pair"),
        F.col(key_col).alias("a"),
    )
    right = indexed.filter(F.col("__idx") % 2 == 1).select(
        ((F.col("__idx") - 1) / 2).cast("long").alias("__pair"),
        F.col(key_col).alias("b"),
    )
    pairs = left.join(right, on="__pair").select(
        F.least("a", "b").alias("userA"), F.greatest("a", "b").alias("userB")
    )
    return pairs
