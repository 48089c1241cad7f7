"""Grouped statistics (SURVEY §2.4 A1-A9).

Count/avg/variance/Pearson-corr/collect_list per group — the reference's
aggregation surface (splitting_data.py:19; popularity_model.py:28-31;
customer_segmentation_2.py:36-38,58) — with two hardenings:

- money-like sums/means go through exact DECIMAL accumulation
  (:mod:`bigdata_capstone_spark.functions.portable`) so results are
  reduction-order independent (hash-oracle stable);
- collected lists get an explicit total order + string join (SURVEY Q1:
  the reference's ``collect_list`` after shuffle has no guaranteed order).

All are single-pass hash aggregations with map-side partial aggregation —
the shape that scales: shuffle carries one partial state per (task, group),
not raw rows (contrast the reference's RDD ``groupByKey`` at
als_recommendation.py:26,31 which shuffles every row).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from bigdata_capstone_spark.functions.portable import exact_avg, exact_sum


def grouped_stats(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    scale: int = 2,
) -> DataFrame:
    """count / exact mean / min / max of ``value`` per group (A1-A3)."""
    return df.groupBy(*keys).agg(
        F.count(value).alias("n"),
        exact_avg(value, scale).alias("avg_value"),
        F.min(value).alias("min_value"),
        F.max(value).alias("max_value"),
    )


def damped_mean(count_col: Column, sum_col: Column, damping: float) -> Column:
    """The reference's damped popularity score: ``avg·n/(n+β)`` ≡ ``sum/(n+β)``
    (popularity_model.py:37; SURVEY Q9 — a damped mean-scaled score, not a
    Bayesian average)."""
    return sum_col / (count_col + F.lit(float(damping)))


def pearson_by_group(
    df: DataFrame,
    keys: Sequence[str],
    x: str,
    y: str,
    min_points: int = 2,
) -> DataFrame:
    """Pearson correlation per group (A5), null-filtered.

    ``corr`` is null for <2 points (SURVEY Q6; customer_segmentation_2.py:38
    filters the nulls). We additionally expose the point count so callers
    can assert the ≥2-common-items invariant.

    Computed as ``try_divide(covar_samp, stddev·stddev)`` rather than
    ``F.corr``: under ANSI mode (Spark 4 default) ``corr`` RAISES
    Division-by-zero when one side is constant within a group (zero
    variance), whereas the reference's semantics — and every SQL oracle —
    treat that as null-and-filtered. Identical value to within an ulp
    (same co-moments, one extra division pair), and callers round for the
    oracle anyway.
    """
    out = df.groupBy(*keys).agg(
        F.expr(
            f"try_divide(covar_samp({x}, {y}), "
            f"stddev_samp({x}) * stddev_samp({y}))"
        ).alias("correlation"),
        F.count(F.lit(1)).alias("n_points"),
    )
    return out.filter(
        F.col("correlation").isNotNull()
        & ~F.isnan("correlation")
        & (F.col("n_points") >= min_points)
    )


def variance_by_group(df: DataFrame, keys: Sequence[str], value: str) -> DataFrame:
    """Sample variance per group (A4; customer_segmentation_2.py:58)."""
    return df.groupBy(*keys).agg(F.variance(value).alias("variance"))


def sorted_list_agg(
    df: DataFrame,
    keys: Sequence[str],
    order: str,
    item: str,
    *,
    descending_order: bool = False,
    k: int | None = None,
    out_col: str = "items",
) -> DataFrame:
    """Deterministically ordered per-group item list (A6 + Q1 fix).

    ``collect_list`` order after a shuffle is unspecified, which silently
    corrupted the reference's ranked lists (popularity_model.py:46-48 computes
    ranks then discards them). Here: collect ``struct(order, item)``, sort
    the array, optionally truncate to k, project items.
    """
    ord_col = F.col(order)
    if descending_order:
        ord_col = -ord_col
    collected = df.groupBy(*keys).agg(
        F.sort_array(F.collect_list(F.struct(ord_col.alias("o"), F.col(item).alias("i")))).alias("_s")
    )
    arr = F.col("_s.i")
    if k is not None:
        arr = F.slice(arr, 1, k)
    return collected.select(*keys, arr.alias(out_col))


def sorted_list_string(
    df: DataFrame,
    keys: Sequence[str],
    order: str,
    item: str,
    **kwargs,
) -> DataFrame:
    """:func:`sorted_list_agg` with the list joined to a ``,``-string —
    array-free output for schema-stable oracle comparison."""
    out_col = kwargs.pop("out_col", "items")
    df2 = sorted_list_agg(df, keys, order, item, out_col=out_col, **kwargs)
    return df2.withColumn(out_col, F.array_join(F.col(out_col).cast("array<string>"), ","))


def approx_stats(
    df: DataFrame,
    keys: Sequence[str],
    value: str,
    distinct_col: str,
    quantiles: Sequence[float] = (0.5, 0.95, 0.99),
    accuracy: int = 10000,
) -> DataFrame:
    """The documented 100 TB scale path for distinct counts and quantiles
    (SCALE.md): single-pass mergeable sketches instead of exact shuffles.

    - ``approx_count_distinct`` — HyperLogLog++, fixed-size state per
      group, no expand/distinct shuffle (exact count-distinct doubles the
      shuffle width per distinct column);
    - ``percentile_approx`` — Greenwald-Khanna sketch, mergeable map-side,
      no per-group sort (exact percentiles need row-position windows).

    Approximate ⇒ engine-specific results: no DuckDB hash oracle — tests
    assert relative error against the exact aggregates at test scale.
    """
    qcols = [
        F.percentile_approx(value, q, accuracy).alias(
            f"p{str(q).replace('0.', '')}_approx"
        )
        for q in quantiles
    ]
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.approx_count_distinct(distinct_col).alias("n_distinct_approx"),
        *qcols,
    )


def global_stats(df: DataFrame, value: str, scale: int = 2) -> DataFrame:
    """No-group aggregate (A7): one row of count/exact-sum/exact-mean."""
    return df.agg(
        F.count(value).alias("n"),
        exact_sum(value, scale).alias("sum_value"),
        exact_avg(value, scale).alias("avg_value"),
    )
