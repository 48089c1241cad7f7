"""Single-pass table profiling (data-quality audit).

One aggregation job computes, for every column: null count, approximate
distinct count (HLL++), min and max — the pre-flight check a pipeline
runs before trusting an input drop. Everything lands in ONE wide
aggregate (4 expressions per column, all mergeable sketches/extremes),
so the cost is a single scan regardless of column count — versus the
naive per-column loop that scans the table N times (the reference's
repeated count() anti-pattern, SURVEY §4.2-4, generalized).

Output is long format (column, metric, value-as-string) so profiles of
any table share one schema and can be unioned/diffed across runs —
drift detection is ``profile(today) JOIN profile(yesterday)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, rsd: float = 0.05) -> DataFrame:
    """(column, metric, value) stats via one wide aggregate.

    Metrics per column: ``n_nulls``, ``approx_distinct`` (HLL++, relative
    std dev ``rsd``), ``min``, ``max`` — plus a table-level ``n_rows``.
    Values are stringified (mixed source types in one output column).
    """
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in df.columns:
        col = F.col(c)
        aggs.append(F.count_if(col.isNull()).alias(f"{c}__n_nulls"))
        aggs.append(F.approx_count_distinct(c, rsd=rsd).alias(f"{c}__approx_distinct"))
        aggs.append(F.min(col).cast("string").alias(f"{c}__min"))
        aggs.append(F.max(col).cast("string").alias(f"{c}__max"))
    wide = df.agg(*aggs)

    pairs = [
        F.struct(
            F.lit("__table__").alias("column"),
            F.lit("n_rows").alias("metric"),
            F.col("__n_rows").cast("string").alias("value"),
        )
    ]
    for c in df.columns:
        for m in ("n_nulls", "approx_distinct", "min", "max"):
            pairs.append(
                F.struct(
                    F.lit(c).alias("column"),
                    F.lit(m).alias("metric"),
                    F.col(f"{c}__{m}").cast("string").alias("value"),
                )
            )
    return wide.select(F.explode(F.array(*pairs)).alias("s")).select(
        "s.column", "s.metric", "s.value"
    )
