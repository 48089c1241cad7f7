"""Temporal joins Spark lacks natively: as-of and bounded range joins.

Not in the reference (SURVEY §2.3 notes their absence) but canonical
OLAP/feature-engineering operators; both are built as compositions of
existing DataFrame ops (guide preference (a)) with shapes that survive
100 TB:

- :func:`asof_join` — "latest right row at or before each left row" via
  the union+window formulation: tag both sides, union, partition by key,
  order by (ts, side), carry the last right value forward. ONE shuffle on
  the key — never a per-row subquery or a skewed inequality join.
- :func:`range_join_within` — pairs within a time delta via bucketization:
  equi-join on floor(ts/delta) plus the adjacent bucket, then exact filter.
  Turns an unbounded theta-join into 2 equi-joins; candidate set is bounded
  by bucket occupancy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    tolerance_us: int | None = None,
) -> DataFrame:
    """For each left row: columns of the latest right row with
    ``right.ts <= left.ts`` (per ``on`` key), null if none (or none within
    ``tolerance_us`` microseconds).

    Output: all left columns + ``asof_<col>`` for each requested right
    column + ``asof_ts_us`` (microsecond timestamp of the matched row).
    """
    right_cols = right_cols or [
        c for c in right.columns if c not in (on, right_ts)
    ]
    l_tag = left.select(
        F.col(on).alias("__k"),
        F.unix_micros(F.col(left_ts)).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*left.columns).alias("__left"),
        F.lit(None).cast(
            right.select(F.struct(*right_cols).alias("s")).schema["s"].dataType
        ).alias("__right"),
    )
    r_tag = right.select(
        F.col(on).alias("__k"),
        F.unix_micros(F.col(right_ts)).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__left"),
        F.struct(*right_cols).alias("__right"),
    )
    # right rows sort before left rows at equal ts (__side 0 < 1) so an
    # exactly-simultaneous right row IS visible to the left row (<=)
    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy("__k")
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__last_right", F.last("__right", ignorenulls=True).over(w)
    ).withColumn(
        "__last_right_ts",
        F.last(F.when(F.col("__side") == 0, F.col("__ts")), ignorenulls=True).over(w),
    )
    out = carried.filter(F.col("__side") == 1)
    if tolerance_us is not None:
        in_range = F.col("__last_right_ts") >= F.col("__ts") - F.lit(tolerance_us)
        out = out.withColumn(
            "__last_right", F.when(in_range, F.col("__last_right"))
        ).withColumn(
            "__last_right_ts", F.when(in_range, F.col("__last_right_ts"))
        )
    cols = [F.col(f"__left.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"__last_right.{c}").alias(f"asof_{c}") for c in right_cols]
    cols.append(F.col("__last_right_ts").alias("asof_ts_us"))
    return out.select(*cols)


def range_join_within(
    left: DataFrame,
    right: DataFrame,
    on: str,
    delta_us: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
    suffix: str = "_r",
) -> DataFrame:
    """All (left, right) pairs with same key and |left.ts − right.ts| ≤
    delta (µs), via bucketized equi-join.

    Each left row joins its own bucket and both neighbors — 3 equi-join
    probes per row, exact predicate applied after. Shuffle is on
    (key, bucket): bounded fan-out, no BroadcastNestedLoopJoin.
    """
    l = left.select(
        F.col(on).alias("__k"),
        F.unix_micros(F.col(left_ts)).alias("__lts"),
        F.struct(*left.columns).alias("__l"),
    ).withColumn(
        "__bucket",
        F.explode(
            F.array(
                F.expr(f"__lts div {delta_us} - 1"),
                F.expr(f"__lts div {delta_us}"),
                F.expr(f"__lts div {delta_us} + 1"),
            )
        ),
    )
    r = right.select(
        F.col(on).alias("__k"),
        F.unix_micros(F.col(right_ts)).alias("__rts"),
        F.struct(*right.columns).alias("__r"),
    ).withColumn("__bucket", F.expr(f"__rts div {delta_us}"))
    joined = l.join(r, on=["__k", "__bucket"]).filter(
        F.abs(F.col("__lts") - F.col("__rts")) <= delta_us
    )
    # each qualifying pair matches exactly one of the left row's three
    # bucket copies (the right row has a single bucket), so no dedup needed
    cols = [F.col(f"__l.{c}").alias(c) for c in left.columns]
    cols += [F.col(f"__r.{c}").alias(f"{c}{suffix}") for c in right.columns]
    return joined.select(*cols)


def ewma_by_key(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    val_col: str = "value",
    alpha: float = 0.3,
) -> DataFrame:
    """Per-key exponentially weighted moving average of ``val_col`` in
    ``ts_col`` order — final smoothed value per key.

    EWMA is a sequential recurrence (acc = α·x + (1-α)·acc) Spark's SQL
    windows cannot express; instead of dropping to Python, the series is
    collected per key as a sorted struct array and folded with
    ``aggregate`` — JVM codegen, deterministic order (ts then value), and
    expressible in DuckDB (``list_reduce`` over ``list(... ORDER BY ...)``)
    for the oracle. Memory bound: one (ts, value) array per key — right
    for bounded per-key series (sensor/user histories); unbounded keys
    should use the streaming stateful op instead
    (streaming.stateful.running_user_totals shape).

    :func:`ewma_by_key_pandas` is the Arrow/pandas twin (same contract)
    covering the ``applyInPandas`` grouped-map surface; tests assert the
    two agree.
    """
    pairs = F.sort_array(
        F.collect_list(F.struct(F.col(ts_col).alias("t"), F.col(val_col).alias("v")))
    )
    fold = F.aggregate(
        pairs,
        F.lit(None).cast("double"),
        lambda acc, s: F.when(acc.isNull(), s["v"].cast("double")).otherwise(
            F.lit(alpha) * s["v"] + F.lit(1.0 - alpha) * acc
        ),
    )
    return (
        df.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            fold.alias("_ewma"),
        )
        .select(
            key_col,
            "n_points",
            F.round(F.col("_ewma"), 6).alias("ewma"),
        )
    )


def ewma_by_key_pandas(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    val_col: str = "value",
    alpha: float = 0.3,
) -> DataFrame:
    """``applyInPandas`` twin of :func:`ewma_by_key`: per-group pandas
    ``ewm(alpha).mean()`` over Arrow batches. The grouped-map surface is
    the right escape hatch when per-group logic genuinely needs pandas
    (model scoring, scipy calls); for plain EWMA the JVM fold above is
    preferred (no Python workers). Shuffle shape is identical: one
    exchange on the group key."""
    import pandas as pd  # noqa: F401  (worker-side import)

    def _ewma(pdf):
        pdf = pdf.sort_values([ts_col, val_col])
        sm = pdf[val_col].ewm(alpha=alpha, adjust=False).mean()
        return pd.DataFrame(
            {
                key_col: [pdf[key_col].iloc[0]],
                "n_points": [len(pdf)],
                "ewma": [round(float(sm.iloc[-1]), 6)],
            }
        )

    out_schema = f"{key_col} long, n_points long, ewma double"
    return df.groupBy(key_col).applyInPandas(_ewma, schema=out_schema)


def acf_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_cols: list[str],
    value_col: str = "value",
    max_lag: int = 3,
    min_points: int = 2,
) -> DataFrame:
    """Lag-k autocorrelation of each key's value series, k = 1..max_lag
    — the stationarity probe of the time-series family (EWMA smooths,
    ACF asks "does the next value remember the last").

    Scale shape: ONE window pass PARTITIONED BY KEY (bounded by the
    per-key series, never global) produces all ``max_lag`` lag columns;
    ``stack`` unpivots them to (lag, lagged_value) rows map-side — a
    generator over the windowed frame, no extra shuffle; one hash
    aggregate per (key, lag) computes the Pearson co-moments
    (aggregates.pearson_by_group: try_divide of covar/stddevs, null-
    filtered — the event_user_type_corr determinism recipe).

    ``order_cols`` must be a total order within each key or the lag
    pairing is nondeterministic.
    """
    from bigdata_capstone_spark.operators import aggregates as agg

    w = Window.partitionBy(*key_cols).orderBy(*order_cols)
    lag_aliases = [f"l{k}" for k in range(1, max_lag + 1)]
    lagged = df.select(
        *key_cols,
        F.col(value_col).alias("__v"),
        *[
            F.lag(value_col, k).over(w).alias(f"l{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    stack_args = ", ".join(f"{k + 1}, {a}" for k, a in enumerate(lag_aliases))
    stacked = lagged.select(
        *key_cols,
        "__v",
        F.expr(f"stack({max_lag}, {stack_args}) AS (lag, lv)"),
    ).filter(F.col("lv").isNotNull())
    out = agg.pearson_by_group(
        stacked, [*key_cols, "lag"], "__v", "lv", min_points=min_points
    )
    return out.select(
        *key_cols,
        "lag",
        F.round("correlation", 6).alias("acf_r"),
        "n_points",
    )
