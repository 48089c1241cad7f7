"""Table-maintenance planning: small-file compaction.

The 100 TB failure mode this addresses: a streaming or fine-grained
batch writer leaves thousands of KB-sized files per table partition,
and every subsequent scan pays per-file open/footer costs that dwarf the
read itself (the "small files problem"). Engines fix it with a periodic
OPTIMIZE/compaction pass — Delta Lake's OPTIMIZE, Iceberg's
rewrite_data_files — whose first stage is exactly this operator: turn a
file inventory into deterministic compaction groups of ~target output
size. The rewrite itself is then one task per group reading its members
and writing one file.

The planner is pure DataFrame arithmetic over the inventory frame (one
row per file), so it is SQL-expressible and oracle-checkable; listing
the inventory (file path, size) comes from the table metadata layer
(filesystem listing / Delta log / Iceberg manifest), not from SQL, and
is the caller's input.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    files: DataFrame,
    target_bytes: int,
    partition_col: str = "part_key",
    size_col: str = "bytes",
    order_col: str = "file_id",
) -> DataFrame:
    """Assign every file to a compaction group of ~``target_bytes``.

    Semantics (deterministic, engine-portable): within each table
    partition, files are taken in ``order_col`` order and group k holds
    the files whose EXCLUSIVE cumulative byte prefix falls in
    [k*target, (k+1)*target) — fixed-quota sequential packing. A file
    can straddle a quota boundary (its group is decided by the bytes
    BEFORE it), so groups end between target and target+max_file bytes:
    the same guarantee Delta's binPacking gives, without the
    order-sensitive first-fit heuristics that a distributed engine
    can't replay deterministically.

    Output: the input columns plus ``group_id`` (int, 0-based per
    partition). Downstream, one rewrite task per (partition, group_id)
    reads its members and writes one ~target-sized file; groups with a
    single member are already compact and get skipped by the executor.

    Scale shape: ONE window, partitioned by the table-partition key —
    the number of files per partition is bounded by the writer's task
    count (the very quantity being repaired), so the window never sees
    an unbounded partition; all arithmetic is BIGINT (exact prefix
    sums, integer division), no float boundary risk.
    """
    w = (
        Window.partitionBy(partition_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before: Column = F.coalesce(
        F.sum(F.col(size_col).cast("long")).over(w), F.lit(0).cast("long")
    )
    return (
        files.withColumn("__cum_before", cum_before)
        .withColumn(
            "group_id",
            F.expr(f"CAST(__cum_before DIV {int(target_bytes)} AS INT)"),
        )
        .drop("__cum_before")
    )


def key_overlap_depth(
    files: DataFrame,
    partition_col: str = "part_key",
    min_col: str = "min_key",
    max_col: str = "max_key",
) -> DataFrame:
    """Clustering-quality metric per table partition: the maximum number
    of files whose [min_key, max_key] ranges overlap at any key point —
    Iceberg/Delta's "overlap depth". Depth 1 means the files are
    perfectly sorted (a key-range scan opens one file); depth = n_files
    means every file covers every key (a point lookup opens them all)
    and the partition needs a re-cluster/OPTIMIZE-ZORDER pass. This is
    the decision input for when to run the rewrite whose grouping
    :func:`compaction_plan` computes.

    Algorithm: the classic sweep — each file contributes a (+1 at
    min_key) and a (-1 at max_key) event; within a partition, events
    sort by (point, delta DESC) so a file starting exactly where
    another ends counts as overlapping (inclusive ranges); the running
    sum's maximum is the depth. Ties among identical (point, delta)
    rows don't affect the max (equal deltas commute in a prefix sum).

    Scale shape: ONE window partitioned by the table-partition key over
    2 x files-per-partition rows — metadata-sized, bounded by the
    writer's task count, never row data. All-integer arithmetic."""
    starts = files.select(
        F.col(partition_col),
        F.col(min_col).alias("point"),
        F.lit(1).alias("delta"),
    )
    ends = files.select(
        F.col(partition_col),
        F.col(max_col).alias("point"),
        F.lit(-1).alias("delta"),
    )
    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.col("point"), F.desc("delta"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        starts.unionByName(ends)
        .withColumn("__depth", F.sum("delta").over(w))
        .groupBy(partition_col)
        .agg(
            (F.count(F.lit(1)) / 2).cast("long").alias("n_files"),
            F.max("__depth").cast("int").alias("max_depth"),
        )
    )


def zone_map_probe_stats(
    files: DataFrame,
    probes: DataFrame,
    layout_col: str = "layout",
    min_col: str = "min_key",
    max_col: str = "max_key",
    probe_col: str = "probe_key",
) -> DataFrame:
    """Zone-map (file min/max statistics) pruning effectiveness: for
    each layout, how many files a point lookup actually opens. A file
    must be opened when probe BETWEEN min_key AND max_key — exactly the
    pruning decision Parquet row-group stats / Iceberg manifests /
    Delta data-skipping make from metadata. Returns one row per layout:
    (layout, n_files, n_probes, files_opened, avg_files_opened_r,
    pruned_frac_r) — the measurement that justifies (or indicts) a
    clustering choice, quantifying what :func:`key_overlap_depth`
    diagnoses structurally.

    Scale shape: the probe panel is bounded (broadcast) and the file
    inventory is metadata-sized, so the range join is tiny however big
    the table data is; probes matching zero files still count (left
    join), all-integer until the two final reported ratios."""
    per_layout = files.groupBy(layout_col).agg(
        F.count(F.lit(1)).alias("n_files")
    )
    # 1-row scalar via crossJoin, not a driver-side count() action
    np_frame = probes.agg(F.count(F.lit(1)).alias("n_probes"))
    hits = (
        files.join(
            F.broadcast(probes),
            (F.col(probe_col) >= F.col(min_col))
            & (F.col(probe_col) <= F.col(max_col)),
        )
        .groupBy(layout_col)
        .agg(F.count(F.lit(1)).alias("files_opened"))
    )
    return (
        per_layout.join(hits, layout_col, "left")
        .crossJoin(F.broadcast(np_frame))
        .select(
            layout_col,
            F.col("n_files").cast("long").alias("n_files"),
            F.col("n_probes").cast("long").alias("n_probes"),
            F.coalesce(F.col("files_opened"), F.lit(0))
            .cast("long")
            .alias("files_opened"),
        )
        .withColumn(
            "avg_files_opened_r",
            F.round(F.col("files_opened") / F.col("n_probes"), 6),
        )
        .withColumn(
            "pruned_frac_r",
            F.round(
                1.0
                - F.col("files_opened")
                / (F.col("n_probes") * F.col("n_files")),
                6,
            ),
        )
    )


def column_profile(
    df: DataFrame,
    encoded: "list[tuple[str, Column, Column]]",
    exact_ndv_budget: int | None = 1_000_000,
) -> DataFrame:
    """ANALYZE-style per-column table statistics — the stats collection
    every cost-based optimizer (and every data-quality monitor) runs
    before planning against a table: per column, row count, null
    count, EXACT distinct count (budget-gated, see below), the
    portable-HLL distinct ESTIMATE (error visible next to its exact
    twin, the sketch-family convention), and typed min/max rendered as
    strings.

    ``encoded`` is [(name, typed_col, canon_col)]: ``typed_col`` drives
    min/max in the column's own ordering (string min of a numeric
    column would order "10" < "9"); ``canon_col`` is a STRING encoding
    that must be engine-canonical — injective per engine is enough for
    the exact NDV, but the HLL registers hash the exact bytes, so
    doubles go through DECIMAL and timestamps through epoch seconds
    (raw double/timestamp → string rendering differs between engines).

    Exact-NDV posture (the honest cost statement): ``countDistinct``
    per column shuffles that column's per-partition-distinct (col,
    canon) pairs — for a high-NDV column (a key, a UUID) that IS a
    corpus-sized shuffle. The HLL pass is the cheap default (|cols| x
    64 register rows in the shuffle, map-side combinable); exact NDV
    is computed ONLY for columns whose HLL estimate is within
    ``exact_ndv_budget`` — above it ``exact_ndv`` is NULL and the
    estimate stands alone. ``exact_ndv_budget=None`` forces exact NDV
    for every column (the small-table / audit mode). The budget
    decision collects the |cols|-row estimate frame driver-side — a
    metadata-sized action, the same stats-then-plan move AQE makes.

    Scale shape: (1) one stacked column-pruned scan for row/null
    counts; (2) one for the HLL registers; (3) one single-row
    aggregate for every typed min/max, unpivoted JVM-side; (4) one
    countDistinct scan restricted to the under-budget column subset —
    the only pass whose shuffle can grow with NDV, and the budget caps
    it."""
    from bigdata_capstone_spark.operators.relational import fan_out
    from bigdata_capstone_spark.operators.sketches import (
        hll_estimate_from_registers,
        hll_registers,
    )

    src = fan_out(df)

    def stack(cols: "list[tuple[str, Column, Column]]") -> DataFrame:
        return src.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(name).alias("col_name"),
                            canon.cast("string").alias("canon"),
                        )
                        for name, _typed, canon in cols
                    ]
                )
            ).alias("c")
        ).select("c.col_name", "c.canon")

    stacked = stack(encoded)
    base = stacked.groupBy("col_name").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("canon").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_nulls"),
    )
    regs = hll_registers(
        stacked.filter(F.col("canon").isNotNull()),
        ["col_name"],
        F.col("canon"),
    )
    # materialized once (eager localCheckpoint, |cols| rows) for the
    # budget decision (collect) and the final join — localCheckpoint
    # instead of cache so a loop caller doesn't accumulate pinned
    # entries (ADVICE r9); blocks free with the frame
    hll = (
        hll_estimate_from_registers(regs, ["col_name"])
        .select("col_name", F.col("hll_estimate").alias("hll_ndv"))
        .localCheckpoint(eager=True)
    )
    if exact_ndv_budget is None:
        under = list(encoded)
    else:
        est = {r["col_name"]: r["hll_ndv"] for r in hll.collect()}
        # a column absent from the HLL frame had zero non-null values —
        # estimate 0, always under budget (its exact NDV is a free 0)
        under = [
            e
            for e in encoded
            if est.get(e[0], 0.0) <= float(exact_ndv_budget)
        ]
    if under:
        exact = stack(under).groupBy("col_name").agg(
            F.countDistinct("canon").cast("long").alias("exact_ndv")
        )
    else:
        exact = base.select(
            "col_name", F.lit(None).cast("long").alias("exact_ndv")
        ).limit(0)
    base = base.join(exact, on="col_name", how="left").select(
        "col_name", "n_rows", "n_nulls", "exact_ndv"
    )
    # cached: the unpivot below selects from this 1-row frame once per
    # column — uncached, each select re-runs the whole min/max scan
    minmax_row = src.agg(
        *[
            agg
            for name, typed, _canon in encoded
            for agg in (
                F.min(typed).cast("string").alias(f"__min_{name}"),
                F.max(typed).cast("string").alias(f"__max_{name}"),
            )
        ]
    ).cache()
    minmax = None
    for name, _typed, _canon in encoded:
        row = minmax_row.select(
            F.lit(name).alias("col_name"),
            F.col(f"__min_{name}").alias("min_s"),
            F.col(f"__max_{name}").alias("max_s"),
        )
        minmax = row if minmax is None else minmax.unionByName(row)
    # LEFT join: an all-null column contributes no register rows and
    # would vanish from an inner join — exactly the column a quality
    # monitor most needs to see (ADVICE r8); its estimate is 0
    return (
        base.join(hll, on="col_name", how="left")
        .withColumn("hll_ndv", F.coalesce(F.col("hll_ndv"), F.lit(0.0)))
        .join(F.broadcast(minmax), on="col_name")
        .select(
            "col_name", "n_rows", "n_nulls", "exact_ndv", "hll_ndv",
            "min_s", "max_s",
        )
    )
