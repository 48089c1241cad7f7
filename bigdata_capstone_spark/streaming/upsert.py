"""foreachBatch keyed-upsert: materialize a stream as a last-write-wins
snapshot table (the CDC → serving-table pattern).

Plain parquet has no ACID MERGE, so each micro-batch writes a NEW
versioned snapshot directory (``base/v_<epoch>``) computed as
``old ⟕anti new ∪ new`` — readers always open the highest complete
version, writers never mutate a directory in place (rewriting the dir
you are lazily reading is the classic self-join-on-own-output
corruption). Epoch-suffixed dirs make failure-retries of the same epoch
idempotent: the retry overwrites its own version, not the lineage.

At scale this exact pattern is what an ACID table format (Delta/Iceberg/
Hudi) packages: MVCC versions + latest-pointer + compaction. The
operator keeps the engine dependency-free while teaching the same
contract; swap the write for ``MERGE INTO`` when a table format is on
the cluster.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_V_RE = re.compile(r"^v_(\d+)$")


def latest_snapshot_path(base_path: str) -> str | None:
    """Highest complete (``_SUCCESS``-marked) snapshot version, or None."""
    if not os.path.isdir(base_path):
        return None
    best = None
    for name in os.listdir(base_path):
        m = _V_RE.match(name)
        if m and os.path.exists(os.path.join(base_path, name, "_SUCCESS")):
            v = int(m.group(1))
            if best is None or v > best[0]:
                best = (v, os.path.join(base_path, name))
    return best[1] if best else None


def read_latest_snapshot(spark: SparkSession, base_path: str) -> DataFrame | None:
    p = latest_snapshot_path(base_path)
    return spark.read.parquet(p) if p else None


def start_upsert_snapshot(
    stream: DataFrame,
    base_path: str,
    checkpoint: str,
    key_cols: list[str],
    order_col: str,
):
    """Run the stream into versioned last-write-wins snapshots.

    Within a batch, the winner per key is the max ``order_col`` row
    (deterministic tie-break on all key cols); across batches, the new
    batch overrides the previous snapshot per key.
    """

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        w = Window.partitionBy(*key_cols).orderBy(
            F.desc(order_col), *[F.desc(c) for c in key_cols]
        )
        newest = (
            batch_df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
        old = read_latest_snapshot(spark, base_path)
        if old is not None:
            merged = old.join(
                newest.select(*key_cols), on=key_cols, how="left_anti"
            ).unionByName(newest)
        else:
            merged = newest
        merged.write.mode("overwrite").parquet(f"{base_path}/v_{epoch_id:010d}")

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def start_aggregate_maintenance(
    stream: DataFrame,
    base_path: str,
    checkpoint: str,
    key_cols: list[str],
    partial_aggs: "list",
    combines: "dict",
):
    """Incrementally maintain a keyed aggregate table from a stream: each
    micro-batch computes its PARTIAL aggregate states (``partial_aggs``
    over ``key_cols``) and folds them into the previous snapshot with
    :func:`~bigdata_capstone_spark.operators.merge.merge_upsert` using the
    per-column ``combines`` (count+count, decimal-sum+sum, min/min,
    max/max, ...).

    This is the streaming materialized-view maintenance contract: state
    size is |keys|, each batch touches only its own partials, and because
    every combine is associative+commutative over exact types the final
    table is INDEPENDENT of how rows were split into batches — which is
    what lets an oracle value-check it against one direct batch pass.
    Snapshots are epoch-versioned like :func:`start_upsert_snapshot`
    (idempotent retries, no in-place mutation).
    """
    from bigdata_capstone_spark.operators.merge import merge_upsert

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        spark = batch_df.sparkSession
        partial = batch_df.groupBy(*key_cols).agg(*partial_aggs)
        old = read_latest_snapshot(spark, base_path)
        merged = (
            partial
            if old is None
            else merge_upsert(old, partial, on=key_cols, combine=combines)
        )
        merged.write.mode("overwrite").parquet(f"{base_path}/v_{epoch_id:010d}")

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )


def read_latest_snapshot_or_empty(
    spark, base_path: str, schema_ddl: str
) -> DataFrame:
    """Snapshot read that degrades to an EMPTY frame of the declared
    schema when no epoch was ever written (an all-empty stream takes the
    isEmpty early-return in every batch, so no v_* dir exists). Callers
    that aggregate the state (sketch estimates, reports) then produce an
    empty/zero result instead of crashing on None."""
    snap = read_latest_snapshot(spark, base_path)
    if snap is not None:
        return snap
    return spark.createDataFrame([], schema_ddl)


def start_state_fold_maintenance(
    stream: DataFrame,
    base_path: str,
    checkpoint: str,
    partial_fn,
    fold_fn,
):
    """Maintain an arbitrary MERGEABLE state under a canonical fold: each
    micro-batch computes ``partial_fn(batch)`` (a bounded state frame)
    and the new snapshot is ``fold_fn(old, partial)`` — the generalization
    of :func:`start_aggregate_maintenance` for states whose merge is not
    a keyed column-combine (e.g. the level-sampling quantile sketch,
    whose merge is union + recompaction). The value contract is the same:
    when the fold is associative+commutative and canonical
    (fold(state(A), state(B)) == state(A ∪ B)), the drained snapshot is
    independent of the batch split and a batch oracle value-checks it.
    Snapshots are epoch-versioned (idempotent retries, no in-place
    mutation)."""

    def apply(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        partial = partial_fn(batch_df)
        old = read_latest_snapshot(batch_df.sparkSession, base_path)
        merged = partial if old is None else fold_fn(old, partial)
        merged.write.mode("overwrite").parquet(f"{base_path}/v_{epoch_id:010d}")

    return (
        stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .start()
    )
