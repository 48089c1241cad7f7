"""MERGE / upsert (SCD1 dimension maintenance) as a pure DataFrame op.

The warehouse MERGE statement — ``WHEN MATCHED THEN UPDATE, WHEN NOT
MATCHED THEN INSERT`` — expressed as one full-outer join, for engines
without a table format that provides native MERGE (Delta/Iceberg). On a
real lakehouse you'd hand this plan to the format's MERGE; the join shape
below is exactly what those implementations execute underneath.

Scale shape: one shuffle of each side on the merge key (or a broadcast if
the changeset is small — the common case: daily changesets are orders of
magnitude smaller than the dimension). Presence is tracked with literal
flags added BEFORE the join, because non-key columns may be legitimately
null — testing payload columns for null would corrupt rows whose values
are null.

Deterministic by construction: one output row per key, no row order
dependence — safe for the hash-compare oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    on: list[str],
    combine: dict[str, Callable[[Column, Column], Column]] | None = None,
    broadcast_updates: bool = False,
) -> DataFrame:
    """SCD1 MERGE: ``updates`` rows overwrite matching ``target`` rows
    (per-column ``combine`` overrides, e.g. additive balances), unmatched
    update rows are inserted, unmatched target rows are kept.

    Both inputs must share the output schema (key columns ``on`` + payload
    columns). ``combine[col]`` receives (target_col, update_col) and is
    applied only on matched rows; columns without an entry take the update
    side's value on match (plain overwrite).

    ``updates`` must have at most one row per key (enforce upstream with a
    window/groupBy — MERGE on an ambiguous changeset is an error in every
    SQL dialect, and silently exploding rows here would hide it).

    ``broadcast_updates=True`` switches from the one full-outer join (which
    Spark can never broadcast — both sides' unmatched rows must be emitted,
    so both sides shuffle) to the small-changeset DECOMPOSITION real MERGE
    implementations use:

    1. update + keep branches: ``target ⟕ broadcast(updates)`` — ONE scan
       of the dimension, zero shuffle of it;
    2. insert branch: ``updates ⟔anti target.select(keys)`` — only the
       narrow key column of the dimension ever shuffles, never payloads.

    Same output for the same inputs; at 100 TB the decomposition turns the
    dominant cost from a full-dimension shuffle into a pruned scan.
    """
    combine = combine or {}
    payload = [c for c in target.columns if c not in on]
    u0 = updates
    for c in payload:
        u0 = u0.withColumnRenamed(c, f"_u_{c}")
    u = u0.withColumn("_u_present", F.lit(1))

    def merged_cols(matched: Column, inserted: Column) -> list[Column]:
        cols = [F.col(k) for k in on]
        for c in payload:
            tc, uc = F.col(c), F.col(f"_u_{c}")
            on_match = combine[c](tc, uc) if c in combine else uc
            cols.append(
                F.when(matched, on_match)
                .when(inserted, uc)
                .otherwise(tc)
                .alias(c)
            )
        return cols

    if broadcast_updates:
        upserted = target.join(F.broadcast(u), on=on, how="left_outer").select(
            *merged_cols(F.col("_u_present").isNotNull(), F.lit(False))
        )
        inserts = u.join(target.select(*on), on=on, how="left_anti").select(
            *[F.col(k) for k in on],
            *[F.col(f"_u_{c}").alias(c) for c in payload],
        )
        return upserted.unionByName(inserts)

    t = target.withColumn("_t_present", F.lit(1))
    joined = t.join(u, on=on, how="full_outer")
    matched = F.col("_t_present").isNotNull() & F.col("_u_present").isNotNull()
    inserted = F.col("_t_present").isNull()
    return joined.select(*merged_cols(matched, inserted))
