"""Snapshot reconciliation: row-level diff of two versions of a table.

The validation pass every migration/backfill/CDC pipeline needs: given an
old and a new snapshot sharing a key, classify every key as ``added`` /
``removed`` / ``changed`` / ``unchanged`` (null-safe column compare), and
aggregate the counts. This is also the "did the engine swap preserve the
data" check a user migrating platforms runs table by table.

Scale shape: one full-outer join on the key — both sides shuffle once;
the compare is a narrow JVM expression over the joined row, the summary a
4-row aggregate. For changed-row *extraction* (not counted summaries)
filter the diff frame before aggregating, same plan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    on: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Per-key diff status. ``compare_cols`` defaults to all shared non-key
    columns; comparison is null-safe (NULL == NULL is *unchanged*, NULL vs
    value is *changed* — ``eqNullSafe``, DuckDB ``IS NOT DISTINCT FROM``).

    Returns one row per key present in either side:
    ``(*on, status)`` with status ∈ added|removed|changed|unchanged.
    """
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in on
        ]
    o = old.select(*on, *compare_cols, F.lit(1).alias("_o_present"))
    n = new.select(*on, *compare_cols, F.lit(1).alias("_n_present"))
    for c in compare_cols + ["_n_present"]:
        n = n.withColumnRenamed(c, f"_n_{c}" if c != "_n_present" else c)
    joined = o.join(n, on=on, how="full_outer")

    any_changed: Column = F.lit(False)
    for c in compare_cols:
        any_changed = any_changed | ~F.col(c).eqNullSafe(F.col(f"_n_{c}"))
    status = (
        F.when(F.col("_o_present").isNull(), "added")
        .when(F.col("_n_present").isNull(), "removed")
        .when(any_changed, "changed")
        .otherwise("unchanged")
    )
    return joined.select(*on, status.alias("status"))


def snapshot_diff_summary(
    old: DataFrame,
    new: DataFrame,
    on: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Counts per diff status — the reconciliation report row."""
    return (
        snapshot_diff(old, new, on, compare_cols)
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )


def changelog(
    old: DataFrame,
    new: DataFrame,
    on: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level change-data feed between two snapshot versions — the
    REVERSE of MERGE: given (old, new), emit the insert/update/delete
    stream that transforms one into the other (what lakehouse CDC feeds
    publish to downstream incremental consumers). Unchanged keys are
    dropped; each emitted row carries the key, ``op`` in
    insert|update|delete, and ``old_<col>`` / ``new_<col>`` for every
    compared column. Null-safe comparison (eqNullSafe / IS NOT DISTINCT
    FROM), same contract as :func:`snapshot_diff`.

    Scale shape: one key-shuffle full-outer join; output is bounded by
    the CHANGE volume, not the table size — the property incremental
    consumers depend on."""
    if compare_cols is None:
        compare_cols = [
            c for c in old.columns if c in set(new.columns) and c not in on
        ]
    o = old.select(
        *on,
        *[F.col(c).alias(f"old_{c}") for c in compare_cols],
        F.lit(1).alias("_o_present"),
    )
    n = new.select(
        *on,
        *[F.col(c).alias(f"new_{c}") for c in compare_cols],
        F.lit(1).alias("_n_present"),
    )
    joined = o.join(n, on=on, how="full_outer")
    any_changed: Column = F.lit(False)
    for c in compare_cols:
        any_changed = any_changed | ~F.col(f"old_{c}").eqNullSafe(
            F.col(f"new_{c}")
        )
    op = (
        F.when(F.col("_o_present").isNull(), "insert")
        .when(F.col("_n_present").isNull(), "delete")
        .when(any_changed, "update")
    )
    return (
        joined.withColumn("op", op)
        .filter(F.col("op").isNotNull())
        .select(
            "op",
            *on,
            *[F.col(f"old_{c}") for c in compare_cols],
            *[F.col(f"new_{c}") for c in compare_cols],
        )
    )
