"""Sinks (SURVEY §2.1 S2-S3).

The reference wrote ``df.coalesce(1).write.mode("overwrite")
.option("header", True).csv(path)`` (splitting_data.py:48-50,
customer_segmentation_1.py:39) and then shelled out to ``hdfs dfs -mv`` to
rename the part file (splitting_data.py:53-61). Here Parquet is the default
sink, ``coalesce(1)`` is opt-in (it serializes the final stage to one task —
a disaster at scale), and the rename side-effect is dropped: downstream reads
take a directory, not a file name.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
) -> None:
    """Parquet sink; ``partition_by`` enables partition pruning for readers."""
    writer = df.write.mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(path)


def write_json(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
) -> None:
    """JSON-lines sink — the interchange format for document pipelines.
    Schema round-trips via an explicit read schema, never inference."""
    df.write.mode(mode).json(path)


def write_csv(
    df: DataFrame,
    path: str,
    mode: str = "overwrite",
    header: bool = True,
    single_file: bool = False,
) -> None:
    """CSV sink (S2). ``single_file=True`` reproduces the reference's
    ``coalesce(1)`` for tiny result tables only — never for fact data."""
    out = df.coalesce(1) if single_file else df
    out.write.mode(mode).option("header", header).csv(path)


def write_date_partitioned_parquet(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    date_col: str = "event_date",
    mode: str = "overwrite",
) -> None:
    """Date-partitioned fact layout: derive ``date_col`` from ``ts_col``
    and write one Hive-style directory per day — the default 100 TB fact
    layout (SCALE.md "Scans and sinks"). Readers that filter on
    ``date_col`` (see ``tables.load_partitioned_table``) prune whole
    directories at PLANNING time: a "last 7 days" query over 3 years of
    events opens 7/1095 of the files before a single row is read.

    ``to_date`` uses the session timezone — callers must have pinned UTC
    (session.ensure_utc) so the day boundary is engine-portable.
    """
    from pyspark.sql import functions as F

    (
        df.withColumn(date_col, F.to_date(F.col(ts_col)))
        .write.mode(mode)
        .partitionBy(date_col)
        .parquet(path)
    )


def write_bucketed_table(
    df: DataFrame,
    name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hash-bucketed (+ optionally sorted) managed parquet table — the
    CO-LOCATED JOIN layout: two tables bucketed by the same key into the
    same bucket count join with ZERO exchange (each bucket pair joins
    locally), and with ``sort_cols`` the sort-merge join also skips its
    sorts. At 100 TB this converts every repeated fact⋈fact join on the
    bucket key from a full-table shuffle into a metadata decision —
    bucketing is the one layout lever that amortizes across QUERIES, not
    just scans (partitioning prunes, clustering skips row groups,
    bucketing deletes shuffles). Requires ``saveAsTable`` (bucket
    metadata lives in the catalog, not the files).
    """
    spark = df.sparkSession
    if mode == "overwrite":
        # a previous SESSION's managed-table directory survives in the
        # warehouse while the (in-memory) catalog forgot the table —
        # saveAsTable then refuses with LOCATION_ALREADY_EXISTS; clear
        # both the catalog entry and any orphaned location first
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(wh.removeprefix("file:"), name.lower())
        if os.path.isdir(loc):
            shutil.rmtree(loc)
    writer = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(name)


def write_clustered_parquet(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    mode: str = "overwrite",
    target_files: int | None = None,
) -> None:
    """Data-clustered parquet: range-partition then sort WITHIN each file by
    ``cluster_by`` so parquet row-group min/max statistics become selective
    — readers of ``key = x`` / ``key BETWEEN`` predicates skip whole row
    groups (and with range partitioning, whole files) instead of scanning.

    This is the scan-pruning lever after partition pruning: partitionBy
    works for low-cardinality columns (date, region); clustering covers
    high-cardinality keys (user_id, doc_id) where a directory per value is
    impossible. At 100 TB the combination — partition by date, cluster by
    key — is the default layout for every fact table.

    ``repartitionByRange`` gives non-overlapping key ranges per file;
    ``sortWithinPartitions`` orders rows inside, producing monotone
    row-group stats. (Range partitioning samples the key distribution —
    one extra lightweight job — so file sizes stay balanced under skew.)
    """
    n = target_files or df.sparkSession.sparkContext.defaultParallelism
    (
        df.repartitionByRange(n, *cluster_by)
        .sortWithinPartitions(*cluster_by)
        .write.mode(mode)
        .parquet(path)
    )
