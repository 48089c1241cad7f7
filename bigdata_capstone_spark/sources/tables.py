"""Schema'd readers for the test-schema tables (SURVEY §2.1 S1; FIXTURES.md A).

Replaces the reference's ``spark.read.csv(path, header=True,
inferSchema=True)`` idiom (splitting_data.py:13, customer_segmentation_1.py:12,
popularity_model.py:15-17, als_recommendation.py:10-12) with explicit
``StructType`` schemas + Parquet: no inference pass, reproducible types,
and columnar pushdown/pruning at the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

TABLE_NAMES: tuple[str, ...] = tuple(TABLE_SCHEMAS)

# MovieLens-shaped ratings fact table (FIXTURES.md B1); the reference's core
# input (splitting_data.py:13-16).
RATINGS_SCHEMA = T.StructType(
    [
        T.StructField("userId", T.LongType()),
        T.StructField("movieId", T.LongType()),
        T.StructField("rating", T.DoubleType()),
        T.StructField("timestamp", T.LongType()),
    ]
)


def _parquet_ts_unit(path: str, field: str) -> str | None:
    """Physical timestamp unit ('ns'/'us'/'ms') of a parquet column, read
    from the file footer (no data scan).

    Returns ``"unknown"`` (with a warning naming the cause) when the
    footer CANNOT be inspected — pyarrow missing, file unreadable — which
    callers must treat as "possibly ns". Collapsing unreadable to "not
    ns" would silently route a genuine TIMESTAMP(NANOS) file down the
    native reader, which throws PARQUET_TYPE_ILLEGAL only at scan time
    with no hint of the real cause."""
    import os
    import warnings

    try:
        import pyarrow.parquet as pq

        if os.path.isdir(path):
            cands = [p for p in os.listdir(path) if p.endswith(".parquet")]
            if not cands:
                return "unknown"
            path = os.path.join(path, sorted(cands)[0])
        typ = pq.ParquetFile(path).schema_arrow.field(field).type
        return getattr(typ, "unit", None)
    except Exception as exc:
        warnings.warn(
            f"cannot inspect parquet footer of {path!r} ({type(exc).__name__}:"
            f" {exc}); assuming timestamp unit may be ns",
            stacklevel=2,
        )
        return "unknown"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table as Parquet with its declared schema.

    Parquet carries its own types; we still pass the schema so a drifting
    file fails loudly at analysis instead of silently changing types.

    ``events.ts`` has shipped both as ``TIMESTAMP(NANOS)`` — which Spark's
    parquet reader rejects outright (PARQUET_TYPE_ILLEGAL) — and as plain
    microsecond timestamps, depending on the generator version. The footer
    (one metadata read, no scan) tells us which: for NANOS we read raw
    nanosecond longs (``spark.sql.legacy.parquet.nanosAsLong``, a runtime
    conf) and truncate to microsecond TimestampType — the same truncation
    DuckDB applies, so oracle comparisons agree.
    """
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # "unknown" (footer uninspectable, e.g. no pyarrow) falls back to the
    # ns path: the driver's events data ships as TIMESTAMP(NANOS), and the
    # native reader would reject exactly that case at scan time.
    if name == "events" and _parquet_ts_unit(
        f"{sf_dir}/events.parquet", "ts"
    ) in ("ns", "unknown"):
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        raw_schema = T.StructType(
            [
                f if f.name != "ts" else T.StructField("ts", T.LongType())
                for f in TABLE_SCHEMAS["events"].fields
            ]
        )
        raw = spark.read.schema(raw_schema).parquet(f"{sf_dir}/{name}.parquet")
        # integer division: ts/1000 in double would lose µs precision above
        # 2^53 ns (~1970+104 days) and drift timestamps by ±1µs
        return raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        ).select([f.name for f in TABLE_SCHEMAS["events"].fields])
    return spark.read.schema(TABLE_SCHEMAS[name]).parquet(f"{sf_dir}/{name}.parquet")


def load_partitioned_table(
    spark: SparkSession,
    path: str,
    name: str,
    partition_filter: F.Column | None = None,
    date_col: str = "event_date",
) -> DataFrame:
    """Read a date-partitioned layout (``sinks.write_date_partitioned_
    parquet``) of a known table, injecting ``partition_filter`` at the
    scan — the partition-pruning choke point SCALE.md promises: because
    the filter references only the Hive partition column, Catalyst
    resolves it against directory names at PLANNING time
    (``PartitionFilters`` in the scan node) and never opens a pruned
    file's footer, let alone its data.

    The schema is the table's declared schema plus the DATE partition
    column — passed explicitly so partition-value inference can't drift
    types (a ``event_date=2024-01-01`` directory name must parse as DATE,
    not string, for range predicates to prune).
    """
    if name not in TABLE_SCHEMAS:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    schema = T.StructType(
        list(TABLE_SCHEMAS[name].fields)
        + [T.StructField(date_col, T.DateType())]
    )
    df = spark.read.schema(schema).parquet(path)
    if partition_filter is not None:
        df = df.filter(partition_filter)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    """Read several tables at once: ``load_tables(spark, d, 'orders', 'lineitem')``."""
    return {n: load_table(spark, sf_dir, n) for n in names or TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    """Register tables as temp views so operators can be written in SQL."""
    for name, df in load_tables(spark, sf_dir, *names).items():
        df.createOrReplaceTempView(name)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV scan with header and an explicit schema (S1, hardened).

    The reference's ``inferSchema=True`` triggers an eager extra full read
    before any plan exists (SURVEY §3.1); an explicit schema removes that
    job entirely — at 100 TB an inference pass is a second 100 TB scan.
    """
    return spark.read.schema(schema).option("header", True).csv(path)


def read_csv_quarantine(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
    header: bool = False,
) -> DataFrame:
    """Schema'd CSV scan with a QUARANTINE column — the PERMISSIVE +
    ``columnNameOfCorruptRecord`` discipline of :func:`read_jsonl`
    applied to the reference's own arrival format (r8 verdict Missing
    #4). A line that fails the schema (uncastable field, token-count
    mismatch, broken quoting) lands as one row whose data columns are
    null and whose ``corrupt_col`` holds the raw line: ingest never
    dies on one bad record, the dead-letter set is a queryable frame
    (DROPMALFORMED loses rows with no ledger; FAILFAST turns one bad
    byte into a dead 100 TB job).

    Returned frame, split contract, and the corrupt-column-only
    materialization caveat are identical to :func:`read_jsonl`. CSV
    stays line-splittable only WITHOUT ``multiLine``; writers feeding
    this reader must strip embedded newlines (quoted commas are fine).
    """
    if any(f.name == corrupt_col for f in schema.fields):
        raise ValueError(
            f"schema already contains the quarantine column {corrupt_col!r}"
        )
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("header", header)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .csv(path)
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Schema'd JSONL (newline-delimited JSON) scan with a QUARANTINE
    column — the arrival format of most LLM text corpora. PERMISSIVE
    mode with an explicit ``columnNameOfCorruptRecord``: a malformed
    line lands as one row whose data columns are null and whose
    ``corrupt_col`` holds the raw line, so ingest never dies on one bad
    record and the quarantine is queryable (count it, sample it, route
    it to a dead-letter sink) instead of silently dropped (DROPMALFORMED
    loses rows with no ledger; FAILFAST turns one bad byte into a dead
    100 TB job).

    The returned frame is the declared schema + ``corrupt_col STRING``.
    Callers split it once:
        good = out.filter(out[corrupt_col].isNull()).drop(corrupt_col)
        bad  = out.filter(out[corrupt_col].isNotNull())
    Note Spark's documented caveat: a query over ONLY the corrupt
    column must materialize another column too (the parser skips rows
    it can fully prune) — the split above keeps the full schema, which
    avoids it.

    Like read_csv, the schema is explicit: JSON inference is an eager
    extra full read, i.e. a second 100 TB scan. JSONL splits by line, so
    a single file still fans out across executors (unlike multiline
    JSON, which is one-task-per-file)."""
    if any(f.name == corrupt_col for f in schema.fields):
        raise ValueError(
            f"schema already contains the quarantine column {corrupt_col!r}"
        )
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType())]
    )
    return (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .json(path)
    )
