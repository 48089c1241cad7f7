"""Event-time windowing — batch/stream-symmetric (SURVEY §2.10).

Each aggregation here is written once against a DataFrame and works
identically on a batch frame and a ``readStream`` frame: Structured
Streaming's incrementalization handles state. Watermarks bound that state
— at 100 TB/day of events, an unwatermarked windowed agg grows without
bound; ``withWatermark`` caps it at (watermark + window) per key.

Local testing drives streams from the events parquet through the memory
sink synchronously (``processAllAvailable``), per the public Spark testing
idiom.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from bigdata_capstone_spark.functions.portable import exact_sum
from bigdata_capstone_spark.sources.tables import TABLE_SCHEMAS


def stream_events_from_parquet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events as a file-source stream (one-file micro-batch locally).

    The timestamp-unit sniffing of sources/tables.py applies to the
    streaming reader too: TIMESTAMP(NANOS) files are read as ns longs and
    truncated to µs timestamps; µs/ms files read natively.
    """
    import pyspark.sql.types as T

    from bigdata_capstone_spark.sources.tables import _parquet_ts_unit

    # file-source streams list a DIRECTORY; pathGlobFilter scopes it to the
    # events file so sibling tables in sf_dir aren't swept into the stream
    if _parquet_ts_unit(f"{sf_dir}/events.parquet", "ts") != "ns":
        return (
            spark.readStream.schema(TABLE_SCHEMAS["events"])
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(sf_dir)
        )
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = T.StructType(
        [
            f if f.name != "ts" else T.StructField("ts", T.LongType())
            for f in TABLE_SCHEMAS["events"].fields
        ]
    )
    raw = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_dir)
    )
    return raw.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def hourly_tumbling_agg(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """1-hour tumbling count/sum per event_type; watermarked when streaming.

    Batch twin: catalog.events_hourly_windows (oracle-checked) — identical
    aggregation expression, so stream output is cross-checked against the
    batch result in tests.
    """
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            exact_sum("value", 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding event-time window (each event lands in window/slide panes)."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )


def session_window_agg(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """Native session windows (gap-close semantics). Batch twin:
    catalog.user_sessions (lag + running-sum formulation) — both define a
    session as activity separated by < gap."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


def enrich_with_static(
    events: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    how: str = "left",
) -> DataFrame:
    """Stream-static join: enrich each event with dimension attributes.

    Stream-static joins are stateless in Structured Streaming — each
    micro-batch joins against the (re-read-per-batch) static side, no
    watermark needed. With a broadcast-sized dimension this is zero
    shuffle on the stream; the same expression on a batch frame is the
    plain dimension join, so tests cross-check stream vs batch output.
    """
    return events.join(F.broadcast(dim), on=on, how=how)


def run_stream_to_memory(
    agg: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drive a streaming aggregation to completion into the memory sink
    (synchronous; local testing only). Results: ``SELECT * FROM <name>``."""
    q = (
        agg.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(query_name)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
