"""Structured Streaming windows: the streaming result must equal the batch
twin (stream/batch symmetry is the whole point of the design)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdata_capstone_spark.sources.tables import load_table
from bigdata_capstone_spark.streaming.windows import (
    hourly_tumbling_agg,
    run_stream_to_memory,
    session_window_agg,
    sliding_window_agg,
    stream_events_from_parquet,
)


def test_streaming_tumbling_equals_batch(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    batch = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in hourly_tumbling_agg(events).collect()
    }

    stream = stream_events_from_parquet(spark, sf_small)
    assert stream.isStreaming
    run_stream_to_memory(hourly_tumbling_agg(stream), "tumbling_out", "complete")
    streamed = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    assert streamed == batch


def test_sliding_window_pane_math(spark, sf_small):
    events = load_table(spark, sf_small, "events")
    total = events.count()
    panes = sliding_window_agg(events, window="1 hour", slide="15 minutes")
    # each event lands in exactly window/slide = 4 panes
    assert panes.agg(F.sum("n_events")).collect()[0][0] == 4 * total


def test_session_window_agrees_with_batch_sessionization(spark, sf_small):
    from bigdata_capstone_spark.catalog import QUERIES

    events = load_table(spark, sf_small, "events")
    native = session_window_agg(events, gap="30 minutes")
    batch = QUERIES["user_sessions"](spark, sf_small)
    # same number of sessions and same total events per user
    n_native = native.count()
    n_batch = batch.count()
    assert n_native == n_batch
    a = {r["user_id"]: r["n"] for r in
         native.groupBy("user_id").agg(F.sum("n_events").alias("n")).collect()}
    b = {r["user_id"]: r["n"] for r in
         batch.groupBy("user_id").agg(F.sum("n_events").alias("n")).collect()}
    assert a == b
