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


def test_stateful_running_totals_equals_batch(spark, sf_small):
    """applyInPandasWithState running totals, drained to completion, must
    agree with the batch groupBy aggregate (update mode → last row per key
    in the memory sink is the final state)."""
    from bigdata_capstone_spark.streaming.stateful import running_user_totals

    events = load_table(spark, sf_small, "events")
    batch = {
        r["user_id"]: (r["n"], round(r["s"], 2), r["m"])
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round("value", 2).cast("decimal(18,2)")).cast("double").alias("s"),
            F.max("value").alias("m"),
        )
        .collect()
    }

    stream = stream_events_from_parquet(spark, sf_small)
    run_stream_to_memory(running_user_totals(stream), "running_out", "update")
    # update mode re-emits a key on every micro-batch it appears in; the
    # final emission per key carries the complete totals
    final = {
        r["user_id"]: (r["n_events"], round(r["sum_value"], 2), r["max_value"])
        for r in spark.sql("SELECT * FROM running_out").collect()
    }
    assert final == batch


def test_stateful_high_watermark_alerts_equal_batch_twin(spark, sf_small):
    """Record-breaker alerts from the stateful op == the window-based batch
    formulation (running max over preceding rows, keep rows above it)."""
    from pyspark.sql.window import Window

    from bigdata_capstone_spark.streaming.stateful import high_value_alerts

    events = load_table(spark, sf_small, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    batch = (
        events.withColumn("prior_high", F.max("value").over(w))
        .filter(F.col("prior_high").isNull() | (F.col("value") > F.col("prior_high")))
        .select("user_id", "event_id")
    )
    expected = {(r["user_id"], r["event_id"]) for r in batch.collect()}

    stream = stream_events_from_parquet(spark, sf_small)
    run_stream_to_memory(high_value_alerts(stream), "alerts_out", "append")
    got = {
        (r["user_id"], r["event_id"])
        for r in spark.sql("SELECT * FROM alerts_out").collect()
    }
    assert got == expected


def test_streaming_dedup_within_watermark(spark, sf_small, tmp_path):
    """A stream fed the same events twice (replay) must emit each event_id
    once; the streamed distinct count equals the batch dropDuplicates."""
    from bigdata_capstone_spark.streaming.dedup import (
        dedup_events_exact,
        dedup_events_within_watermark,
    )

    # deterministic subset (limit() without order can differ across jobs)
    events = load_table(spark, sf_small, "events").filter(
        F.col("event_id") % 20 == 0
    )
    n_unique = dedup_events_exact(events).count()

    # replayed feed: two parquet files with identical rows (at-least-once)
    feed = str(tmp_path / "feed")
    events.write.mode("overwrite").parquet(feed)
    events.write.mode("append").parquet(feed)

    raw = spark.readStream.schema(events.schema).format("parquet").load(feed)
    assert raw.isStreaming
    deduped = dedup_events_within_watermark(raw, watermark="10 minutes")
    run_stream_to_memory(deduped, "dedup_out", "append")
    got = spark.sql("SELECT count(*) AS n FROM dedup_out").first()["n"]
    assert got == n_unique

    # batch twin degrades to plain dropDuplicates
    assert dedup_events_within_watermark(events).count() == n_unique


def test_stream_stream_join_equals_batch(spark, sf_small):
    """view→purchase pairs within 30 min: the watermarked stream-stream
    join must produce exactly the batch theta-join's pairs."""
    from bigdata_capstone_spark.streaming.joins import followed_within

    events = load_table(spark, sf_small, "events")
    views = events.filter(F.col("event_type") == "view")
    purchases = events.filter(F.col("event_type") == "purchase")
    batch = {
        (r["a_id"], r["b_id"])
        for r in followed_within(views, purchases, gap="30 minutes").collect()
    }
    assert batch, "fixture should produce at least one followed-within pair"

    stream = stream_events_from_parquet(spark, sf_small)
    sv = stream.filter(F.col("event_type") == "view")
    sp = stream.filter(F.col("event_type") == "purchase")
    joined = followed_within(sv, sp, gap="30 minutes")
    run_stream_to_memory(joined, "ss_join_out", "append")
    streamed = {
        (r["a_id"], r["b_id"])
        for r in spark.sql("SELECT * FROM ss_join_out").collect()
    }
    assert streamed == batch


def test_checkpoint_recovery_exactly_once_file_sink(spark, sf_small, tmp_path):
    """Stop/restart against the same checkpoint: the restarted query must
    pick up only NEW input files, and the parquet sink must hold each
    input row exactly once across both runs (file-sink manifest +
    checkpoint = end-to-end exactly-once)."""
    events = load_table(spark, sf_small, "events").select(
        "event_id", "user_id", "value"
    )
    batch1 = events.filter(F.col("event_id") % 3 == 0)
    batch2 = events.filter(F.col("event_id") % 3 == 1)

    feed = str(tmp_path / "feed")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    batch1.coalesce(1).write.mode("overwrite").parquet(feed)

    def run_once():
        stream = (
            spark.readStream.schema(batch1.schema).format("parquet").load(feed)
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    n1 = spark.read.parquet(sink).count()
    assert n1 == batch1.count()

    # new file arrives while the query is DOWN; restart from checkpoint
    batch2.coalesce(1).write.mode("append").parquet(feed)
    run_once()
    out = spark.read.parquet(sink)
    assert out.count() == batch1.count() + batch2.count()
    # exactly-once: no event_id appears twice
    assert out.select("event_id").distinct().count() == out.count()


def test_foreachbatch_upsert_snapshot_last_write_wins(spark, sf_small, tmp_path):
    """Two feed files processed across two runs: the final snapshot holds
    exactly one row per user with that user's latest event."""
    from bigdata_capstone_spark.streaming.upsert import (
        read_latest_snapshot,
        start_upsert_snapshot,
    )

    events = load_table(spark, sf_small, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    first = events.filter(F.col("event_id") % 2 == 0)
    second = events.filter(F.col("event_id") % 2 == 1)

    feed = str(tmp_path / "feed")
    base = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")
    first.coalesce(1).write.mode("overwrite").parquet(feed)

    def run_once():
        stream = (
            spark.readStream.schema(events.schema).format("parquet").load(feed)
        )
        q = start_upsert_snapshot(
            stream, base, ckpt, key_cols=["user_id"], order_col="ts"
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    second.coalesce(1).write.mode("append").parquet(feed)
    run_once()

    snap = read_latest_snapshot(spark, base)
    assert snap is not None
    # one row per user
    assert snap.groupBy("user_id").count().agg(F.max("count")).first()[0] == 1
    # last-WRITE-wins: users touched by the second batch carry that batch's
    # per-batch winner (max ts within the batch); everyone else keeps their
    # first-batch winner
    b2 = {
        r["user_id"]: r["mx"]
        for r in second.groupBy("user_id").agg(F.max("ts").alias("mx")).collect()
    }
    b1 = {
        r["user_id"]: r["mx"]
        for r in first.groupBy("user_id").agg(F.max("ts").alias("mx")).collect()
    }
    expect = {**b1, **b2}
    got = {r["user_id"]: r["ts"] for r in snap.collect()}
    assert got == expect


def test_streaming_hll_split_independent(spark, sf_small):
    """HLL register maintenance is batch-split independent: streaming the
    events in 7 micro-batches yields the exact estimate of one batch pass
    (registers merge under max)."""
    import tempfile

    from pyspark.sql import functions as F

    from bigdata_capstone_spark.operators.sketches import (
        hll_bucket_rho,
        hll_estimate,
        hll_estimate_from_registers,
    )
    from bigdata_capstone_spark.sources.tables import TABLE_SCHEMAS, load_table
    from bigdata_capstone_spark.streaming.upsert import (
        read_latest_snapshot,
        start_aggregate_maintenance,
    )

    ev = load_table(spark, sf_small, "events")
    batch = hll_estimate(ev, [], F.col("user_id").cast("string")).collect()

    work = tempfile.mkdtemp(prefix="hll7_")
    ev.repartition(7).write.mode("overwrite").parquet(f"{work}/in")
    bucket, rho = hll_bucket_rho(F.col("user_id").cast("string"))
    stream = (
        spark.readStream.schema(TABLE_SCHEMAS["events"])
        .option("maxFilesPerTrigger", "1")
        .parquet(f"{work}/in")
        .select(bucket.alias("bucket"), rho.alias("rho"))
    )
    q = start_aggregate_maintenance(
        stream,
        f"{work}/state",
        f"{work}/ckpt",
        key_cols=["bucket"],
        partial_aggs=[F.max("rho").alias("rho_max")],
        combines={"rho_max": lambda t, u: F.greatest(t, u)},
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    streamed = hll_estimate_from_registers(
        read_latest_snapshot(spark, f"{work}/state"), []
    ).collect()
    assert [tuple(r) for r in streamed] == [tuple(r) for r in batch]


def test_late_data_gate_is_nonvacuous(sf_small):
    """streaming_late_data's oracle equals the drained sink (driver
    gate); this pins that the scenario actually DROPS something — if a
    fixture regeneration ever made the straggler batch empty, the
    watermark check would silently become a no-op."""
    import duckdb

    con = duckdb.connect()
    try:
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM "
            f"'{sf_small}/events.parquet'"
        )
        [(dropped,)] = con.execute(
            """
            WITH b1 AS (
              SELECT * FROM events
              WHERE ts < TIMESTAMP '2024-01-15' AND event_id % 5 <> 0
            ),
            b2 AS (
              SELECT * FROM events
              WHERE NOT (ts < TIMESTAMP '2024-01-15' AND event_id % 5 <> 0)
            ),
            wm1 AS (SELECT max(ts) - INTERVAL 2 HOUR AS w FROM b1)
            SELECT count(*) FROM b2, wm1
            WHERE date_trunc('hour', b2.ts) + INTERVAL 1 HOUR <= wm1.w
            """
        ).fetchall()
    finally:
        con.close()
    assert dropped > 0, "late-data scenario must drop at least one row"
