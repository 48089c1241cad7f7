"""Stream-stream joins (Structured Streaming; batch/stream-symmetric).

The reference has no streaming at all (SURVEY §2.10); this is the
north-star extension's event-correlation op: "which A events were
followed by a B event on the same key within Δt" — funnel steps,
click→purchase attribution, error→retry pairing.

Spark's stream-stream inner join requires BOTH sides watermarked and a
time-range join condition; state per side is then bounded by
(watermark + Δt) per key — without the range bound the join state grows
forever. The same expression on batch frames is a plain theta-join, so
tests cross-check streamed output against the batch twin.

At 100 TB/day: the join shuffles both streams on the key; Δt and the
watermark are the state-size dials. Skewed keys (bot users) hit the same
AQE-less streaming shuffle — cap per-key event rate upstream or salt the
key and re-merge.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def followed_within(
    events_a: DataFrame,
    events_b: DataFrame,
    gap: str = "30 minutes",
    key_col: str = "user_id",
    watermark: str = "2 hours",
) -> DataFrame:
    """Pairs (a, b) on the same key with ``a.ts < b.ts <= a.ts + gap``.

    Output: (key, a_id, b_id, a_ts, b_ts). Works identically on batch
    frames (plain range theta-join) and streams (watermarked
    stream-stream join, append mode).
    """
    a = events_a.select(
        F.col(key_col).alias("key"),
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_ts"),
    )
    b = events_b.select(
        F.col(key_col).alias("b_key"),
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_ts"),
    )
    if events_a.isStreaming:
        a = a.withWatermark("a_ts", watermark)
    if events_b.isStreaming:
        b = b.withWatermark("b_ts", watermark)
    cond = (
        (F.col("key") == F.col("b_key"))
        & (F.col("b_ts") > F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"interval {gap}"))
    )
    return a.join(b, cond).select("key", "a_id", "b_id", "a_ts", "b_ts")
