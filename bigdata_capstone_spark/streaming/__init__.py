"""Structured Streaming operators (SURVEY §2.10 — an extension, not a port:
the reference has no streaming; the driver's events table and the north
star's scale posture motivate event-time windowing as a first-class
capability)."""

from bigdata_capstone_spark.streaming.windows import (
    hourly_tumbling_agg,
    session_window_agg,
    sliding_window_agg,
    stream_events_from_parquet,
    run_stream_to_memory,
)

__all__ = [
    "hourly_tumbling_agg",
    "session_window_agg",
    "sliding_window_agg",
    "stream_events_from_parquet",
    "run_stream_to_memory",
]
