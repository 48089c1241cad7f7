"""Streaming deduplication — exactly-once semantics over at-least-once
feeds (north-star LLM-pipeline op; no counterpart in the reference, which
is batch-only — SURVEY §2.10).

Two variants, mirroring Spark's own two contracts:

- :func:`dedup_events_exact` — ``dropDuplicates`` on the id column. On a
  stream WITHOUT a watermark this keeps every seen id in state forever —
  correct, but unbounded; only for bounded id spaces.
- :func:`dedup_events_within_watermark` — ``dropDuplicatesWithinWatermark``:
  state is evicted once the watermark passes an id's event time, so memory
  is bounded by (duplicate horizon × arrival rate), the right contract when
  duplicates come from retries/replays that happen close in time (Kafka
  producer retries, file re-lists). At 100 TB/day this is the only viable
  shape.

Both run identically on batch frames (``dropDuplicates``), so tests
cross-check the streamed result against the batch twin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def dedup_events_exact(events: DataFrame, id_cols: list[str] | None = None) -> DataFrame:
    """Keep the first occurrence per id. Unbounded state on streams —
    use only when the key space is known-bounded."""
    return events.dropDuplicates(id_cols or ["event_id"])


def dedup_events_within_watermark(
    events: DataFrame,
    watermark: str = "2 hours",
    id_cols: list[str] | None = None,
) -> DataFrame:
    """First occurrence per id with state bounded by the watermark.

    On a batch frame this degrades to plain ``dropDuplicates`` (batch has
    no late data, so the watermark is semantically a no-op), which keeps
    the batch/stream symmetry the test suite relies on.
    """
    cols = id_cols or ["event_id"]
    if not events.isStreaming:
        return events.dropDuplicates(cols)
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(cols)
