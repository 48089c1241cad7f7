"""Custom stateful streaming operators via ``applyInPandasWithState``.

Built-in windowed aggregations (streaming/windows.py) cover tumbling /
sliding / session shapes; anything with bespoke per-key state — running
totals that survive across micro-batches, threshold alarms, cross-batch
dedup — needs the arbitrary-stateful API. Spark keeps one state blob per
group key in the state store (RocksDB/HDFS-backed on a cluster), calls the
Python function once per key per micro-batch with the new rows as Arrow
batches, and checkpoints state with the query.

Scale posture: state is partitioned by the group key across executors —
the same hash partitioning as a groupBy — so a 100 TB/day stream shards
its keyspace; the per-key blob here is O(1) (a few counters), so state
size is bounded by |distinct keys|, not event volume. GroupStateTimeout
would bound even that (evict idle keys); the test data has a small fixed
keyspace so none is set.

The batch twin of :func:`running_user_totals` is a plain
``groupBy(user_id).agg(count, sum)`` — asserted equal in tests (the
stream, drained to completion, must agree with the batch aggregate).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
        T.StructField("max_value", T.DoubleType()),
    ]
)

# State: (n_events, sum_value_cents, max_value). The sum is kept in integer
# cents so cross-batch accumulation is exact and order-independent (the
# same DECIMAL-before-double discipline as functions.portable.exact_sum).
RUNNING_TOTALS_STATE = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("sum_cents", T.LongType()),
        T.StructField("mx", T.DoubleType()),
    ]
)


def _update_running_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Fold this micro-batch's rows for one user into persistent state and
    emit the updated running totals (update-mode semantics)."""
    n, sum_cents, mx = state.get if state.exists else (0, 0, float("-inf"))
    for pdf in pdfs:
        if len(pdf):
            n += len(pdf)
            # per-row rounding to cents matches DECIMAL(18,2) accumulation
            sum_cents += int(pdf["value"].mul(100).round().astype("int64").sum())
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, sum_cents, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "sum_value": [sum_cents / 100.0],
            "max_value": [mx],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, exact sum, max) of ``value`` across the
    whole stream — state that no built-in windowed agg expresses (it never
    closes). Emits the refreshed totals for every user seen in each
    micro-batch."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_running_totals,
            outputStructType=RUNNING_TOTALS_OUTPUT,
            stateStructType=RUNNING_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


HIGH_VALUE_ALERTS_OUTPUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("event_id", T.LongType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("prior_high", T.DoubleType()),
    ]
)

HIGH_WATERMARK_STATE = T.StructType([T.StructField("high", T.DoubleType())])


def _update_high_watermark(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit events that strictly exceed the user's running high-watermark;
    processed in (ts, event_id) order so alerts are deterministic."""
    (high,) = state.get if state.exists else (float("-inf"),)
    out_user, out_event, out_value, out_prior = [], [], [], []
    for pdf in pdfs:
        for row in pdf.sort_values(["ts", "event_id"]).itertuples():
            v = float(row.value)
            if v > high:
                out_user.append(key[0])
                out_event.append(int(row.event_id))
                out_value.append(v)
                out_prior.append(high)
                high = v
    state.update((high,))
    yield pd.DataFrame(
        {
            "user_id": out_user,
            "event_id": out_event,
            "value": out_value,
            "prior_high": out_prior,
        }
    )


def high_value_alerts(events: DataFrame) -> DataFrame:
    """Stateful record-breaker detector: one alert per event that sets a new
    per-user ``value`` high-watermark. The first event of a user always
    alerts (prior_high = -inf). Batch twin for tests: a running-max window
    (`max(value) over (partition by user order by ts, event_id rows between
    unbounded preceding and 1 preceding)`) with a value > prior filter."""
    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_high_watermark,
            outputStructType=HIGH_VALUE_ALERTS_OUTPUT,
            stateStructType=HIGH_WATERMARK_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
