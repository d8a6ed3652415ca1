"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (task brief §streaming: "custom stateful
operators"). The batch twin is queries.q_sessionize (window lag/gap);
this is the streaming shape — per-user state carries the open
session's (start, last_ts, n_events) across micro-batches, emits a row
per CLOSED session, and a processing-time timeout flushes idle users.

State scale: one small tuple per active user — partitioned by user_id
across executors, checkpointed by the engine; at 10^9 users this is
the standard keyed-state sharding, no driver involvement.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StructField,
    StructType,
)

SESSION_GAP_S = 1800

OUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", LongType()),
        StructField("session_end", LongType()),
        StructField("n_events", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("start", LongType()),
        StructField("last", LongType()),
        StructField("n", LongType()),
    ]
)


def _make_sessionize_group(flush_timeout_ms: int):
    def _sessionize_group(
        key: Tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield pd.DataFrame(
                {"user_id": [user_id], "session_start": [start],
                 "session_end": [last], "n_events": [n]}
            )
            return

        ts = []
        for pdf in pdfs:
            ts.extend(int(t) for t in pdf["ts_epoch"])
        ts.sort()
        start, last, n = state.get if state.exists else (None, None, 0)
        closed = []
        for t in ts:
            if start is None:
                start, last, n = t, t, 1
            elif t - last > SESSION_GAP_S:
                closed.append((start, last, n))
                start, last, n = t, t, 1
            else:
                last = t
                n += 1
        state.update((start, last, n))
        if flush_timeout_ms > 0:
            state.setTimeoutDuration(flush_timeout_ms)
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_start": [c[0] for c in closed],
                    "session_end": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

    return _sessionize_group


def streaming_sessions(
    events_stream: DataFrame, flush_timeout_ms: int = 0
) -> DataFrame:
    """events(user_id long, ts_epoch long) stream -> closed sessions.
    Input must carry event-time as epoch seconds (``ts_epoch``).

    ``flush_timeout_ms > 0`` registers a processing-time timeout that
    closes idle users' open sessions — for CONTINUOUS deployments.
    Leave 0 under Trigger.AvailableNow: a registered processing-time
    timeout keeps the drain alive waiting for wall-clock to pass
    (measured hang), and a drain has no later batch to flush into —
    open sessions correctly stay in the checkpointed state."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if flush_timeout_ms > 0
        else GroupStateTimeout.NoTimeout
    )
    return (
        events_stream.groupBy("user_id")
        .applyInPandasWithState(
            _make_sessionize_group(flush_timeout_ms),
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=timeout,
        )
    )
