"""Custom stateful streaming operator: gap-based sessionization via
applyInPandasWithState (SURVEY.md §2.6 streaming row — the "custom stateful
operator" surface Spark exposes for logic windows can't express).

Groups events per user into sessions closed after `gap_seconds` of
inactivity; emits one row per closed session. State per key is just
(session_start, last_seen, n_events, sum_value) — constant size, so state
store growth is O(active keys), the scalable shape.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("session_start", TimestampType()),
        StructField("last_seen", TimestampType()),
        StructField("n_events", LongType()),
        StructField("sum_value", DoubleType()),
    ]
)


def make_sessionizer(gap_seconds: int = 1800, use_timeout: bool = True):
    """Returns the (key, pdf_iter, state) -> pdf_iter function for
    applyInPandasWithState. Pure function of inputs + state: deterministic
    replay under failure recovery.

    use_timeout=False skips timeout registration entirely (pair with
    GroupStateTimeout.NoTimeout): sessions then close only when a LATER
    event of the same key arrives past the gap, and each key's final
    session stays open forever. Needed for Trigger.AvailableNow runs —
    a registered ProcessingTimeTimeout keeps the trigger scheduling empty
    micro-batches waiting for wall-clock expiry, so the query never
    terminates (observed: batchId 0->63 with zero new input rows)."""

    def sessionize(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        if state.exists:
            start, last, n, sv = state.get
        else:
            start = last = None
            n, sv = 0, 0.0

        closed = []
        for ts, value in zip(rows["ts"], rows["value"]):
            ts = ts.to_pydatetime()
            if last is not None and (ts - last).total_seconds() > gap_seconds:
                closed.append((user_id, start, last, n, sv))
                start, n, sv = ts, 0, 0.0
            if start is None:
                start = ts
            last = ts
            n += 1
            sv += float(value)

        if use_timeout and state.hasTimedOut:
            closed.append((user_id, start, last, n, sv))
            state.remove()
        else:
            state.update((start, last, n, sv))
            if use_timeout:
                state.setTimeoutDuration(gap_seconds * 1000)

        if closed:
            yield pd.DataFrame(
                closed,
                columns=["user_id", "session_start", "session_end", "n_events", "sum_value"],
            )

    return sessionize


def sessionized(
    events_stream: DataFrame, gap_seconds: int = 1800, use_timeout: bool = True
) -> DataFrame:
    """events(user_id, ts, value) stream -> closed sessions stream.

    use_timeout=True (resident deployments): idle sessions also close via
    processing-time timeout. use_timeout=False (Trigger.AvailableNow /
    batch-deterministic runs): no timeout registration, so the trigger can
    drain and terminate — see make_sessionizer."""
    return (
        events_stream.withWatermark("ts", "1 hour")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_sessionizer(gap_seconds, use_timeout=use_timeout),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=(
                GroupStateTimeout.ProcessingTimeTimeout
                if use_timeout
                else GroupStateTimeout.NoTimeout
            ),
        )
    )
