"""Custom stateful streaming operator #2: live funnel progression via
applyInPandasWithState.

Tracks each user's progress through signup -> view -> purchase as events
stream in, emitting one row per step ADVANCE (the live twin of the batch
`funnel_steps` query in queries/funnel.py — same semantics: step k+1 must be
strictly after step k and within WINDOW_DAYS of the first signup).

State per key is (step, t0, t_prev) — three scalars, constant size, so the
state store is O(active users) regardless of stream length; fully-converted
users keep a terminal 3-state until the idle timeout reaps them.
"""

from __future__ import annotations

import datetime as dt
from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WINDOW_DAYS = 14

ADVANCE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("step", IntegerType()),
        StructField("step_name", StringType()),
        StructField("step_ts", TimestampType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("step", IntegerType()),
        StructField("t0", TimestampType()),
        StructField("t_prev", TimestampType()),
    ]
)

_STEP_EVENT = {1: "signup", 2: "view", 3: "purchase"}


def make_funnel_tracker(window_days: int = WINDOW_DAYS, idle_timeout_sec: int = 86400):
    """(key, pdf_iter, state) -> pdf_iter for applyInPandasWithState.
    Deterministic function of (state, sorted batch) — replay-safe."""

    def track(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return

        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        if state.exists:
            step, t0, t_prev = state.get
        else:
            step, t0, t_prev = 0, None, None

        deadline = (
            t0 + dt.timedelta(days=window_days) if t0 is not None else None
        )
        advances = []
        for ts, etype in zip(rows["ts"], rows["event_type"]):
            ts = ts.to_pydatetime()
            if step >= 3:
                break
            want = _STEP_EVENT[step + 1]
            if etype != want:
                continue
            if step == 0:
                step, t0, t_prev = 1, ts, ts
                deadline = t0 + dt.timedelta(days=window_days)
                advances.append((user_id, 1, "signup", ts))
            elif ts > t_prev and ts <= deadline:
                step, t_prev = step + 1, ts
                advances.append((user_id, step, _STEP_EVENT[step], ts))

        state.update((step, t0, t_prev))
        state.setTimeoutDuration(idle_timeout_sec * 1000)
        if advances:
            yield pd.DataFrame(
                advances, columns=["user_id", "step", "step_name", "step_ts"]
            )

    return track


def funnel_advances(
    events_stream: DataFrame,
    window_days: int = WINDOW_DAYS,
) -> DataFrame:
    """events(user_id, ts, event_type) stream -> step-advance stream."""
    return (
        events_stream.select("user_id", "ts", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            make_funnel_tracker(window_days),
            outputStructType=ADVANCE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )
