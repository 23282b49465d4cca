"""Custom stateful streaming operator #3: per-user running aggregates via
Spark 4's `transformWithStateInPandas` — the successor API to
`applyInPandasWithState` (typed per-state handles, timers, TTL support).

Maintains (n_events, sum_cents, max_cents) per user and emits the UPDATED
running totals for every user touched by a micro-batch — a changelog of the
per-user aggregate, which is what a downstream serving store consumes.
After draining a source, the last emitted row per user equals the batch
groupBy aggregate of everything ingested (the equivalence the test pins).

State is three scalars per user (ValueState): the store is O(active users)
and all combine logic is associative integer arithmetic, so micro-batch
boundaries and replays cannot change the running totals' trajectory.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = (
    "user_id long, n_events long, sum_cents long, max_cents long"
)

_STATE_SCHEMA = "n long, s long, m long"


class UserStatsProcessor(StatefulProcessor):
    """Running (count, sum, max) of value-cents per user."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._state = handle.getValueState("totals", _STATE_SCHEMA)

    def handleInputRows(
        self, key: Tuple[Any, ...], rows: Iterator[pd.DataFrame], timerValues
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        n, s, m = (self._state.get() or (0, 0, 0)) if self._state.exists() else (0, 0, 0)
        for pdf in rows:
            cents = pdf["v_cents"]
            n += int(len(cents))
            s += int(cents.sum())
            m = max(m, int(cents.max()))
        self._state.update((n, s, m))
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "n_events": [n],
                "sum_cents": [s],
                "max_cents": [m],
            }
        )

    def close(self) -> None:
        pass


def user_stats_changelog(events_stream: DataFrame) -> DataFrame:
    """events(user_id, v_cents) stream -> running per-user totals changelog.

    Input must already carry integer `v_cents` (exactness is the caller's
    schema contract, same as operators/incremental.py)."""
    return (
        events_stream.select("user_id", "v_cents")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=UserStatsProcessor(),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
