"""Batch gaps-and-islands sessionization as a reusable operator.

Semantics (shared with the streaming applyInPandasWithState sessionizer in
streaming/sessionize.py): events of a user belong to one session as long as
consecutive events are <= `gap_seconds` apart; a longer silence starts a new
session. Ties on timestamp break on `order_col` so boundaries are
deterministic.

Scale: one shuffle total — the lag window, the running-sum window, and the
final group-by all share the user partitioning, so Catalyst reuses a single
exchange (pinned by tests/test_plans.py::test_sessionize_single_shuffle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize_events(
    e: DataFrame,
    gap_seconds: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_col: str = "event_id",
) -> DataFrame:
    """(user, session_id, n_events, session_start, session_end, session_value)
    with exact decimal value sums."""
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    flagged = e.select(
        user_col,
        order_col,
        ts_col,
        value_col,
        F.lag(ts_col).over(w).alias("prev_ts"),
    ).select(
        user_col,
        order_col,
        ts_col,
        value_col,
        F.when(
            F.col("prev_ts").isNull()
            | F.expr(f"{ts_col} > prev_ts + INTERVAL {gap_seconds} SECOND"),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    sessions = flagged.select(
        user_col,
        ts_col,
        value_col,
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .alias("session_id"),
    )
    return sessions.groupBy(user_col, "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.expr(f"CAST(SUM(CAST({value_col} AS DECIMAL(18,6))) AS DOUBLE)").alias(
            "session_value"
        ),
    )
