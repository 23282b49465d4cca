"""As-of join: for each left row, the most recent right row at-or-before
its timestamp within the same key group.

Spark has no native ASOF JOIN; the scalable construction is the
union-and-carry-forward trick:

    1. tag both sides and union them (no join!),
    2. one window sorted by (key, ts, side) carries the latest right-side
       payload forward (`last(..., ignorenulls=True)`),
    3. keep only left rows.

Cost: ONE shuffle on the key (the window partition) — versus a naive
inequality join which degenerates to a per-key cross product. Ties
(right.ts == left.ts) match, like DuckDB/kdb ASOF semantics: the right
side sorts before the left at equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    right_payload: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """Left as-of join. Output = left columns + `right_payload` columns
    (NULL when no right row precedes).

    `tie_col`: optional unique right-side column making carry-forward
    deterministic when several right rows share one timestamp (the row with
    the greatest (ts, tie_col) wins).
    """
    return _asof_union_carry(left, right, by, ts, right_payload, tie_col, forward=False)


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    right_payload: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """Forward as-of join: for each left row, the EARLIEST right row
    at-or-after its timestamp in the same key group (time-to-next-event
    analytics: next failure, next restock, next price print). Same
    union-and-carry construction as `asof_join` with the scan direction
    reversed — still ONE shuffle on the key, never an inequality join."""
    return _asof_union_carry(left, right, by, ts, right_payload, tie_col, forward=True)


def _asof_union_carry(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    right_payload: list[str],
    tie_col: str | None,
    forward: bool,
) -> DataFrame:
    lcols = left.columns
    payload_struct = F.struct(*[F.col(c) for c in right_payload])

    l = left.select(
        F.col(by).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        F.struct(*[F.col(c) for c in lcols]).alias("__l"),
        F.lit(None).cast(
            "struct<" + ",".join(f"{c}:{right.schema[c].dataType.simpleString()}" for c in right_payload) + ">"
        ).alias("__r"),
    )
    r = right.select(
        F.col(by).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        (F.col(tie_col).cast("long") if tie_col else F.lit(0).cast("long")).alias("__tie"),
        F.lit(None).cast(l.schema["__l"].dataType.simpleString()).alias("__l"),
        payload_struct.alias("__r"),
    )

    # Scan order: backward walks time ascending (carry = latest right row at
    # or before me); forward walks time DESCENDING (carry = earliest right
    # row at or after me). Either way the right side sorts before the left
    # at equal timestamps so ties match, and the tie column makes the
    # carried pick total-ordered.
    if forward:
        order = [F.col("__ts").desc(), F.col("__side").asc(), F.col("__tie").desc()]
    else:
        order = [F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc()]
    w = (
        Window.partitionBy("__k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = l.unionByName(r).withColumn(
        "__carried", F.last("__r", ignorenulls=True).over(w)
    )
    out = merged.filter(F.col("__side") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        *[F.col(f"__carried.{c}").alias(c) for c in right_payload],
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    lower_sec: int,
    upper_sec: int,
) -> DataFrame:
    """Band/range join: right rows whose timestamp falls within
    [left_ts + lower_sec, left_ts + upper_sec], equi-matched on `by`.

    The equi key keeps this a sort-merge/shuffled-hash join (the range
    predicate is a post-join filter) — never a broadcast-nested-loop.
    """
    lo = F.expr(f"l.{left_ts} + INTERVAL {lower_sec} SECOND")
    hi = F.expr(f"l.{left_ts} + INTERVAL {upper_sec} SECOND")
    return (
        left.alias("l")
        .join(
            right.alias("r"),
            (F.col(f"l.{by}") == F.col(f"r.{by}"))
            & (F.col(f"r.{right_ts}") >= lo)
            & (F.col(f"r.{right_ts}") <= hi),
        )
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    right_payload: list[str],
    tie_col: str | None = None,
) -> DataFrame:
    """Nearest as-of join: for each left row, the right row with the
    SMALLEST absolute time gap in the key group — before or after
    (sensor/price alignment where either neighbor is acceptable). Equal
    gaps prefer the backward (at-or-before) match, mirroring the
    tie-matching of the directional joins.

    Built as backward-carry then forward-carry chained over the same key
    — two windows on one partitioning (Catalyst reuses the exchange), so
    still no inequality join anywhere. Output adds `__asof_dir`
    ('b'/'f'/NULL) naming which side won.
    """
    rts = "__nearest_rts"
    r = right.withColumn(rts, F.col(ts))
    payload = list(right_payload) + [rts]
    back = asof_join(left, r, by, ts, payload, tie_col)
    for c in payload:
        back = back.withColumnRenamed(c, f"__b_{c}")
    both = asof_join_forward(back, r, by, ts, payload, tie_col)
    for c in payload:
        both = both.withColumnRenamed(c, f"__f_{c}")

    # plain subtraction: day-time INTERVAL for timestamps, numeric for
    # numeric ts columns — both compare with <= (a double cast would
    # reject TIMESTAMP_NTZ)
    gap_b = F.col(ts) - F.col(f"__b_{rts}")
    gap_f = F.col(f"__f_{rts}") - F.col(ts)
    pick_b = F.when(F.col(f"__b_{rts}").isNull(), F.lit(False)).otherwise(
        F.col(f"__f_{rts}").isNull() | (gap_b <= gap_f)
    )
    out_cols = [c for c in left.columns]
    sel = [F.col(c) for c in out_cols]
    for c in right_payload:
        sel.append(
            F.when(pick_b, F.col(f"__b_{c}")).otherwise(F.col(f"__f_{c}")).alias(c)
        )
    sel.append(
        F.when(F.col(f"__b_{rts}").isNull() & F.col(f"__f_{rts}").isNull(), F.lit(None))
        .when(pick_b, F.lit("b"))
        .otherwise(F.lit("f"))
        .alias("__asof_dir")
    )
    return both.select(*sel)


def asof_interpolate(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    value_col: str,
    out_col: str = "interp_value",
) -> DataFrame:
    """Linearly interpolated as-of join: for each left row, the right
    series' value at the left timestamp, interpolated between the
    bracketing right rows (vb at tb <= t, vf at tf >= t):

        v(t) = vb + (vf - vb) * (t - tb) / (tf - tb)

    Flat extrapolation when only one side exists; NULL when the key has
    no right rows; exact right-timestamp matches return that row's value
    (tb == tf guard). The finance/sensor standard ("sample the curve at
    trade time") that a nearest-neighbor as-of join approximates.

    Same scale shape as _asof_union_carry: ONE key-hashed shuffle, two
    window passes (ascending and descending share the partitioning; the
    second pass adds a sort, not an exchange), never an inequality join.
    """
    l = left.select(
        F.col(by).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(1).alias("__side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__l"),
        F.lit(None).cast("double").alias("__v"),
    )
    r = right.select(
        F.col(by).alias("__k"),
        F.col(ts).alias("__ts"),
        F.lit(0).alias("__side"),
        F.lit(None).cast(l.schema["__l"].dataType.simpleString()).alias("__l"),
        F.col(value_col).cast("double").alias("__v"),
    )
    u = l.unionByName(r)
    # right rows sort before left at equal ts in the ascending pass (exact
    # matches carry backward), after left in the descending pass — so an
    # exact match yields tb == tf == t and the guard returns vb.
    wb = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wf = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").desc(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    rv = F.when(F.col("__side") == 0, F.col("__v"))
    rt = F.when(F.col("__side") == 0, F.col("__ts"))
    carried = (
        u.withColumn("__vb", F.last(rv, ignorenulls=True).over(wb))
        .withColumn("__tb", F.last(rt, ignorenulls=True).over(wb))
        .withColumn("__vf", F.last(rv, ignorenulls=True).over(wf))
        .withColumn("__tf", F.last(rt, ignorenulls=True).over(wf))
    )
    t = F.col("__ts").cast("double")
    tb = F.col("__tb").cast("double")
    tf = F.col("__tf").cast("double")
    interp = (
        F.when(F.col("__vb").isNull(), F.col("__vf"))
        .when(F.col("__vf").isNull(), F.col("__vb"))
        .when(tf == tb, F.col("__vb"))
        .otherwise(
            F.col("__vb")
            + (F.col("__vf") - F.col("__vb")) * (t - tb) / (tf - tb)
        )
    )
    return carried.filter(F.col("__side") == 1).select(
        *[F.col(f"__l.{c}").alias(c) for c in left.columns],
        interp.alias(out_col),
    )
