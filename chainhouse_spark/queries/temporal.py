"""Temporal join queries over the events stream: as-of join (most recent
preceding event) and banded range join — oracle'd against DuckDB's native
ASOF JOIN / inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.operators.asof import asof_join, asof_join_forward, range_join
from chainhouse_spark.functions.rounding import round9
from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table


@register(
    "asof_purchase_click",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           c.event_id AS click_id,
           c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the most recent click by the same user at or
    before it (classic attribution as-of join)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ts"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return asof_join(
        purchases.withColumnRenamed("purchase_ts", "ts"),
        clicks,
        by="user_id",
        ts="ts",
        right_payload=["click_id", "click_ts"],
        tie_col="click_id",
    ).select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "click_id",
        "click_ts",
    )


@register(
    "range_join_sessions",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS secs_between
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 DAY
    """,
)
def range_join_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase pairs within 24h for the same user (banded range join,
    equi-keyed on user so it never goes nested-loop)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    purchases = e.filter(F.col("event_type") == "purchase")
    joined = range_join(
        clicks, purchases, by="user_id", left_ts="ts", right_ts="ts",
        lower_sec=0, upper_sec=86400,
    )
    return joined.select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("purchase_id"),
        F.col("l.user_id").alias("user_id"),
        (
            F.unix_seconds(F.col("r.ts").cast("timestamp"))
            - F.unix_seconds(F.col("l.ts").cast("timestamp"))
        ).alias("secs_between"),
    )


@register(
    "interval_join_binned",
    oracle="""
    WITH iv AS (
        SELECT i AS interval_id,
               TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 12 HOUR AS w_start,
               TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 12 HOUR
                 + INTERVAL 45 MINUTE AS w_end
        FROM (SELECT unnest(generate_series(0, 59)) AS i)
    )
    SELECT iv.interval_id,
           COUNT(e.event_id) AS n_events,
           MIN(e.ts) AS first_ts,
           MAX(e.ts) AS last_ts
    FROM iv JOIN events e ON e.ts >= iv.w_start AND e.ts < iv.w_end
    GROUP BY iv.interval_id
    """,
)
def interval_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KEY-LESS interval containment join (events ⨝ maintenance windows with
    no shared equi key) via the binning rewrite: both sides map to 1-hour
    epoch bins — intervals exploding into every bin they touch — so the
    planner gets an EQUI join on the bin instead of a nested-loop over the
    inequality. The containment predicate stays as a post-join filter for
    exactness. At 100 TB this is the difference between a hash join and an
    O(|events| × |intervals|) nested loop; with tiny interval sets Spark
    would broadcast-NL fine, but the bin key keeps the plan hash-joinable at
    ANY interval-set size. The oracle states the raw inequality join."""
    e = load_table(spark, sf_dir, "events")
    iv = spark.range(60).select(
        F.col("id").cast("int").alias("interval_id"),
        F.expr(
            "TIMESTAMP_NTZ '2024-01-01 00:00:00' + id * INTERVAL 12 HOUR"
        ).alias("w_start"),
        F.expr(
            "TIMESTAMP_NTZ '2024-01-01 00:00:00' + id * INTERVAL 12 HOUR"
            " + INTERVAL 45 MINUTE"
        ).alias("w_end"),
    )
    bin_sec = 3600
    iv_binned = iv.select(
        "*",
        F.explode(
            F.sequence(
                (F.unix_seconds(F.col("w_start").cast("timestamp")) / bin_sec).cast("long"),
                (F.unix_seconds(F.col("w_end").cast("timestamp")) / bin_sec).cast("long"),
            )
        ).alias("bin"),
    )
    e_binned = e.select(
        "event_id",
        "ts",
        (F.unix_seconds(F.col("ts").cast("timestamp")) / bin_sec).cast("long").alias("bin"),
    )
    return (
        e_binned.join(iv_binned, "bin")
        .filter((F.col("ts") >= F.col("w_start")) & (F.col("ts") < F.col("w_end")))
        .groupBy("interval_id")
        .agg(
            F.count("event_id").alias("n_events"),
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
        )
    )


@register(
    "asof_next_error",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           e.ts AS next_error_ts,
           CAST(date_diff('second', p.ts, e.ts) AS BIGINT) AS secs_to_error
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      ON p.user_id = e.user_id AND p.ts <= e.ts
    """,
)
def asof_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: for every purchase, the user's next error event
    at-or-after it (time-to-next-failure analytics). Same union-and-carry
    construction as the backward as-of with the scan direction reversed —
    one shuffle on user_id, no inequality join. The oracle is DuckDB's
    native forward ASOF (`p.ts <= e.ts`). Payload is the timestamp only, so
    same-timestamp ties can't make the result ambiguous."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("ts"),
    )
    errors = e.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts").alias("ts"),
        F.col("ts").alias("next_error_ts"),
    )
    return asof_join_forward(
        purchases,
        errors,
        by="user_id",
        ts="ts",
        right_payload=["next_error_ts"],
    ).select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "next_error_ts",
        (
            F.unix_seconds(F.col("next_error_ts").cast("timestamp"))
            - F.unix_seconds(F.col("ts").cast("timestamp"))
        ).cast("bigint").alias("secs_to_error"),
    )


@register(
    "asof_nearest_click",
    oracle="""
    WITH p AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, ts AS cts, event_id AS click_id
        FROM events WHERE event_type = 'click'
    ),
    j AS (
        SELECT p.event_id, p.user_id, p.ts, c.cts, c.click_id,
               ROW_NUMBER() OVER (
                   PARTITION BY p.event_id
                   ORDER BY CASE WHEN c.cts <= p.ts THEN p.ts - c.cts
                                 ELSE c.cts - p.ts END ASC,
                            CASE WHEN c.cts <= p.ts THEN 0 ELSE 1 END ASC,
                            CASE WHEN c.cts <= p.ts THEN -c.click_id
                                 ELSE c.click_id END ASC
               ) AS rn
        FROM p JOIN c ON p.user_id = c.user_id
    )
    SELECT event_id, user_id, click_id,
           CASE WHEN cts <= ts THEN 'b' ELSE 'f' END AS direction,
           CAST(epoch_us(CASE WHEN cts <= ts THEN ts - cts ELSE cts - ts END)
                AS BIGINT) AS gap_us
    FROM j WHERE rn = 1
    """,
)
def asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-neighbor as-of: each purchase matched to the closest click
    of the same user — before OR after, whichever is nearer (equal gaps
    prefer the preceding click). The sensor-alignment flavor DuckDB/kdb
    ship as ASOF's 'nearest' mode; here it is the backward+forward
    union-carry pair sharing one key partitioning, so the whole operator
    stays at one logical shuffle with no inequality join. The oracle is
    the exact per-purchase argmin with the operator's literal tie order
    (backward: greatest click id at equal ts; forward: smallest)."""
    from chainhouse_spark.operators.asof import asof_join_nearest

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter("event_type = 'purchase'").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter("event_type = 'click'").select(
        "user_id",
        "ts",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    matched = asof_join_nearest(
        purchases, clicks, by="user_id", ts="ts",
        right_payload=["click_id", "cts"], tie_col="click_id",
    )
    return matched.filter(F.col("click_id").isNotNull()).select(
        "event_id",
        "user_id",
        "click_id",
        F.col("__asof_dir").alias("direction"),
        F.abs(
            F.unix_micros(F.col("ts").cast("timestamp"))
            - F.unix_micros(F.col("cts").cast("timestamp"))
        ).alias("gap_us"),
    )


@register(
    "interval_overlap_join_binned",
    oracle="""
    WITH a AS (
        SELECT i AS a_id,
               TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 12 HOUR AS a_start,
               TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 12 HOUR
                 + INTERVAL 45 MINUTE AS a_end
        FROM (SELECT unnest(generate_series(0, 59)) AS i)
    ),
    b AS (
        SELECT j AS b_id,
               TIMESTAMP '2024-01-01 00:00:00' + j * INTERVAL 8 HOUR AS b_start,
               TIMESTAMP '2024-01-01 00:00:00' + j * INTERVAL 8 HOUR
                 + INTERVAL 90 MINUTE AS b_end
        FROM (SELECT unnest(generate_series(0, 89)) AS j)
    )
    SELECT a_id, b_id,
           CAST(epoch_us(LEAST(a_end, b_end) - GREATEST(a_start, b_start))
                / 60000000 AS BIGINT) AS overlap_min
    FROM a JOIN b ON a_start < b_end AND b_start < a_end
    ORDER BY a_id, b_id
    """,
)
def interval_overlap_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval OVERLAP join — BOTH sides carry intervals and a pair
    matches when they intersect (maintenance windows x incident windows:
    'which incidents touched a maintenance window, and for how long').
    The other classic key-less temporal join next to containment
    (interval_join_binned): both interval sets explode into the 1-hour
    epoch bins they touch, the planner gets an EQUI join on the bin,
    shared-bin duplicates collapse with a distinct, and the exact
    intersection predicate + overlap measure run post-join. Hash-joinable
    at any interval-set size — the inequality form is a nested loop.
    Both interval sets are deterministic constructions, so the oracle
    states the raw inequality join with the exact overlap minutes."""
    def mk(n: int, period_h: int, dur_min: int, id_name: str, pre: str):
        return spark.range(n).select(
            F.col("id").cast("int").alias(id_name),
            F.expr(
                f"TIMESTAMP_NTZ '2024-01-01 00:00:00' + id * INTERVAL {period_h} HOUR"
            ).alias(f"{pre}_start"),
            F.expr(
                f"TIMESTAMP_NTZ '2024-01-01 00:00:00' + id * INTERVAL {period_h} HOUR"
                f" + INTERVAL {dur_min} MINUTE"
            ).alias(f"{pre}_end"),
        )

    a = mk(60, 12, 45, "a_id", "a")
    b = mk(90, 8, 90, "b_id", "b")
    bin_sec = 3600

    def binned(df, pre):
        return df.select(
            "*",
            F.explode(
                F.sequence(
                    (F.unix_seconds(F.col(f"{pre}_start").cast("timestamp")) / bin_sec).cast("long"),
                    (F.unix_seconds(F.col(f"{pre}_end").cast("timestamp")) / bin_sec).cast("long"),
                )
            ).alias("bin"),
        )

    pairs = (
        binned(a, "a")
        .join(binned(b, "b"), "bin")
        .filter(
            (F.col("a_start") < F.col("b_end")) & (F.col("b_start") < F.col("a_end"))
        )
        .select("a_id", "b_id", "a_start", "a_end", "b_start", "b_end")
        .distinct()
    )
    return pairs.select(
        "a_id",
        "b_id",
        (
            (
                F.unix_micros(F.least("a_end", "b_end").cast("timestamp"))
                - F.unix_micros(F.greatest("a_start", "b_start").cast("timestamp"))
            )
            / 60_000_000
        )
        .cast("long")
        .alias("overlap_min"),
    ).orderBy("a_id", "b_id")


@register(
    "asof_tolerance_join",
    oracle="""
    WITH p AS (
        SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
        FROM events WHERE event_type = 'purchase'
    ),
    c AS (
        SELECT user_id, event_id AS click_id, ts AS click_ts
        FROM events WHERE event_type = 'click'
    ),
    matched AS (
        SELECT p.purchase_id, p.user_id, p.purchase_ts,
               c.click_id, c.click_ts
        FROM p ASOF LEFT JOIN c
          ON p.user_id = c.user_id AND p.purchase_ts >= c.click_ts
    ),
    tol AS (
        SELECT purchase_id, user_id, purchase_ts,
               CASE WHEN click_ts IS NOT NULL
                     AND purchase_ts - click_ts <= INTERVAL 30 MINUTE
                    THEN click_id END AS click_id,
               CASE WHEN click_ts IS NOT NULL
                     AND purchase_ts - click_ts <= INTERVAL 30 MINUTE
                    THEN click_ts END AS click_ts
        FROM matched
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_purchases,
           CAST(COUNT(click_id) AS BIGINT) AS n_matched,
           (ROUND((CAST(COUNT(click_id) AS DOUBLE) / COUNT(*)) * 1e9) / 1e9 + 0.0) AS match_rate,
           CAST(SUM(CASE WHEN click_id IS NOT NULL
                         THEN CAST(FLOOR(epoch(purchase_ts)) AS BIGINT)
                              - CAST(FLOOR(epoch(click_ts)) AS BIGINT)
                         ELSE 0 END) AS BIGINT) AS total_lag_seconds
    FROM tol
    """,
)
def asof_tolerance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with a TOLERANCE (pandas merge_asof's `tolerance=` —
    matches staler than 30 minutes are nulled, the point-in-time
    feature-join hygiene rule: a 'most recent click' from last week is
    not a signal). Tolerance applies AFTER the as-of match, matching
    pandas semantics exactly: a too-old nearest match nulls out rather
    than falling back to nothing-nearer. Same single-shuffle union-carry
    as the base as-of operator; the summary (match rate, total lag) is
    one scalar gather. Oracled against DuckDB's native ASOF LEFT JOIN
    with the identical post-filter."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ts"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    from chainhouse_spark.operators.asof import asof_join

    matched = asof_join(
        purchases.withColumnRenamed("purchase_ts", "ts"),
        clicks,
        by="user_id",
        ts="ts",
        right_payload=["click_id", "click_ts"],
    )
    # Tolerance compares raw timestamps (microsecond-exact interval
    # arithmetic, matching the oracle's INTERVAL comparison); the lag SUM
    # floors to whole seconds per side (unix_seconds semantics — the
    # oracle FLOORs epoch() to match). TIMESTAMP_NTZ has no direct long
    # cast; unix_seconds via TIMESTAMP is lossless under the UTC session.
    secs = lambda c: F.unix_seconds(F.col(c).cast("timestamp"))  # noqa: E731
    in_tol = F.col("click_ts").isNotNull() & (
        F.col("ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
    )
    tol = matched.select(
        "ts",
        F.when(in_tol, F.col("click_id")).alias("click_id"),
        F.when(in_tol, F.col("click_ts")).alias("click_ts"),
    )
    return tol.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
        F.count("click_id").cast("bigint").alias("n_matched"),
        round9(
            F.count("click_id").cast("double") / F.count(F.lit(1))).alias("match_rate"),
        F.sum(
            F.when(
                F.col("click_id").isNotNull(),
                secs("ts") - secs("click_ts"),
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("total_lag_seconds"),
    )


@register(
    "asof_interpolated_value",
    oracle="""
    WITH l AS (
        SELECT user_id AS k, epoch_us(ts) AS t, event_id
        FROM events WHERE event_type = 'purchase'
    ),
    r AS (
        SELECT user_id AS k, epoch_us(ts) AS t,
               CAST(CAST(ROUND(value * 100, 0) AS BIGINT) AS DOUBLE) AS v
        FROM events WHERE event_type = 'click'
    ),
    u AS (
        SELECT k, t, 1 AS side, event_id, NULL::DOUBLE AS v FROM l
        UNION ALL
        SELECT k, t, 0 AS side, NULL::BIGINT AS event_id, v FROM r
    ),
    carried AS (
        SELECT k, t, side, event_id,
            last_value(CASE WHEN side = 0 THEN v END IGNORE NULLS)
              OVER wb AS vb,
            last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS)
              OVER wb AS tb,
            last_value(CASE WHEN side = 0 THEN v END IGNORE NULLS)
              OVER wf AS vf,
            last_value(CASE WHEN side = 0 THEN t END IGNORE NULLS)
              OVER wf AS tf
        FROM u
        WINDOW
          wb AS (PARTITION BY k ORDER BY t ASC, side ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
          wf AS (PARTITION BY k ORDER BY t DESC, side ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT k AS user_id, CAST(t AS BIGINT) AS purchase_us, event_id,
           ROUND(CASE
               WHEN vb IS NULL THEN vf
               WHEN vf IS NULL THEN vb
               WHEN tf = tb THEN vb
               ELSE vb + (vf - vb) * (CAST(t AS DOUBLE) - tb) / (tf - tb)
           END / 100.0, 9) AS interp_click_value
    FROM carried WHERE side = 1
    """,
)
def asof_interpolated_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linearly interpolated as-of join (operators/asof.py::
    asof_interpolate): each purchase samples the user's click-value curve
    AT purchase time, interpolating between the bracketing clicks — the
    curve-sampling semantic (rates at trade time, sensor value at event
    time) that nearest/backward as-of joins only approximate. Flat
    extrapolation off the ends, exact-timestamp matches short-circuit.
    Click values quantize to cents before the float interpolation ratio
    (identical operands -> identical doubles). One user-keyed shuffle,
    two window passes sharing it."""
    from chainhouse_spark.operators.asof import asof_interpolate

    e = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    left = e.filter(F.col("event_type") == "purchase").select(
        "user_id", us.alias("t"), "event_id"
    )
    right = e.filter(F.col("event_type") == "click").select(
        "user_id",
        us.alias("t"),
        F.round(F.col("value") * 100, 0).cast("bigint").cast("double").alias("v"),
    )
    out = asof_interpolate(
        left, right, by="user_id", ts="t", value_col="v", out_col="__interp"
    )
    return out.select(
        "user_id",
        F.col("t").cast("bigint").alias("purchase_us"),
        "event_id",
        F.round(F.col("__interp") / 100.0, 9).alias("interp_click_value"),
    )
