"""Hypertable-style time-series rollups over the events stream: base
per-minute aggregation, a coarser rollup computed FROM the finer one
(partial-aggregate reuse — the continuous-aggregate pattern), and a
gap-filled minute spine.

Scale: the minute rollup is the only pass over raw events (one shuffle on
a well-distributed (minute, type) key); every coarser resolution reuses it,
shrinking input by the bucket fan-in instead of rescanning the fact table.
The gap-fill spine is generated, not scanned — sequence+explode costs
nothing and the join against the rollup broadcasts the day's slice.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chainhouse_spark.functions.rounding import round9
from chainhouse_spark.queries.registry import exempt_round9, register
from chainhouse_spark.tables import load_table

_VAL = "CAST(value AS DECIMAL(18,6))"


def _minute_rollup(e: DataFrame) -> DataFrame:
    return (
        e.groupBy(
            F.date_trunc("minute", F.col("ts")).alias("minute"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(f"SUM({_VAL})").alias("sum_value_dec"),
        )
    )


@register(
    "ts_rollup_minute",
    oracle=f"""
    SELECT date_trunc('minute', ts) AS minute, event_type,
           COUNT(*) AS n,
           CAST(SUM({_VAL}) AS DOUBLE) AS sum_value,
           (ROUND((CAST(SUM({_VAL}) AS DOUBLE) / COUNT(*)) * 1e9) / 1e9
             + 0.0) AS avg_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_rollup_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Base resolution: per-minute per-type counts and decimal-exact sums."""
    e = load_table(spark, sf_dir, "events")
    m = _minute_rollup(e)
    return m.select(
        "minute",
        "event_type",
        "n",
        F.expr("CAST(sum_value_dec AS DOUBLE)").alias("sum_value"),
        # round-at-9 emission: value-scale ratio (bounded by the value
        # domain, not data volume) — sf0.001 happened to be round-clean,
        # the sf0.01 convention audit flagged the raw division
        F.expr(
            "(ROUND((CAST(sum_value_dec AS DOUBLE) / n) * 1e9) / 1e9 + 0.0)"
        ).alias("avg_value"),
    )


@register(
    "ts_rollup_hour_from_minute",
    oracle=f"""
    SELECT date_trunc('hour', minute) AS hour, event_type,
           CAST(SUM(n) AS BIGINT) AS n,
           CAST(SUM(sum_value_dec) AS DOUBLE) AS sum_value
    FROM (
      SELECT date_trunc('minute', ts) AS minute, event_type,
             COUNT(*) AS n, SUM({_VAL}) AS sum_value_dec
      FROM events GROUP BY 1, 2
    ) m
    GROUP BY 1, 2
    """,
)
def ts_rollup_hour_from_minute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour resolution computed from the minute rollup, not the raw table —
    counts and sums re-aggregate losslessly (the continuous-aggregate
    contract); input shrinks by the minute→hour fan-in."""
    e = load_table(spark, sf_dir, "events")
    m = _minute_rollup(e)
    return (
        m.groupBy(F.date_trunc("hour", F.col("minute")).alias("hour"), "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.expr("CAST(SUM(sum_value_dec) AS DOUBLE)").alias("sum_value"),
        )
    )


@register(
    "ts_minute_spine_gapfill",
    oracle=f"""
    WITH spine AS (
      SELECT UNNEST(generate_series(TIMESTAMP '2024-01-05 00:00:00',
                                    TIMESTAMP '2024-01-05 23:59:00',
                                    INTERVAL 1 MINUTE)) AS minute
    ),
    m AS (
      SELECT date_trunc('minute', ts) AS minute, COUNT(*) AS n,
             SUM({_VAL}) AS sum_value_dec
      FROM events
      WHERE event_type = 'click'
        AND ts >= TIMESTAMP '2024-01-05 00:00:00'
        AND ts < TIMESTAMP '2024-01-06 00:00:00'
      GROUP BY 1
    )
    SELECT spine.minute,
           COALESCE(m.n, 0) AS n,
           CAST(COALESCE(m.sum_value_dec, 0) AS DOUBLE) AS sum_value
    FROM spine LEFT JOIN m ON spine.minute = m.minute
    """,
)
def ts_minute_spine_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One day of clicks on a dense 1440-minute spine, zero-filled where no
    events landed. The spine is generated (sequence+explode), never scanned."""
    e = load_table(spark, sf_dir, "events")
    m = (
        e.filter(
            (F.col("event_type") == "click")
            & (F.col("ts") >= F.expr("TIMESTAMP_NTZ '2024-01-05 00:00:00'"))
            & (F.col("ts") < F.expr("TIMESTAMP_NTZ '2024-01-06 00:00:00'"))
        )
        .groupBy(F.date_trunc("minute", F.col("ts")).alias("m_minute"))
        .agg(F.count(F.lit(1)).alias("n"), F.expr(f"SUM({_VAL})").alias("sum_value_dec"))
    )
    spine = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(TIMESTAMP_NTZ '2024-01-05 00:00:00', "
                "TIMESTAMP_NTZ '2024-01-05 23:59:00', INTERVAL 1 MINUTE)"
            )
        ).alias("minute")
    )
    return (
        spine.join(m, spine["minute"] == m["m_minute"], "left_outer")
        .select(
            "minute",
            F.coalesce(F.col("n"), F.lit(0)).alias("n"),
            F.expr("CAST(COALESCE(sum_value_dec, 0) AS DOUBLE)").alias("sum_value"),
        )
    )


@register(
    "sessionize_batch",
    oracle=f"""
    SELECT user_id, session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST(SUM({_VAL}) AS DOUBLE) AS session_value
    FROM (
      SELECT user_id, ts, value,
             CAST(SUM(is_new) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING
             ) AS BIGINT) AS session_id
      FROM (
        SELECT user_id, event_id, ts, value,
               CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                     OR ts > lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                            + INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
      ) flagged
    ) sessions
    GROUP BY user_id, session_id
    """,
)
def sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (gaps-and-islands): a new session starts after a
    30-minute silence; per-session event counts, bounds, and exact value sums.

    The batch twin of the streaming applyInPandasWithState sessionizer —
    same session boundaries, but expressed as two stacked windows (lag ->
    gap flag -> running sum), all JVM-side; see
    operators/sessionize.py::sessionize_events for the shuffle analysis.
    """
    from chainhouse_spark.operators.sessionize import sessionize_events

    e = load_table(spark, sf_dir, "events")
    return sessionize_events(e, gap_seconds=1800)


@register(
    "ts_tumbling_window",
    oracle=f"""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM({_VAL}) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch tumbling windows via F.window — the same construct the
    streaming engine uses, so a batch backfill and the live stream share
    window boundaries exactly (epoch-aligned 5-minute buckets both here and
    in DuckDB's time_bucket)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(f"CAST(SUM({_VAL}) AS DOUBLE)").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@register(
    "ts_hopping_window",
    oracle=f"""
    WITH hops AS (
      SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start, {_VAL} AS v
      FROM events
      UNION ALL
      SELECT time_bucket(INTERVAL '5 minutes', ts - INTERVAL '150 seconds')
               + INTERVAL '150 seconds' AS window_start, {_VAL} AS v
      FROM events
    )
    SELECT window_start, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(v) AS DOUBLE) AS sum_value
    FROM hops GROUP BY window_start
    """,
)
def ts_hopping_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping (sliding) windows: 5-minute span, 150-second hop — every
    event lands in exactly 2 overlapping windows. F.window's slideDuration
    emits the per-window rows directly; the oracle reconstructs the same
    assignment as a union of the two phase-shifted tumbling grids."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes", "150 seconds").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.expr(f"CAST(SUM({_VAL}) AS DOUBLE)").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n", "sum_value")
    )


@register(
    "ts_ohlc_bars",
    oracle=f"""
    SELECT event_type,
           date_trunc('hour', ts) AS bar_hour,
           arg_min(value, ts) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           arg_max(value, ts) AS close,
           COUNT(*) AS volume,
           CAST(SUM({_VAL}) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def ts_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC resampling (the financial-bar shape ClickHouse users build with
    argMin/argMax): per type and hour, first/last value by (ts, event_id)
    total order plus high/low/volume. ts is unique per series in this data
    (asserted by the oracle match); under timestamp ties, swap the ordering
    key for a composite scalar (epoch_micros * K + event_id) — min_by needs
    a single comparable both engines agree on. One shuffle: all six
    aggregates share the group-by."""
    e = load_table(spark, sf_dir, "events")
    return e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bar_hour")
    ).agg(
        F.expr("MIN_BY(value, ts)").alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.expr("MAX_BY(value, ts)").alias("close"),
        F.count(F.lit(1)).alias("volume"),
        F.expr(f"CAST(SUM({_VAL}) AS DOUBLE)").alias("total_value"),
    )


# Linear interpolation over a gappy hourly series. The interpolation weight
# and blend are the same float expression text in both engines over
# bit-identical inputs (exact-decimal hourly sums -> one division), so the
# filled values hash-match. prev/next neighbors come from IGNORE NULLS
# window frames; edges fall back to nearest-neighbor (bfill/ffill).
_INTERP = """
    CASE
      WHEN v IS NOT NULL THEN v
      WHEN prev_v IS NULL THEN next_v
      WHEN next_v IS NULL THEN prev_v
      ELSE prev_v + (next_v - prev_v)
           * (CAST(idx - prev_i AS DOUBLE) / CAST(next_i - prev_i AS DOUBLE))
    END
"""


@register(
    "ts_interpolate_linear",
    oracle=f"""
    WITH spine AS (
        SELECT UNNEST(generate_series(TIMESTAMP '2024-01-05 00:00:00',
                                      TIMESTAMP '2024-01-05 23:00:00',
                                      INTERVAL 1 HOUR)) AS hour
    ),
    hourly AS (
        SELECT date_trunc('hour', ts) AS hour,
               CAST(SUM({_VAL}) AS DOUBLE) / COUNT(*) AS hv
        FROM events
        WHERE event_type = 'purchase'
          AND ts >= TIMESTAMP '2024-01-05 00:00:00'
          AND ts < TIMESTAMP '2024-01-06 00:00:00'
        GROUP BY 1
    ),
    base AS (
        SELECT spine.hour,
               CAST(date_part('hour', spine.hour) AS BIGINT) AS idx,
               hourly.hv AS v
        FROM spine LEFT JOIN hourly ON spine.hour = hourly.hour
    ),
    nb AS (
        SELECT hour, idx, v,
            last_value(v IGNORE NULLS) OVER
              (ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
            last_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS) OVER
              (ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_i,
            first_value(v IGNORE NULLS) OVER
              (ORDER BY idx ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v,
            first_value(CASE WHEN v IS NOT NULL THEN idx END IGNORE NULLS) OVER
              (ORDER BY idx ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_i
        FROM base
    )
    SELECT hour, (ROUND((v) * 1e9) / 1e9 + 0.0) AS observed, (ROUND(({_INTERP}) * 1e9) / 1e9 + 0.0) AS filled FROM nb
    """,
)
def ts_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-filled hourly series with LINEAR interpolation between observed
    neighbors (TimescaleDB `interpolate()` / ClickHouse WITH FILL analogue).
    Spine + one windowed pass: the IGNORE NULLS frames find each gap's
    bracketing observations without a self-join; a 24-row series per day
    means the window state is trivially bounded at any scale when
    partitioned by (series, day)."""
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.filter(
            (F.col("event_type") == "purchase")
            & (F.col("ts") >= F.expr("TIMESTAMP_NTZ '2024-01-05 00:00:00'"))
            & (F.col("ts") < F.expr("TIMESTAMP_NTZ '2024-01-06 00:00:00'"))
        )
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h_hour"))
        .agg(
            F.expr(f"CAST(SUM({_VAL}) AS DOUBLE) / COUNT(*)").alias("hv"),
        )
    )
    spine = spark.range(1).select(
        F.explode(
            F.expr(
                "sequence(TIMESTAMP_NTZ '2024-01-05 00:00:00', "
                "TIMESTAMP_NTZ '2024-01-05 23:00:00', INTERVAL 1 HOUR)"
            )
        ).alias("hour")
    )
    base = (
        spine.join(hourly, spine["hour"] == hourly["h_hour"], "left_outer")
        .select(
            "hour",
            F.expr("CAST(date_part('HOUR', hour) AS BIGINT)").alias("idx"),
            F.col("hv").alias("v"),
        )
    )
    base.createOrReplaceTempView("_ts_interp_base")
    return spark.sql(
        f"""
        WITH nb AS (
            SELECT hour, idx, v,
                last_value(v) IGNORE NULLS OVER
                  (ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_v,
                last_value(CASE WHEN v IS NOT NULL THEN idx END) IGNORE NULLS OVER
                  (ORDER BY idx ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_i,
                first_value(v) IGNORE NULLS OVER
                  (ORDER BY idx ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_v,
                first_value(CASE WHEN v IS NOT NULL THEN idx END) IGNORE NULLS OVER
                  (ORDER BY idx ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_i
            FROM _ts_interp_base
        )
        SELECT hour, (ROUND((v) * 1e9) / 1e9 + 0.0) AS observed, (ROUND(({_INTERP}) * 1e9) / 1e9 + 0.0) AS filled FROM nb
        """
    )


@register(
    "ts_session_window_builtin",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    isl AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM isl GROUP BY user_id, sid
    """,
)
def ts_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch F.session_window (30-minute inactivity gap) — the built-in twin
    of the hand-rolled gaps-and-islands `sessionize_batch`. The oracle
    reconstructs identical sessions via lag + running island sum, proving
    the built-in's window semantics (end = last event + gap) against first
    principles. One shuffle on user_id; Spark merges overlapping candidate
    windows inside the aggregate."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


@register(
    "ts_lttb_downsample",
    oracle="""
    WITH pts AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS x,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS y_cents,
               event_id,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1
                 AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM events
    ),
    b AS (
        SELECT *, CAST(FLOOR(rn / 100.0) AS BIGINT) AS bucket,
               CAST(FLOOR((n - 1) / 100.0) AS BIGINT) AS last_bucket
        FROM pts
    ),
    bagg AS (
        SELECT event_type, bucket,
               CAST(SUM(x) AS DOUBLE) / COUNT(*) AS avg_x,
               CAST(SUM(y_cents) AS DOUBLE) / (COUNT(*) * 100.0) AS avg_y
        FROM b GROUP BY event_type, bucket
    ),
    anchors AS (
        SELECT event_type, bucket,
               LAG(avg_x)  OVER w AS px, LAG(avg_y)  OVER w AS py,
               LEAD(avg_x) OVER w AS nx, LEAD(avg_y) OVER w AS ny
        FROM bagg
        WINDOW w AS (PARTITION BY event_type ORDER BY bucket)
    ),
    scored AS (
        SELECT b.event_type, b.bucket, b.last_bucket, b.rn, b.event_id,
               b.x, b.y_cents,
               CASE WHEN a.px IS NULL OR a.nx IS NULL THEN NULL
                    ELSE ABS( (a.px - a.nx) * (CAST(b.y_cents AS DOUBLE) / 100.0 - a.py)
                            - (a.px - CAST(b.x AS DOUBLE)) * (a.ny - a.py) )
               END AS area
        FROM b JOIN anchors a
          ON b.event_type = a.event_type AND b.bucket = a.bucket
    ),
    ranked AS (
        SELECT *, ROW_NUMBER() OVER (
                    PARTITION BY event_type, bucket
                    ORDER BY CASE
                        WHEN bucket = 0 THEN -rn
                        WHEN bucket = last_bucket THEN rn
                        ELSE area END DESC,
                    event_id ASC) AS pick
        FROM scored
    )
    SELECT event_type, CAST(bucket AS BIGINT) AS bucket, event_id,
           CAST(x AS BIGINT) AS x_epoch,
           CAST(y_cents AS DOUBLE) / 100.0 AS y
    FROM ranked WHERE pick = 1
    """,
)
def ts_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (ClickHouse
    `largestTriangleThreeBuckets`, Steinarsson 2013) in the fixed-anchor
    form that distributes: the previous/next anchors are the neighbor
    buckets' average points (not the previously-selected point, whose chain
    dependency would serialize the whole series). Per 100-row bucket, keep
    the point maximizing the triangle area against those anchors; first and
    last buckets pin the series endpoints. Every anchor derives from exact
    integer sums (epoch seconds, value cents) so both engines score
    identical doubles; ties break on event_id. Shape at 100 TB: two
    windows + one aggregate, all partitioned by (series, bucket-range) —
    never a per-series sequential scan, which is the point of dropping the
    chained anchor. The oracle states the same construction in DuckDB."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    wseries = Window.partitionBy("event_type")
    pts = e.select(
        "event_type",
        F.unix_seconds(F.col("ts").cast("timestamp")).alias("x"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("y_cents"),
        "event_id",
        (F.row_number().over(wseries.orderBy("ts", "event_id")) - 1).alias("rn"),
        F.count(F.lit(1)).over(wseries).alias("n"),
    )
    b = pts.select(
        "*",
        (F.col("rn") / 100).cast("bigint").alias("bucket"),
        ((F.col("n") - 1) / 100).cast("bigint").alias("last_bucket"),
    )
    bagg = b.groupBy("event_type", "bucket").agg(
        (F.sum("x").cast("double") / F.count(F.lit(1))).alias("avg_x"),
        (F.sum("y_cents").cast("double") / (F.count(F.lit(1)) * 100.0)).alias(
            "avg_y"
        ),
    )
    wb = Window.partitionBy("event_type").orderBy("bucket")
    anchors = bagg.select(
        "event_type",
        "bucket",
        F.lag("avg_x").over(wb).alias("px"),
        F.lag("avg_y").over(wb).alias("py"),
        F.lead("avg_x").over(wb).alias("nx"),
        F.lead("avg_y").over(wb).alias("ny"),
    )
    scored = b.join(anchors, ["event_type", "bucket"]).select(
        "event_type",
        "bucket",
        "last_bucket",
        "rn",
        "event_id",
        "x",
        "y_cents",
        F.when(
            F.col("px").isNull() | F.col("nx").isNull(), F.lit(None).cast("double")
        )
        .otherwise(
            F.abs(
                (F.col("px") - F.col("nx"))
                * (F.col("y_cents").cast("double") / 100.0 - F.col("py"))
                - (F.col("px") - F.col("x").cast("double"))
                * (F.col("ny") - F.col("py"))
            )
        )
        .alias("area"),
    )
    pick_key = (
        F.when(F.col("bucket") == 0, -F.col("rn").cast("double"))
        .when(F.col("bucket") == F.col("last_bucket"), F.col("rn").cast("double"))
        .otherwise(F.col("area"))
    )
    ranked = scored.withColumn(
        "pick",
        F.row_number().over(
            Window.partitionBy("event_type", "bucket").orderBy(
                pick_key.desc(), F.col("event_id").asc()
            )
        ),
    )
    return ranked.filter(F.col("pick") == 1).select(
        "event_type",
        F.col("bucket").cast("bigint").alias("bucket"),
        "event_id",
        F.col("x").cast("bigint").alias("x_epoch"),
        (F.col("y_cents").cast("double") / 100.0).alias("y"),
    )


# --------------------------------------------------------------------------
# Exponential moving average (ClickHouse exponentialMovingAverage analogue)
# --------------------------------------------------------------------------

_EMA_K = 8       # trailing window length
_EMA_ALPHA = 0.3  # decay: weight (1-alpha)^k for the k-th most recent value

# Embed the exact double literals for (1-alpha)^k so BOTH engines multiply
# by the bit-identical constant — pow() libm implementations may differ in
# the last ulp; Python repr round-trips the exact IEEE value.
_EMA_W = [repr((1.0 - _EMA_ALPHA) ** k) for k in range(_EMA_K)]


def _ema_terms(lag_fmt: str, rn: str) -> tuple[str, str]:
    """(numerator, denominator) SQL: sum of w_k * lag(value,k) over available
    rows, summed left-to-right in a fixed order on both engines."""
    num = " + ".join(
        f"({_EMA_W[k]} * COALESCE({lag_fmt.format(k=k)}, 0.0))"
        for k in range(_EMA_K)
    )
    den = " + ".join(
        f"({_EMA_W[k]} * (CASE WHEN {rn} > {k} THEN 1.0 ELSE 0.0 END))"
        for k in range(_EMA_K)
    )
    return num, den


_EMA_NUM_DUCK, _EMA_DEN_DUCK = _ema_terms(
    "lag(value, {k}) OVER w", "row_number() OVER w"
)


@register(
    "ts_ema_trailing",
    oracle=f"""
    SELECT user_id, event_id,
           ROUND(({_EMA_NUM_DUCK}) / ({_EMA_DEN_DUCK}), 6) AS ema
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def ts_ema_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-8 exponentially weighted moving average per user
    (ClickHouse ``exponentialMovingAverage`` analogue, finite-window form:
    ema_t = Σ w_k·x_{{t-k}} / Σ w_k, w_k = (1-α)^k over the rows that exist).

    The recursive EMA is a sequential scan per series; the finite-window
    form is a fixed fan-in of window lags — embarrassingly parallel after
    ONE shuffle on user_id, and every lag shares the same window frame so
    Spark evaluates them in a single pass.  Weights are embedded as exact
    double literals so Spark and DuckDB multiply bit-identical constants
    in the same left-to-right order.
    """
    e = load_table(spark, sf_dir, "events")
    num, den = _ema_terms(
        "lag(value, {k}) OVER (PARTITION BY user_id ORDER BY ts, event_id)",
        "row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)",
    )
    return e.select(
        "user_id",
        "event_id",
        F.round(F.expr(f"({num}) / ({den})"), 6).alias("ema"),
    )


# Median of a sorted double array, explicit element arithmetic so Spark and
# DuckDB execute the IDENTICAL IEEE ops (a built-in median() could average
# differently): odd n -> middle element, even n -> (lower + upper) / 2.0.
def _arr_median(arr: str) -> str:
    return (
        f"CASE WHEN size({arr}) % 2 = 1 "
        f"THEN element_at(array_sort({arr}), CAST((size({arr}) + 1) DIV 2 AS INT)) "
        f"ELSE (element_at(array_sort({arr}), CAST(size({arr}) DIV 2 AS INT)) "
        f"      + element_at(array_sort({arr}), CAST(size({arr}) DIV 2 + 1 AS INT))) / 2.0 END"
    )


def _duck_arr_median(arr: str) -> str:
    return (
        f"CASE WHEN len({arr}) % 2 = 1 "
        f"THEN list_sort({arr})[(len({arr}) + 1) // 2] "
        f"ELSE (list_sort({arr})[len({arr}) // 2] "
        f"      + list_sort({arr})[len({arr}) // 2 + 1]) / 2.0 END"
    )


@register(
    "ts_rolling_mad_anomaly",
    oracle=f"""
    WITH fr AS (
        SELECT event_id, event_type, ts, value,
               list(value) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
                   ROWS BETWEEN 14 PRECEDING AND CURRENT ROW
               ) AS arr
        FROM events
    ),
    med AS (
        SELECT event_id, event_type, ts, value, arr,
               {_duck_arr_median('arr')} AS med
        FROM fr
    ),
    mad AS (
        SELECT event_id, event_type, value, med,
               {_duck_arr_median('list_transform(arr, x -> abs(x - med))')} AS mad
        FROM med
    )
    SELECT event_id, event_type, value,
           (ROUND((med) * 1e9) / 1e9 + 0.0) AS med,
           (ROUND((mad) * 1e9) / 1e9 + 0.0) AS mad,
           ABS(value - med) > 3.0 * 1.4826 * mad AS is_anomaly
    FROM mad
    WHERE ABS(value - med) > 3.0 * 1.4826 * mad
    """,
)
def ts_rolling_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust rolling anomaly flags: per series (event_type), each point is
    compared against the MEDIAN of its trailing 15-row frame, with the
    deviation scale set by the frame's median absolute deviation (MAD x
    1.4826 ~ robust sigma). Unlike mean/stddev z-scores, a burst of
    outliers cannot drag its own threshold.

    One window shuffle on the series key; the frame's values ride along as
    a 15-element array and both medians are array expressions inside
    codegen — no second window, no self-join. Emits only the anomalies
    (the corpus-sized clean majority never leaves the executors).
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("ts", "event_id")
        .rowsBetween(-14, 0)
    )
    fr = e.select(
        "event_id", "event_type", "ts", "value",
        F.collect_list("value").over(w).alias("arr"),
    )
    med = fr.withColumn("med", F.expr(_arr_median("arr")))
    mad = med.withColumn(
        "mad", F.expr(_arr_median("transform(arr, x -> abs(x - med))"))
    )
    return (
        mad.withColumn(
            "is_anomaly",
            F.abs(F.col("value") - F.col("med")) > 3.0 * 1.4826 * F.col("mad"),
        )
        .filter("is_anomaly")
        # anomaly threshold compares RAW med/mad on both sides; only the
        # emitted columns round (even-frame medians average two floats)
        .select(
            "event_id", "event_type", "value",
            round9("med").alias("med"),
            round9("mad").alias("mad"), "is_anomaly",
        )
    )


@register(
    "ts_cusum_changepoint",
    oracle="""
    WITH o AS (
        SELECT event_type, ts, event_id, CAST(value AS DECIMAL(18,2)) AS v,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               ) AS k,
               SUM(CAST(value AS DECIMAL(18,2))) OVER (
                   PARTITION BY event_type ORDER BY ts, event_id
               ) AS s_k
        FROM events
    ),
    tot AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
               SUM(v) AS s_n
        FROM o GROUP BY event_type
    ),
    dev AS (
        -- n*S_k - k*S_n: the CUSUM deviation scaled by n — exact DECIMAL,
        -- no per-row float the engines could disagree on
        SELECT o.event_type, o.ts, o.k,
               ABS(tot.n * o.s_k - o.k * tot.s_n) AS d,
               tot.n, tot.s_n
        FROM o JOIN tot USING (event_type)
    ),
    best AS (
        SELECT event_type, ts, k, d, n,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY d DESC, k ASC
               ) AS r
        FROM dev
    )
    SELECT event_type, ts AS change_ts, k AS change_pos,
           CAST(d AS DOUBLE) / n AS max_cusum_dev
    FROM best WHERE r = 1
    """,
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint per series: the position maximizing the cumulative
    deviation from the series mean, |S_k - k*mean|. Computed as the exact
    DECIMAL |n*S_k - k*S_n| (scaling by n clears the mean's division), so
    every engine agrees on the argmax bit-for-bit; ONE final float
    division reports the conventional magnitude. Earliest-position
    tie-break. Two windows + one aggregate, all partitioned by the series
    key — the 100 TB cost is a per-series sort, same contract as any exact
    order statistic.
    """
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    wo = Window.partitionBy("event_type").orderBy("ts", "event_id")
    o = e.select(
        "event_type",
        "ts",
        "event_id",
        F.col("value").cast("decimal(18,2)").alias("v"),
    ).select(
        "event_type",
        "ts",
        F.row_number().over(wo).alias("k"),
        F.sum("v").over(
            Window.partitionBy("event_type")
            .orderBy("ts", "event_id")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("s_k"),
        "v",
    )
    tot = o.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("s_n")
    )
    dev = o.join(tot, "event_type").select(
        "event_type",
        "ts",
        "k",
        F.abs(F.col("n") * F.col("s_k") - F.col("k") * F.col("s_n")).alias("d"),
        "n",
    )
    wr = Window.partitionBy("event_type").orderBy(F.desc("d"), F.asc("k"))
    return (
        dev.withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") == 1)
        .select(
            "event_type",
            F.col("ts").alias("change_ts"),
            F.col("k").alias("change_pos"),
            (F.col("d").cast("double") / F.col("n")).alias("max_cusum_dev"),
        )
    )


@register(
    "ts_seasonal_naive_error",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               SUM(CAST(value AS DECIMAL(18,2))) AS v
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT event_type, h, v,
               LAG(v, 24) OVER (PARTITION BY event_type ORDER BY h) AS pred
        FROM hourly
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_scored,
           (ROUND((CAST(SUM(ABS(v - pred)) AS DOUBLE) / COUNT(*)) * 1e9) / 1e9 + 0.0) AS mae,
           (ROUND((CAST(SUM(ABS(v - pred)) AS DOUBLE) / CAST(SUM(v) AS DOUBLE)) * 1e9) / 1e9 + 0.0) AS wape
    FROM lagged WHERE pred IS NOT NULL
    GROUP BY event_type
    """,
)
def ts_seasonal_naive_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-baseline evaluation: the seasonal-naive predictor (this
    hour = same hour yesterday, lag 24 on the hourly rollup) scored with
    MAE and WAPE per series. The yardstick every real forecasting model
    must beat — and the decimal-exact error sums (one float division at
    the end) make the scorecard engine-reproducible. Rollup + one lag
    window + one aggregate, all keyed by series."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.sum(F.col("value").cast("decimal(18,2)")).alias("v"))
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = hourly.withColumn("pred", F.lag("v", 24).over(w)).filter(
        F.col("pred").isNotNull()
    )
    return lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.round(
            F.sum(F.abs(F.col("v") - F.col("pred"))).cast("double")
            / F.count(F.lit(1)),
            9,
        ).alias("mae"),
        F.round(
            F.sum(F.abs(F.col("v") - F.col("pred"))).cast("double")
            / F.sum("v").cast("double"),
            9,
        ).alias("wape"),
    )


@register(
    "ts_autocorrelation",
    oracle="""
    WITH base AS (
        SELECT event_type, event_id,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS x
        FROM events
        WHERE event_type IN ('click', 'purchase', 'view')
    ),
    lagged AS (
        SELECT event_type, x,
               LAG(x, 1) OVER w AS x1,
               LAG(x, 2) OVER w AS x2,
               LAG(x, 3) OVER w AS x3,
               ROW_NUMBER() OVER w AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM base
        WINDOW w AS (PARTITION BY event_type ORDER BY event_id)
    ),
    agg AS (
        SELECT event_type,
               CAST(MIN(n) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s1,
               CAST(SUM(x * x) AS BIGINT) AS s2,
               CAST(SUM(x * x1) AS BIGINT) AS sk1,
               CAST(SUM(x * x2) AS BIGINT) AS sk2,
               CAST(SUM(x * x3) AS BIGINT) AS sk3,
               CAST(SUM(CASE WHEN rk <= n - 1 THEN x ELSE 0 END) AS BIGINT) AS h1,
               CAST(SUM(CASE WHEN rk <= n - 2 THEN x ELSE 0 END) AS BIGINT) AS h2,
               CAST(SUM(CASE WHEN rk <= n - 3 THEN x ELSE 0 END) AS BIGINT) AS h3,
               CAST(SUM(CASE WHEN rk > 1 THEN x ELSE 0 END) AS BIGINT) AS t1,
               CAST(SUM(CASE WHEN rk > 2 THEN x ELSE 0 END) AS BIGINT) AS t2,
               CAST(SUM(CASE WHEN rk > 3 THEN x ELSE 0 END) AS BIGINT) AS t3
        FROM lagged GROUP BY event_type
    )
    SELECT event_type, n,
           (ROUND(((sk1 - (CAST(s1 AS DOUBLE) / n) * (h1 + t1)
                + (n - 1) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             / (s2 - n * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))) * 1e9) / 1e9 + 0.0) AS acf_1,
           (ROUND(((sk2 - (CAST(s1 AS DOUBLE) / n) * (h2 + t2)
                + (n - 2) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             / (s2 - n * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))) * 1e9) / 1e9 + 0.0) AS acf_2,
           (ROUND(((sk3 - (CAST(s1 AS DOUBLE) / n) * (h3 + t3)
                + (n - 3) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
             / (s2 - n * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))) * 1e9) / 1e9 + 0.0) AS acf_3
    FROM agg
    """,
)
def ts_autocorrelation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation function at lags 1-3 per event type (the
    stationarity/seasonality diagnostic run before choosing a forecasting
    or anomaly model). Every sum — including the lag cross-products and
    the head/tail partial sums the mean-centering expansion needs — is an
    exact integer from ONE lag-window pass; the only float math is the
    shared expansion  (S_k - mu*(head+tail) + (n-k)*mu^2) / (S_2 - n*mu^2)
    evaluated identically by both engines. One shuffle: the lag window and
    the final group share the event_type partitioning."""
    from pyspark.sql import Window

    base = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase", "view"))
        .select(
            "event_type",
            "event_id",
            F.round(F.col("value") * 100, 0).cast("bigint").alias("x"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("event_id")
    wp = Window.partitionBy("event_type")
    lagged = base.select(
        "event_type",
        "x",
        *[F.lag("x", k).over(w).alias(f"x{k}") for k in (1, 2, 3)],
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    aggs = [
        F.min("n").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("s2"),
    ]
    for k in (1, 2, 3):
        aggs += [
            F.sum(F.col("x") * F.col(f"x{k}")).cast("bigint").alias(f"sk{k}"),
            F.sum(F.when(F.col("rk") <= F.col("n") - k, F.col("x")).otherwise(0))
            .cast("bigint")
            .alias(f"h{k}"),
            F.sum(F.when(F.col("rk") > k, F.col("x")).otherwise(0))
            .cast("bigint")
            .alias(f"t{k}"),
        ]
    agg = lagged.groupBy("event_type").agg(*aggs)
    mu = F.col("s1").cast("double") / F.col("n")
    den = F.col("s2") - F.col("n") * mu * mu
    out = [F.col("event_type"), F.col("n")]
    for k in (1, 2, 3):
        num = (
            F.col(f"sk{k}")
            - mu * (F.col(f"h{k}") + F.col(f"t{k}"))
            + (F.col("n") - k) * mu * mu
        )
        out.append(round9(num / den).alias(f"acf_{k}"))
    return agg.select(*out)


@register(
    "ts_seasonality_strength",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    trend AS (
        SELECT event_type, h, c,
               CAST(SUM(c) OVER w AS BIGINT) AS s25,
               CAST(COUNT(*) OVER w AS BIGINT) AS n25
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    det AS (
        SELECT event_type, h, h % 24 AS hod,
               CAST(ROUND(c - CAST(s25 AS DOUBLE) / 25.0, 6)
                    AS DECIMAL(18,6)) AS d
        FROM trend WHERE n25 = 25
    ),
    seas AS (
        -- Seasonal mean inputs as a WINDOW over det (same lineage — no
        -- forked re-scan of the corpus): sd/n are constant per (type, hod).
        SELECT event_type, hod, d,
               CAST(SUM(d) OVER (PARTITION BY event_type, hod)
                    AS DECIMAL(28,6)) AS sd,
               CAST(COUNT(*) OVER (PARTITION BY event_type, hod)
                    AS BIGINT) AS n
        FROM det
    ),
    rem_hod AS (
        -- Sum of squared remainders per hod, EXACT: r = d - sd/n, so
        -- sum(r^2) = sum((n*d - sd)^2) / n^2 — the numerator is pure
        -- DECIMAL; one float division per (type, hod) group, rounded then
        -- DECIMAL-summed across the 24 groups. Var(detrended) inputs ride
        -- the same aggregate.
        SELECT event_type, hod, n,
               CAST(ROUND(CAST(SUM((CAST(n AS DECIMAL(10,0)) * d - sd)
                                   * (CAST(n AS DECIMAL(10,0)) * d - sd))
                               AS DOUBLE) / (n * n), 9)
                    AS DECIMAL(28,9)) AS ssr,
               CAST(SUM(CAST(d AS DECIMAL(28,6)) * d) AS DECIMAL(38,12))
                 AS sdd,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM seas
        GROUP BY event_type, hod, n
    )
    SELECT event_type,
           CAST(SUM(n_rows) AS BIGINT) AS n_hours,
           (ROUND((CAST(CAST(SUM(sdd) AS DECIMAL(38,12)) AS DOUBLE) / SUM(n_rows)
             ) * 1e9) / 1e9 + 0.0) AS var_detrended,
           (ROUND((CAST(CAST(SUM(ssr) AS DECIMAL(38,9)) AS DOUBLE) / SUM(n_rows)
             ) * 1e9) / 1e9 + 0.0) AS var_remainder,
           (ROUND((GREATEST(0.0, 1.0
               - (CAST(CAST(SUM(ssr) AS DECIMAL(38,9)) AS DOUBLE) / SUM(n_rows))
               / (CAST(CAST(SUM(sdd) AS DECIMAL(38,12)) AS DOUBLE) / SUM(n_rows)))
             ) * 1e9) / 1e9 + 0.0) AS seasonality_strength
    FROM rem_hod GROUP BY event_type
    """,
)
def ts_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite seasonality diagnostic (Hyndman's strength-of-seasonality,
    F_s = max(0, 1 - Var(remainder)/Var(detrended))) on hourly event counts
    per type: trend = centered 25-hour moving average over observed hours
    (full frames only, so edges can't diverge), seasonal = hour-of-day mean
    of the detrended series, remainder = what's left. Every mean feeding a
    variance is rounded to 6 decimals then DECIMAL-summed (the statistics-
    module idiom) so float summation order can't move the strength. Scale:
    one hourly aggregate, one 25-row frame window and one final group — all
    PARTITIONED by event_type; nothing global."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts").cast("timestamp")) / 3600)
        .cast("bigint")
        .alias("h"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-12, 12)
    )
    trend = hourly.select(
        "event_type",
        "h",
        "c",
        F.sum("c").over(w).cast("bigint").alias("s25"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("n25"),
    )
    det = trend.filter(F.col("n25") == 25).select(
        "event_type",
        (F.col("h") % 24).alias("hod"),
        F.expr(
            "CAST(ROUND(c - CAST(s25 AS DOUBLE) / 25.0, 6) AS DECIMAL(18,6))"
        ).alias("d"),
    )
    # Seasonal mean inputs as a WINDOW over det — same lineage, so the
    # corpus is scanned exactly once (a forked seas aggregate + join-back
    # would re-derive det per branch: 3 scans).
    whod = Window.partitionBy("event_type", "hod")
    seas = det.select(
        "event_type",
        "hod",
        "d",
        F.sum("d").over(whod).cast("decimal(28,6)").alias("sd"),
        F.count(F.lit(1)).over(whod).cast("bigint").alias("n"),
    )
    # Exact per-hod squared-remainder sums: r = d - sd/n, so sum(r^2) =
    # sum((n*d - sd)^2) / n^2 with a pure-DECIMAL numerator — one float
    # division per (type, hod), rounded then DECIMAL-summed across groups.
    # Var(detrended) inputs ride the same aggregate.
    rem_hod = seas.groupBy("event_type", "hod", "n").agg(
        F.expr(
            "CAST(ROUND(CAST(SUM((CAST(n AS DECIMAL(10,0)) * d - sd)"
            " * (CAST(n AS DECIMAL(10,0)) * d - sd)) AS DOUBLE)"
            " / (n * n), 9) AS DECIMAL(28,9))"
        ).alias("ssr"),
        F.expr(
            "CAST(SUM(CAST(d AS DECIMAL(28,6)) * d) AS DECIMAL(38,12))"
        ).alias("sdd"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
    )
    var_d = "CAST(CAST(SUM(sdd) AS DECIMAL(38,12)) AS DOUBLE) / SUM(n_rows)"
    var_r = "CAST(CAST(SUM(ssr) AS DECIMAL(38,9)) AS DOUBLE) / SUM(n_rows)"
    return rem_hod.groupBy("event_type").agg(
        F.sum("n_rows").cast("bigint").alias("n_hours"),
        F.expr(f"(ROUND(({var_d}) * 1e9) / 1e9 + 0.0)").alias("var_detrended"),
        F.expr(f"(ROUND(({var_r}) * 1e9) / 1e9 + 0.0)").alias("var_remainder"),
        F.expr(
            f"(ROUND((GREATEST(0.0, 1.0 - ({var_r}) / ({var_d}))) * 1e9) / 1e9 + 0.0)"
        ).alias("seasonality_strength"),
    )


@register(
    "ts_m4_downsample",
    oracle="""
    WITH pts AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts) / 21600) AS BIGINT) AS bucket,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS v,
               event_id
        FROM events
    )
    SELECT event_type, bucket,
           CAST(MIN(v) AS BIGINT) AS v_min,
           CAST(MAX(v) AS BIGINT) AS v_max,
           CAST((MIN({'t': t, 'id': event_id, 'v': v})).v AS BIGINT)
             AS v_first,
           CAST((MAX({'t': t, 'id': event_id, 'v': v})).v AS BIGINT)
             AS v_last,
           CAST(COUNT(*) AS BIGINT) AS n_points
    FROM pts GROUP BY 1, 2
    """,
)
def ts_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (Jugel et al. 2014, VLDB — 'M4: a visualization-
    oriented time series data aggregation'): per pixel bucket keep min,
    max, first, and last — the four points that make a line chart
    pixel-perfect at any zoom, the other standard reducer next to LTTB.
    6-hour buckets here. Values are exact integer cents; first/last take
    the min/max of the composite struct key (t, event_id, v) — struct
    ordering is lexicographic by field position in both engines, so
    duplicate timestamps can't flip the answer and there is no packed-
    arithmetic overflow hazard at any event_id magnitude (ADVICE r06:
    the previous t*2^32+event_id pack silently bled into the next
    second's keyspace for ids >= 2^32). One aggregate, partitioned by
    (series, bucket) — the embarrassingly-parallel shape; no windows."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts").cast("timestamp")) / 21600)
        .cast("bigint")
        .alias("bucket"),
        F.unix_seconds(F.col("ts").cast("timestamp")).cast("bigint").alias("t"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("v"),
        "event_id",
    )
    return pts.groupBy("event_type", "bucket").agg(
        F.min("v").cast("bigint").alias("v_min"),
        F.max("v").cast("bigint").alias("v_max"),
        F.expr("min(struct(t, event_id, v)).v")
        .cast("bigint")
        .alias("v_first"),
        F.expr("max(struct(t, event_id, v)).v")
        .cast("bigint")
        .alias("v_last"),
        F.count(F.lit(1)).cast("bigint").alias("n_points"),
    )


@register(
    "ts_trend_slope_by_type",
    oracle="""
    WITH pts AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS y
        FROM events
    ),
    norm AS (
        SELECT event_type, h - MIN(h) OVER () AS t, y FROM pts
    ),
    m AS (
        SELECT event_type,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(t) AS DOUBLE) AS st,
               CAST(SUM(y) AS DOUBLE) AS sy,
               CAST(SUM(t * t) AS DOUBLE) AS stt,
               CAST(SUM(y * y) AS DOUBLE) AS syy,
               CAST(SUM(t * y) AS DOUBLE) AS sty
        FROM norm GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_events,
           ROUND(((n * sty - st * sy) / (n * stt - st * st)) / 100.0, 9)
             AS slope_cents_per_hour,
           ROUND(((sy - st * ((n * sty - st * sy) / (n * stt - st * st))) / n)
                 / 100.0, 9)
             AS intercept,
           ROUND((n * sty - st * sy) * (n * sty - st * sy)
             / ((n * stt - st * st) * (n * syy - sy * sy)), 9) AS r2
    FROM m
    """,
)
def ts_trend_slope_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series OLS trend: slope/intercept/r² of value-vs-hour for every
    event type in ONE grouped aggregate — the 'is this metric drifting'
    detector, the grouped sibling of the global `stat_corr_regression`.
    Hours are re-based to the corpus minimum (a broadcast scalar window
    over a constant) so t*t sums stay small-integer-exact; all power sums
    are exact integers, the OLS formulas one shared float expression per
    group. 100 TB: one shuffle of (type, 5 sums) — nothing else moves."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts").cast("timestamp")) / 3600)
        .cast("bigint")
        .alias("h"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("y"),
    )
    h0 = pts.agg(F.min("h").alias("h0"))
    norm = pts.crossJoin(F.broadcast(h0)).select(
        "event_type", (F.col("h") - F.col("h0")).alias("t"), "y"
    )
    m = norm.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("t").cast("double").alias("st"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("t") * F.col("t")).cast("double").alias("stt"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("t") * F.col("y")).cast("double").alias("sty"),
    )
    # The slope subexpression is parenthesized IDENTICALLY here and in the
    # oracle SQL above: both sides compute st * (A/B), never (st*A)/B.
    # Float association is not associative — the two groupings differ in the
    # last ulp on real data (caught by tests/test_oracle_parity.py, round 7).
    # Outputs rounded at 9 digits per repo convention (see compare.py).
    slope = "((n * sty - st * sy) / (n * stt - st * st))"
    return m.selectExpr(
        "event_type",
        "CAST(n AS BIGINT) AS n_events",
        f"ROUND({slope} / 100.0, 9) AS slope_cents_per_hour",
        f"ROUND(((sy - st * {slope}) / n) / 100.0, 9) AS intercept",
        "ROUND((n * sty - st * sy) * (n * sty - st * sy)"
        " / ((n * stt - st * st) * (n * syy - sy * sy)), 9) AS r2",
    )


@register(
    "ts_anomaly_seasonal_zscore",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS h,
               CAST(COUNT(*) AS BIGINT) AS c
        FROM events GROUP BY 1, 2
    ),
    prof AS (
        SELECT event_type, h % 24 AS hod,
               CAST(COUNT(*) AS DOUBLE) AS n,
               CAST(SUM(c) AS DOUBLE) AS s,
               CAST(SUM(c * c) AS DOUBLE) AS q
        FROM hourly GROUP BY 1, 2
    ),
    z AS (
        SELECT h.event_type, h.h, h.c,
               (h.c - p.s / p.n)
                 / SQRT((p.q - p.s * p.s / p.n) / (p.n - 1.0)) AS z
        FROM hourly h JOIN prof p
          ON h.event_type = p.event_type AND h.h % 24 = p.hod
        WHERE p.n > 1 AND p.q * p.n > p.s * p.s
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_hours,
           CAST(SUM(CASE WHEN ABS(z) > 3.0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_anomalous,
           (ROUND((MAX(ABS(z))) * 1e9) / 1e9 + 0.0) AS max_abs_z
    FROM z GROUP BY event_type
    """,
)
def ts_anomaly_seasonal_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-profile anomaly detection: each hour's event count scored
    against ITS OWN hour-of-day profile (mean/σ per (series, hod) from
    exact integer power sums) — the ops-alerting shape that doesn't page
    at 3am just because 3am is always quiet (a global z-score does; the
    rolling-MAD flags local spikes, this flags schedule violations).
    Degenerate profiles (one observation or zero variance) are excluded
    identically in both engines via exact integer predicates. One hourly
    aggregate, a 24-cell profile joined back (broadcast at any scale),
    fixed float formula per row."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts").cast("timestamp")) / 3600)
        .cast("bigint")
        .alias("h"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    prof = hourly.groupBy(
        "event_type", (F.col("h") % 24).alias("hod")
    ).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("c").cast("double").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("double").alias("q"),
    )
    z = (
        hourly.withColumn("hod", F.col("h") % 24)
        .join(F.broadcast(prof), ["event_type", "hod"])
        .filter(
            (F.col("n") > 1) & (F.col("q") * F.col("n") > F.col("s") * F.col("s"))
        )
        .select(
            "event_type",
            F.expr(
                "(c - s / n) / SQRT((q - s * s / n) / (n - 1.0))"
            ).alias("z"),
        )
    )
    return z.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum(F.when(F.abs(F.col("z")) > 3.0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_anomalous"),
        round9(F.max(F.abs(F.col("z")))).alias("max_abs_z"),
    )


@register(
    "ts_vwap_bars",
    oracle="""
    WITH pts AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour_bucket,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS price_c,
               CAST(json_extract(props, '$.k') AS BIGINT) AS vol
        FROM events
    )
    SELECT event_type, hour_bucket,
           CAST(SUM(vol) AS BIGINT) AS total_vol,
           CASE WHEN SUM(vol) = 0 THEN NULL
                ELSE ROUND(CAST(SUM(price_c * vol) AS DOUBLE)
                           / SUM(vol) / 100.0, 9) END AS vwap,
           CAST(COUNT(*) AS BIGINT) AS n_trades
    FROM pts GROUP BY 1, 2
    """,
)
def ts_vwap_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-weighted average price per hourly bar, treating value as the
    price and the props JSON's k field as the trade size — the bar metric
    every execution desk reads next to OHLC (ts_ohlc_bars above). JSON
    extraction is a map-side codegen expression in both engines; the
    weighted mean is integer cents x integer volume summed exactly, one
    division at the end. Embarrassingly parallel on (series, hour)."""
    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "event_type",
        F.floor(F.unix_seconds(F.col("ts").cast("timestamp")) / 3600)
        .cast("bigint")
        .alias("hour_bucket"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("price_c"),
        F.get_json_object("props", "$.k").cast("bigint").alias("vol"),
    )
    return pts.groupBy("event_type", "hour_bucket").agg(
        F.sum("vol").cast("bigint").alias("total_vol"),
        # try_divide-equivalent guard: a bucket whose trades all carry
        # zero volume has no defined VWAP (NULL in both engines; a bare
        # division throws under Spark 4 ANSI).
        F.when(
            F.sum("vol") > 0,
            F.round(
                F.sum(F.col("price_c") * F.col("vol")).cast("double")
                / F.sum("vol")
                / 100.0,
                9,
            ),
        ).alias("vwap"),
        F.count(F.lit(1)).cast("bigint").alias("n_trades"),
    )


@register(
    "ts_paa_sax",
    oracle="""
    WITH paa AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts) / 21600) AS BIGINT) AS bucket,
               ROUND(CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT))
                          AS DOUBLE) / COUNT(*) / 100.0, 9) AS paa
        FROM events GROUP BY 1, 2
    ),
    breaks AS (
        SELECT QUANTILE_CONT(paa, 0.25) AS b1,
               QUANTILE_CONT(paa, 0.50) AS b2,
               QUANTILE_CONT(paa, 0.75) AS b3
        FROM paa
    )
    SELECT event_type, bucket, paa,
           CASE WHEN paa <= b1 THEN 'a' WHEN paa <= b2 THEN 'b'
                WHEN paa <= b3 THEN 'c' ELSE 'd' END AS sax_symbol
    FROM paa, breaks
    """,
)
def ts_paa_sax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piecewise Aggregate Approximation + SAX symbolization (Lin et al.
    2003): 6-hour segment means, then each segment mapped to a 4-letter
    alphabet at the corpus quartiles — the discretization behind symbolic
    motif/novelty mining on massive series. Segment means are exact
    (integer cents summed, one division, round 9); the three breakpoints
    broadcast, so symbolization is map-side — same no-global-sort shape
    as curriculum_difficulty_order. The bucketed aggregate is the only
    shuffle."""
    e = load_table(spark, sf_dir, "events")
    paa = (
        e.select(
            "event_type",
            F.floor(F.unix_seconds(F.col("ts").cast("timestamp")) / 21600)
            .cast("bigint")
            .alias("bucket"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("vc"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.round(
                F.sum("vc").cast("double") / F.count(F.lit(1)) / 100.0, 9
            ).alias("paa")
        )
    )
    breaks = paa.agg(
        F.expr("PERCENTILE(paa, 0.25)").alias("b1"),
        F.expr("PERCENTILE(paa, 0.50)").alias("b2"),
        F.expr("PERCENTILE(paa, 0.75)").alias("b3"),
    )
    return paa.crossJoin(F.broadcast(breaks)).select(
        "event_type",
        "bucket",
        "paa",
        F.when(F.col("paa") <= F.col("b1"), "a")
        .when(F.col("paa") <= F.col("b2"), "b")
        .when(F.col("paa") <= F.col("b3"), "c")
        .otherwise("d")
        .alias("sax_symbol"),
    )


@register(
    "ts_gap_percentiles",
    oracle="""
    WITH ordered AS (
        SELECT event_type, user_id,
               epoch_us(ts) - lag(epoch_us(ts)) OVER (
                   PARTITION BY event_type, user_id
                   ORDER BY ts, event_id) AS gap_us
        FROM events
    ),
    gaps AS (
        SELECT event_type, CAST(gap_us AS BIGINT) AS gap_us
        FROM ordered WHERE gap_us IS NOT NULL
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(QUANTILE_CONT(gap_us, 0.50) / 1000000.0, 9) AS p50_sec,
           ROUND(QUANTILE_CONT(gap_us, 0.90) / 1000000.0, 9) AS p90_sec,
           ROUND(QUANTILE_CONT(gap_us, 0.99) / 1000000.0, 9) AS p99_sec,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM gaps GROUP BY event_type
    """,
)
def ts_gap_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival gap percentiles per event type, computed over each
    USER's gap stream — the cadence profile behind session-timeout and
    watermark tuning (p99 inter-arrival IS the empirically right
    watermark delay; see stream_watermark_advisor for the streaming
    twin). The lag window partitions on (event_type, user_id) — fine-
    grained keys that scale, never a per-type global sort; gaps are exact
    integer microseconds and both engines interpolate percentiles
    identically. One window shuffle + one |types|-row aggregate."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = (
        e.select(
            "event_type",
            (us - F.lag(us).over(w)).cast("bigint").alias("gap_us"),
        )
        .filter(F.col("gap_us").isNotNull())
    )
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.round(F.expr("PERCENTILE(gap_us, 0.50)") / 1000000.0, 9).alias(
            "p50_sec"
        ),
        F.round(F.expr("PERCENTILE(gap_us, 0.90)") / 1000000.0, 9).alias(
            "p90_sec"
        ),
        F.round(F.expr("PERCENTILE(gap_us, 0.99)") / 1000000.0, 9).alias(
            "p99_sec"
        ),
        F.max("gap_us").cast("bigint").alias("max_gap_us"),
    )


@register(
    "ts_ljung_box",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ),
    lagged AS (
        SELECT event_type, x,
               LAG(x, 1) OVER w AS x1,
               LAG(x, 2) OVER w AS x2,
               LAG(x, 3) OVER w AS x3,
               ROW_NUMBER() OVER w AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY h)
    ),
    agg AS (
        SELECT event_type,
               CAST(MIN(n) AS BIGINT) AS n,
               CAST(SUM(x) AS BIGINT) AS s1,
               CAST(SUM(x * x) AS DECIMAL(38,0)) AS s2,
               CAST(SUM(x * x1) AS DECIMAL(38,0)) AS sk1,
               CAST(SUM(x * x2) AS DECIMAL(38,0)) AS sk2,
               CAST(SUM(x * x3) AS DECIMAL(38,0)) AS sk3,
               CAST(SUM(CASE WHEN rk <= n - 1 THEN x ELSE 0 END) AS BIGINT) AS h1,
               CAST(SUM(CASE WHEN rk <= n - 2 THEN x ELSE 0 END) AS BIGINT) AS h2,
               CAST(SUM(CASE WHEN rk <= n - 3 THEN x ELSE 0 END) AS BIGINT) AS h3,
               CAST(SUM(CASE WHEN rk > 1 THEN x ELSE 0 END) AS BIGINT) AS t1,
               CAST(SUM(CASE WHEN rk > 2 THEN x ELSE 0 END) AS BIGINT) AS t2,
               CAST(SUM(CASE WHEN rk > 3 THEN x ELSE 0 END) AS BIGINT) AS t3
        FROM lagged GROUP BY event_type
    ),
    rho AS (
        SELECT event_type, n,
            (CAST(sk1 AS DOUBLE) - (CAST(s1 AS DOUBLE) / n) * (h1 + t1)
                 + (n - 1) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
              / (CAST(s2 AS DOUBLE) - n * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS r1,
            (CAST(sk2 AS DOUBLE) - (CAST(s1 AS DOUBLE) / n) * (h2 + t2)
                 + (n - 2) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
              / (CAST(s2 AS DOUBLE) - n * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS r2,
            (CAST(sk3 AS DOUBLE) - (CAST(s1 AS DOUBLE) / n) * (h3 + t3)
                 + (n - 3) * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n))
              / (CAST(s2 AS DOUBLE) - n * (CAST(s1 AS DOUBLE) / n) * (CAST(s1 AS DOUBLE) / n)) AS r3
        FROM agg
    )
    SELECT event_type, n AS n_hours,
           ROUND(r1, 9) AS acf_1, ROUND(r2, 9) AS acf_2, ROUND(r3, 9) AS acf_3,
           ROUND(n * (n + 2.0) * (r1 * r1 / (n - 1) + r2 * r2 / (n - 2)
                                  + r3 * r3 / (n - 3)), 9) AS q_stat,
           n * (n + 2.0) * (r1 * r1 / (n - 1) + r2 * r2 / (n - 2)
                            + r3 * r3 / (n - 3)) > 11.345 AS white_noise_rejected
    FROM rho
    """,
)
def ts_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box portmanteau test (lags 1-3) on each type's hourly-total
    series: Q = n(n+2) sum(rho_k^2/(n-k)), rejected at chi2(3, 0.99) =
    11.345 — the is-there-anything-left-to-model gate run on forecast
    residuals. Reuses ts_autocorrelation's exact-integer machinery (all
    sums from ONE lag pass over the hourly aggregate; the only floats are
    the shared mean-centering expansion, evaluated identically by both
    engines, then Q as arithmetic over those identical doubles). Two
    shuffles total: the hourly rollup, then the (type,)-keyed lag window
    + final group sharing one partitioning."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            "event_type",
            (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(3600000000))
            .cast("bigint")
            .alias("h"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("vc"),
        )
        .groupBy("event_type", "h")
        .agg(F.sum("vc").cast("bigint").alias("x"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    wn = Window.partitionBy("event_type")
    lagged = hourly.select(
        "event_type",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 2).over(w).alias("x2"),
        F.lag("x", 3).over(w).alias("x3"),
        F.row_number().over(w).alias("rk"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    def head(k):
        return F.sum(
            F.when(F.col("rk") <= F.col("n") - k, F.col("x")).otherwise(0)
        ).cast("bigint")

    def tail(k):
        return F.sum(
            F.when(F.col("rk") > k, F.col("x")).otherwise(0)
        ).cast("bigint")

    agg = lagged.groupBy("event_type").agg(
        F.min("n").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("s1"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("s2"),
        F.sum(F.col("x") * F.col("x1")).cast("decimal(38,0)").alias("sk1"),
        F.sum(F.col("x") * F.col("x2")).cast("decimal(38,0)").alias("sk2"),
        F.sum(F.col("x") * F.col("x3")).cast("decimal(38,0)").alias("sk3"),
        head(1).alias("h1"), head(2).alias("h2"), head(3).alias("h3"),
        tail(1).alias("t1"), tail(2).alias("t2"), tail(3).alias("t3"),
    )
    n = F.col("n")
    mu = F.col("s1").cast("double") / n
    den = F.col("s2").cast("double") - n * mu * mu

    def rho(k):
        sk = F.col(f"sk{k}").cast("double")
        hk = F.col(f"h{k}")
        tk = F.col(f"t{k}")
        return (sk - mu * (hk + tk) + (n - k) * mu * mu) / den

    r1, r2, r3 = rho(1), rho(2), rho(3)
    q = n * (n + F.lit(2.0)) * (
        r1 * r1 / (n - 1) + r2 * r2 / (n - 2) + r3 * r3 / (n - 3)
    )
    return agg.select(
        "event_type",
        n.alias("n_hours"),
        F.round(r1, 9).alias("acf_1"),
        F.round(r2, 9).alias("acf_2"),
        F.round(r3, 9).alias("acf_3"),
        F.round(q, 9).alias("q_stat"),
        (q > 11.345).alias("white_noise_rejected"),
    )


@register(
    "ts_wow_growth",
    oracle="""
    WITH weekly AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 604800000000 AS BIGINT) AS week,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS total_c,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM events GROUP BY 1, 2
    )
    SELECT event_type, week, total_c, n_events,
           CASE WHEN LAG(total_c) OVER w IS NULL
                     OR LAG(total_c) OVER w = 0 THEN NULL
                ELSE ROUND(100.0 * (total_c - LAG(total_c) OVER w)
                           / LAG(total_c) OVER w, 9) END AS growth_pct
    FROM weekly
    WINDOW w AS (PARTITION BY event_type ORDER BY week)
    """,
)
def ts_wow_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type: weekly integer-cent totals,
    then the lag-ratio as a percentage — the first chart on any growth
    dashboard. Totals are exact integers; the growth division is the one
    shared float, NULL-guarded for missing/zero baselines. The weekly
    rollup shrinks the data to |types| x |weeks| rows BEFORE the lag
    window, so the window input is tiny at any raw-data scale — the
    aggregate-then-window order is the whole 100 TB design."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    weekly = (
        e.select(
            "event_type",
            (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(604800000000))
            .cast("bigint")
            .alias("week"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("vc"),
        )
        .groupBy("event_type", "week")
        .agg(
            F.sum("vc").cast("bigint").alias("total_c"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("total_c").over(w)
    return weekly.select(
        "event_type",
        "week",
        "total_c",
        "n_events",
        F.when(
            prev.isNull() | (prev == 0), F.lit(None).cast("double")
        )
        .otherwise(
            F.round(100.0 * (F.col("total_c") - prev) / prev, 9)
        )
        .alias("growth_pct"),
    )


@register(
    "ts_bollinger_bands",
    oracle="""
    WITH hourly AS (
        SELECT event_type,
               CAST(epoch_us(ts) // 3600000000 AS BIGINT) AS h,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ),
    frames AS (
        SELECT event_type, h, x,
               CAST(SUM(x) OVER w AS BIGINT) AS fs,
               CAST(SUM(x * x) OVER w AS DECIMAL(38,0)) AS fss,
               CAST(COUNT(*) OVER w AS BIGINT) AS fn
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, h,
           ROUND(CAST(fs AS DOUBLE) / fn / 100.0, 9) AS sma24,
           ROUND((CAST(fs AS DOUBLE) / fn
                  + 2 * SQRT((CAST(fss AS DOUBLE) - CAST(fs AS DOUBLE) * fs / fn)
                             / fn)) / 100.0, 9) AS upper_band,
           ROUND((CAST(fs AS DOUBLE) / fn
                  - 2 * SQRT((CAST(fss AS DOUBLE) - CAST(fs AS DOUBLE) * fs / fn)
                             / fn)) / 100.0, 9) AS lower_band,
           x > CAST(fs AS DOUBLE) / fn
                + 2 * SQRT((CAST(fss AS DOUBLE) - CAST(fs AS DOUBLE) * fs / fn)
                           / fn) AS breakout_above
    FROM frames WHERE fn = 24
    """,
)
def ts_bollinger_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands on the hourly-total series: 24-hour simple moving
    average +/- 2 population standard deviations, plus the breakout flag —
    the volatility envelope behind mean-reversion alerting. The rolling
    frame carries exact integer sums (x and x^2); the band math is the
    shared float expansion over those identical integers, so both engines
    emit bit-identical doubles. Frames shorter than 24 are dropped (the
    warm-up). One shuffle: hourly rollup, frame window, and filter all
    share the (event_type,) hash layout after the tiny rollup."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.select(
            "event_type",
            (F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(3600000000))
            .cast("bigint")
            .alias("h"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("vc"),
        )
        .groupBy("event_type", "h")
        .agg(F.sum("vc").cast("bigint").alias("x"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-23, Window.currentRow)
    )
    frames = hourly.select(
        "event_type",
        "h",
        "x",
        F.sum("x").over(w).cast("bigint").alias("fs"),
        F.sum(F.col("x") * F.col("x")).over(w).cast("decimal(38,0)").alias("fss"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("fn"),
    )
    mean = F.col("fs").cast("double") / F.col("fn")
    sd = F.sqrt(
        (F.col("fss").cast("double") - F.col("fs").cast("double") * F.col("fs") / F.col("fn"))
        / F.col("fn")
    )
    return frames.filter(F.col("fn") == 24).select(
        "event_type",
        "h",
        F.round(mean / 100.0, 9).alias("sma24"),
        F.round((mean + 2 * sd) / 100.0, 9).alias("upper_band"),
        F.round((mean - 2 * sd) / 100.0, 9).alias("lower_band"),
        (F.col("x") > mean + 2 * sd).alias("breakout_above"),
    )


# Round-at-9 exemption (registry.ROUND9_EXEMPT): the CUSUM deviation grows
# with series length (~2.5e3 at sf0.01), past the magnitude where Spark
# and DuckDB ROUND agree — kept raw; its protection is the single exact
# DECIMAL |n*S_k - k*S_n| with ONE shared final float division.
exempt_round9("ts_cusum_changepoint", {
    "max_cusum_dev": "cumulative deviation grows with series length",
})


@register(
    "ts_theil_sen_slope",
    oracle="""
    WITH daily AS (
        SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS cents
        FROM events GROUP BY 1, 2
    ),
    nd AS (
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
        FROM daily GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type,
               CAST(b.cents - a.cents AS DOUBLE)
                 / date_diff('day', a.day, b.day) AS slope,
               a.day AS d1, b.day AS d2
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.day < b.day
    ),
    ranked AS (
        SELECT event_type, slope,
               ROW_NUMBER() OVER (
                   PARTITION BY event_type ORDER BY slope, d1, d2
               ) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
        FROM pairs
    ),
    med AS (
        SELECT event_type, CAST(MIN(n_pairs) AS BIGINT) AS n_pairs,
               MIN(slope) AS lo, MAX(slope) AS hi
        FROM ranked
        WHERE rn = FLOOR((n_pairs + 1) / 2.0)
           OR rn = FLOOR((n_pairs + 2) / 2.0)
        GROUP BY event_type
    )
    SELECT m.event_type, n.n_days, m.n_pairs,
           (ROUND(((lo + hi) / 2.0) * 1e9) / 1e9 + 0.0) AS theil_sen_slope
    FROM med m JOIN nd n ON m.event_type = n.event_type
    """,
)
def ts_theil_sen_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen trend slope of each event type's daily value series — the
    ROBUST member of the trend family next to ts_trend_slope_by_type's
    OLS: the median of all pairwise slopes has a 29% breakdown point, so
    a single corrupted day cannot move it (the estimator monitoring
    pipelines prefer when spikes are expected). Daily totals are exact
    integer cents, each pairwise slope is one exact float division of
    exact integers, and the median is picked positionally (two-middle
    rule via ROW_NUMBER under a total order — no interpolation, no
    engine quantile): MIN+MAX of the <= 2 picked rows averages them
    without an order-dependent float sum. Scale: the pair join is
    equi-keyed per series and quadratic only in DISTINCT DAYS (bounded by
    the observation span, never data volume — 10 years is ~6.6M pairs
    per series); the rank window partitions by series."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("cents")
    ).localCheckpoint(eager=False)  # |series x days| rows; self-join + count read it
    nd = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days")
    )
    a, b = daily.alias("a"), daily.alias("b")
    pairs = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.day") < F.col("b.day")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.cents") - F.col("a.cents")).cast("double")
            / F.datediff(F.col("b.day"), F.col("a.day"))
        ).alias("slope"),
        F.col("a.day").alias("d1"),
        F.col("b.day").alias("d2"),
    )
    w = Window.partitionBy("event_type").orderBy("slope", "d1", "d2")
    ranked = pairs.select(
        "event_type",
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1))
        .over(Window.partitionBy("event_type"))
        .alias("n_pairs"),
    )
    med = (
        ranked.filter(
            (F.col("rn") == F.floor((F.col("n_pairs") + 1) / F.lit(2.0)))
            | (F.col("rn") == F.floor((F.col("n_pairs") + 2) / F.lit(2.0)))
        )
        .groupBy("event_type")
        .agg(
            F.min("n_pairs").cast("bigint").alias("n_pairs"),
            F.min("slope").alias("lo"),
            F.max("slope").alias("hi"),
        )
    )
    return med.join(nd, "event_type").selectExpr(
        "event_type",
        "n_days",
        "n_pairs",
        "(ROUND(((lo + hi) / 2.0) * 1e9) / 1e9 + 0.0) AS theil_sen_slope",
    )


# Rescaled-range fragments shared by both engines. All chunk arithmetic is
# exact BIGINT: with per-hour cents < ~2e9 and chunk length <= 64, every
# intermediate (w*S_j, j*Tc, w*SS, Tc^2) stays far below 2^63 through
# sf10+ (the statistics-module bounded-integer invariant); the only float
# ops are the per-chunk R/S division (IEEE-exact inputs) and the final
# log-log slope on 4 aggregate rows.
_RS_SLOPE = (
    "(n_sizes * sxy - sx * sy) / (n_sizes * sxx - sx * sx)"
)


@register(
    "ts_hurst_rs",
    oracle=f"""
    WITH hourly AS (
        SELECT date_trunc('hour', ts) AS h,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY 1
    ),
    idxd AS (
        SELECT x,
               CAST(x AS DECIMAL(19,0)) * CAST(x AS DECIMAL(19,0)) AS xx,
               CAST(ROW_NUMBER() OVER (ORDER BY h) AS BIGINT) AS idx,
               CAST(COUNT(*) OVER () AS BIGINT) AS t_hours
        FROM hourly
    ),
    expanded AS (
        SELECT i.x, i.xx, i.idx, i.t_hours, CAST(w.w AS BIGINT) AS w,
               (i.idx - 1) // w.w AS chunk,
               (i.idx - 1) % w.w + 1 AS j
        FROM idxd i, (SELECT UNNEST([8, 16, 32, 64]) AS w) w
        WHERE i.idx <= w.w * (i.t_hours // w.w)
    ),
    cum AS (
        SELECT w, chunk, j, x, xx, t_hours,
               SUM(x) OVER (
                   PARTITION BY w, chunk ORDER BY j
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS s_j,
               SUM(x) OVER (PARTITION BY w, chunk) AS tc
        FROM expanded
    ),
    chunks AS (
        SELECT w, chunk,
               CAST(MAX(w * s_j - j * tc) - MIN(w * s_j - j * tc) AS BIGINT)
                 AS r_int,
               CAST(SUM(xx) AS DECIMAL(28,0)) AS ss,
               CAST(MIN(tc) AS BIGINT) AS tc,
               CAST(MIN(t_hours) AS BIGINT) AS t_hours
        FROM cum GROUP BY w, chunk
    ),
    per_w AS (
        SELECT w, CAST(MIN(t_hours) AS BIGINT) AS t_hours,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(SUM(CAST(ROUND(
                   CAST(r_int AS DOUBLE)
                   / SQRT(CAST(CAST(w AS DECIMAL(6,0)) * ss
                          - CAST(tc AS DECIMAL(17,0))
                            * CAST(tc AS DECIMAL(17,0)) AS DOUBLE)), 6)
                 AS DECIMAL(16,6))) AS DOUBLE) / COUNT(*) AS mean_rs
        FROM chunks GROUP BY w
    ),
    terms AS (
        SELECT w, t_hours, mean_rs,
               CAST(ROUND(LN(CAST(w AS DOUBLE)), 6) AS DECIMAL(12,6)) AS lx,
               CAST(ROUND(LN(mean_rs), 6) AS DECIMAL(12,6)) AS ly,
               CAST(ROUND(LN(CAST(w AS DOUBLE)) * LN(CAST(w AS DOUBLE)), 6)
                 AS DECIMAL(12,6)) AS lxx,
               CAST(ROUND(LN(CAST(w AS DOUBLE)) * LN(mean_rs), 6)
                 AS DECIMAL(12,6)) AS lxy
        FROM per_w
    ),
    slope AS (
        SELECT CAST(COUNT(*) AS DOUBLE) AS n_sizes,
               CAST(SUM(lx) AS DOUBLE) AS sx, CAST(SUM(ly) AS DOUBLE) AS sy,
               CAST(SUM(lxx) AS DOUBLE) AS sxx,
               CAST(SUM(lxy) AS DOUBLE) AS sxy,
               CAST(MIN(t_hours) AS BIGINT) AS n_hours
        FROM terms
    ),
    pivoted AS (
        SELECT
            (ROUND(MIN(CASE WHEN w = 8 THEN mean_rs END) * 1e9) / 1e9 + 0.0)
              AS rs_w8,
            (ROUND(MIN(CASE WHEN w = 16 THEN mean_rs END) * 1e9) / 1e9 + 0.0)
              AS rs_w16,
            (ROUND(MIN(CASE WHEN w = 32 THEN mean_rs END) * 1e9) / 1e9 + 0.0)
              AS rs_w32,
            (ROUND(MIN(CASE WHEN w = 64 THEN mean_rs END) * 1e9) / 1e9 + 0.0)
              AS rs_w64
        FROM per_w
    )
    SELECT s.n_hours, p.rs_w8, p.rs_w16, p.rs_w32, p.rs_w64,
           (ROUND(({_RS_SLOPE}) * 1e9) / 1e9 + 0.0) AS hurst_exponent
    FROM slope s, pivoted p
    """,
)
def ts_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hurst exponent of the hourly event-value series by classic rescaled-
    range (R/S) analysis — the long-memory diagnostic (H > 0.5 trending /
    persistent, < 0.5 mean-reverting) a forecasting pipeline checks before
    trusting ARIMA-class models. For window sizes w in {{8,16,32,64}} the
    series splits into full w-hour chunks; within each chunk the range of
    cumulative mean deviations is computed SCALED BY w so it stays exact
    integer (w*S_j - j*Tc, BIGINT-safe to ~1e12 cents/hour), the stddev
    denominator likewise exact in DECIMAL (w*SS - Tc^2 leaves BIGINT once
    hourly sums pass ~1e8 cents — found by the 100x smoke),
    and R/S is one float division of exact integers. Per-size means are
    round-at-6 DECIMAL sums; H is the closed-form OLS slope of ln(R/S) on
    ln(w) over 4 points whose products are rounded-then-DECIMAL-summed
    (order-insensitive). Scale: the hourly rollup is one map-side-
    combinable shuffle; the global hour index uses the DISTRIBUTED exact
    row number (never a single-task window over the series); everything
    after runs on |hours| x 4 rows, bounded by the observation span."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
        .cast("bigint")
        .alias("x")
    )
    from chainhouse_spark.operators.ranking import global_row_number

    idxd = global_row_number(hourly, [F.asc("h")], "idx").withColumn(
        # DECIMAL squares: at the sf10 smoke the hourly sum reaches ~1e8
        # cents, so x*x (and downstream w*SS, Tc^2) overflow ANSI BIGINT —
        # caught live by the 100x smoke (ARITHMETIC_OVERFLOW in stage 13).
        # DECIMAL(19)^2 -> (38,0) holds hourly sums to ~1e12 cents.
        "xx",
        F.col("x").cast("decimal(19,0)") * F.col("x").cast("decimal(19,0)"),
    )
    t_hours = idxd.agg(F.count(F.lit(1)).cast("bigint").alias("t_hours"))
    expanded = (
        idxd.crossJoin(F.broadcast(t_hours))
        .select(
            "x",
            "xx",
            "idx",
            "t_hours",
            F.explode(
                F.array(F.lit(8), F.lit(16), F.lit(32), F.lit(64))
            ).alias("w0"),
        )
        .withColumn("w", F.col("w0").cast("bigint"))
        .drop("w0")
        .filter(
            F.col("idx")
            <= F.col("w") * F.floor(F.col("t_hours") / F.col("w"))
        )
        .withColumn("chunk", F.floor((F.col("idx") - 1) / F.col("w")))
        .withColumn("j", (F.col("idx") - 1) % F.col("w") + 1)
    )
    wcum = (
        Window.partitionBy("w", "chunk")
        .orderBy("j")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wfull = Window.partitionBy("w", "chunk")
    cum = expanded.select(
        "w",
        "chunk",
        "j",
        "xx",
        "t_hours",
        F.sum("x").over(wcum).alias("s_j"),
        F.sum("x").over(wfull).alias("tc"),
    )
    chunks = cum.groupBy("w", "chunk").agg(
        (
            F.max(F.col("w") * F.col("s_j") - F.col("j") * F.col("tc"))
            - F.min(F.col("w") * F.col("s_j") - F.col("j") * F.col("tc"))
        )
        .cast("bigint")
        .alias("r_int"),
        F.sum("xx").cast("decimal(28,0)").alias("ss"),
        F.min("tc").cast("bigint").alias("tc"),
        F.min("t_hours").cast("bigint").alias("t_hours"),
    )
    per_w = (
        chunks.groupBy("w")
        .agg(
            F.min("t_hours").cast("bigint").alias("t_hours"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.expr(
                "CAST(SUM(CAST(ROUND(CAST(r_int AS DOUBLE)"
                " / SQRT(CAST(CAST(w AS DECIMAL(6,0)) * ss"
                " - CAST(tc AS DECIMAL(17,0))"
                " * CAST(tc AS DECIMAL(17,0)) AS DOUBLE)), 6)"
                " AS DECIMAL(16,6))) AS DOUBLE) / COUNT(*)"
            ).alias("mean_rs"),
        )
        # 4 rows; feeds both the pivot and the slope aggregate
        .localCheckpoint(eager=False)
    )
    terms = per_w.selectExpr(
        "t_hours",
        "CAST(ROUND(LN(CAST(w AS DOUBLE)), 6) AS DECIMAL(12,6)) AS lx",
        "CAST(ROUND(LN(mean_rs), 6) AS DECIMAL(12,6)) AS ly",
        "CAST(ROUND(LN(CAST(w AS DOUBLE)) * LN(CAST(w AS DOUBLE)), 6)"
        " AS DECIMAL(12,6)) AS lxx",
        "CAST(ROUND(LN(CAST(w AS DOUBLE)) * LN(mean_rs), 6)"
        " AS DECIMAL(12,6)) AS lxy",
    )
    slope = terms.agg(
        F.count(F.lit(1)).cast("double").alias("n_sizes"),
        F.expr("CAST(SUM(lx) AS DOUBLE)").alias("sx"),
        F.expr("CAST(SUM(ly) AS DOUBLE)").alias("sy"),
        F.expr("CAST(SUM(lxx) AS DOUBLE)").alias("sxx"),
        F.expr("CAST(SUM(lxy) AS DOUBLE)").alias("sxy"),
        F.min("t_hours").cast("bigint").alias("n_hours"),
    )
    pivoted = per_w.agg(
        *[
            F.expr(
                f"(ROUND(MIN(CASE WHEN w = {wv} THEN mean_rs END) * 1e9)"
                f" / 1e9 + 0.0) AS rs_w{wv}"
            )
            for wv in (8, 16, 32, 64)
        ]
    )
    return slope.crossJoin(pivoted).selectExpr(
        "n_hours",
        "rs_w8",
        "rs_w16",
        "rs_w32",
        "rs_w64",
        f"(ROUND(({_RS_SLOPE}) * 1e9) / 1e9 + 0.0) AS hurst_exponent",
    )
