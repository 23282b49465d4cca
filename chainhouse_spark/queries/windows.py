"""Window function coverage — SURVEY.md §2.6 "Window functions" surface.

Ranking (row_number/rank/dense_rank/ntile), offsets (lag/lead), running
and sliding frames (ROWS BETWEEN), and first/last value. Every ordering
includes a unique tie-break column so results are deterministic across
engines.

Scale notes: each window shuffles once on its partition key; the partition
keys here (customer, user, returnflag) are high-cardinality enough that no
single partition dominates. A global (un-partitioned) window is avoided —
it would serialize through one task at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chainhouse_spark.functions.rounding import round9
from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table


@register(
    "window_topn_per_group",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice, rn
    FROM (
        SELECT o_custkey AS c_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (
                   PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey
               ) AS rn
        FROM orders
    )
    WHERE rn <= 3
    """,
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer — the canonical de-duplicating rank filter."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("o_custkey").alias("c_custkey"), "o_orderkey", "o_totalprice", "rn"
        )
    )


@register(
    "window_rank_dense_ntile",
    oracle="""
    SELECT o_orderkey,
           o_orderstatus,
           RANK()       OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS rnk,
           DENSE_RANK() OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS drnk,
           NTILE(4)     OVER (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC, o_orderkey) AS quartile
    FROM orders
    """,
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "window_lag_lead",
    oracle="""
    SELECT user_id, event_id, event_type,
           LAG(event_type)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type,
           CAST(date_diff('second',
                LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                ts) AS BIGINT) AS secs_since_prev
    FROM events
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization primitive: previous/next event and inter-event gap."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        "event_id",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("event_type").over(w).alias("next_type"),
        (
            F.unix_seconds(F.col("ts").cast("timestamp"))
            - F.lag(F.unix_seconds(F.col("ts").cast("timestamp"))).over(w)
        ).alias("secs_since_prev"),
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT user_id, event_id, ts,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value,
           COUNT(*) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS running_n
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative per-user value; decimal accumulator keeps it order-exact."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return e.select(
        "user_id",
        "event_id",
        "ts",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


@register(
    "window_sliding_frame",
    oracle="""
    SELECT user_id, event_id,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS sum_last3
    FROM events
    """,
)
def window_sliding_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return e.select(
        "user_id",
        "event_id",
        F.sum(F.col("value").cast("decimal(18,6)")).over(w).cast("double").alias("sum_last3"),
    )


@register(
    "window_first_last",
    oracle="""
    SELECT DISTINCT user_id,
           FIRST_VALUE(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS first_type,
           LAST_VALUE(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS last_type
    FROM events
    """,
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First/last event type per user over the full partition frame."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        F.first("event_type").over(w).alias("first_type"),
        F.last("event_type").over(w).alias("last_type"),
    ).distinct()


@register(
    "window_range_interval_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rolling_30d_spend,
           CAST(COUNT(*) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS rolling_30d_orders
    FROM orders
    WHERE o_custkey < 200
    """,
)
def window_range_interval_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame over event time: per-customer 30-day rolling
    spend. RANGE (unlike ROWS) includes all timestamp peers, so the result
    is deterministic under ties; the frame is expressed in SQL because the
    DataFrame rangeBetween API is long-typed while interval frames belong to
    the SQL dialect shared with the oracle."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") < 200)
    o.createOrReplaceTempView("_w_orders")
    return spark.sql("""
        SELECT o_orderkey, o_custkey, o_orderdate,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS rolling_30d_spend,
               CAST(COUNT(*) OVER (
                   PARTITION BY o_custkey ORDER BY o_orderdate
                   RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS rolling_30d_orders
        FROM _w_orders
    """)


@register(
    "window_rank_fractions",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           (ROUND((percent_rank() OVER w) * 1e9) / 1e9 + 0.0) AS pct_rank,
           (ROUND((cume_dist() OVER w) * 1e9) / 1e9 + 0.0) AS cume,
           nth_value(o_orderkey, 3) OVER w AS third_key
    FROM orders
    WHERE o_orderkey < 2000
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_rank_fractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fractional rank functions: percent_rank, cume_dist, nth_value. The
    ratios are single float divisions of counts — deterministic; the unique
    (o_totalprice, o_orderkey) order key makes every rank reproducible."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 2000)
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        round9(F.percent_rank().over(w)).alias("pct_rank"),
        round9(F.cume_dist().over(w)).alias("cume"),
        F.nth_value("o_orderkey", 3).over(w).alias("third_key"),
    )


@register(
    "window_ignore_nulls",
    oracle="""
    SELECT o_orderkey,
           last_value(CASE WHEN o_orderstatus = 'F' THEN o_orderkey END IGNORE NULLS)
             OVER (ORDER BY o_orderkey ROWS UNBOUNDED PRECEDING) AS last_finalized_key
    FROM orders
    WHERE o_orderkey < 500
    """,
)
def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IGNORE NULLS window semantics: carry the most recent finalized order
    key forward across non-finalized rows — the last-observation-carried-
    forward (LOCF) pattern gap-filling pipelines rely on."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    w = Window.orderBy("o_orderkey").rowsBetween(Window.unboundedPreceding, 0)
    return o.select(
        "o_orderkey",
        F.last(
            F.when(F.col("o_orderstatus") == "F", F.col("o_orderkey")),
            ignorenulls=True,
        ).over(w).alias("last_finalized_key"),
    )


@register(
    "window_cumulative_distinct_users",
    oracle="""
    WITH first_seen AS (
        SELECT user_id,
               CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS first_week
        FROM events GROUP BY user_id
    ),
    weekly AS (
        SELECT first_week, COUNT(*) AS new_users
        FROM first_seen GROUP BY first_week
    )
    SELECT first_week AS week,
           new_users,
           CAST(SUM(new_users) OVER (ORDER BY first_week
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS total_distinct_users
    FROM weekly
    """,
)
def window_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running DISTINCT count — the window SQL can't express directly
    (COUNT(DISTINCT) OVER is unsupported in both engines). The scalable
    rewrite: distinct collapses to each key's FIRST occurrence (one
    aggregate), then a cumulative sum of first-occurrences-per-bucket. The
    expensive distinct shuffles once on user_id; the running sum runs over
    |weeks| rows, not |events|."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("first_week")
    )
    weekly = first_seen.groupBy("first_week").agg(F.count(F.lit(1)).alias("new_users"))
    return weekly.select(
        F.col("first_week").alias("week"),
        "new_users",
        F.sum("new_users")
        .over(Window.orderBy("first_week").rowsBetween(Window.unboundedPreceding, 0))
        .alias("total_distinct_users"),
    )


@register(
    "window_rolling_corr",
    oracle="""
    WITH pts AS (
        SELECT event_type,
               CAST(FLOOR(epoch(ts)) AS BIGINT) AS t,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS y,
               event_id
        FROM events
    ),
    lagged AS (
        SELECT event_type, t, event_id, y,
               LAG(y) OVER (PARTITION BY event_type ORDER BY t, event_id) AS x
        FROM pts
    ),
    roll AS (
        SELECT event_type, t, event_id,
               COUNT(*)    OVER w AS n,
               SUM(x)      OVER w AS sx,
               SUM(y)      OVER w AS sy,
               SUM(x * x)  OVER w AS sxx,
               SUM(y * y)  OVER w AS syy,
               SUM(x * y)  OVER w AS sxy
        FROM lagged WHERE x IS NOT NULL
        WINDOW w AS (PARTITION BY event_type ORDER BY t, event_id
                     ROWS BETWEEN 29 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, t, event_id,
           CAST(n AS BIGINT) AS n_window,
           (ROUND(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                     - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             ) * 1e9) / 1e9 + 0.0) AS rolling_corr
    FROM roll WHERE n = 30
    """,
)
def window_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """30-observation rolling autocorrelation (value vs previous value) per
    signal — the moments pattern lifted into a sliding ROWS frame. The six
    frame sums are exact integers (cents), so frame evaluation order is
    irrelevant; the Pearson formula runs once per row on those sums. At
    100 TB this is one shuffle on the series key; the frame never
    materializes more than 30 rows of state per partition."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    pts = e.select(
        "event_type",
        F.unix_seconds(F.col("ts").cast("timestamp")).alias("t"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("y"),
        "event_id",
    )
    ws = Window.partitionBy("event_type").orderBy("t", "event_id")
    lagged = pts.select(
        "event_type", "t", "event_id", "y", F.lag("y").over(ws).alias("x")
    ).filter(F.col("x").isNotNull())
    wf = ws.rowsBetween(-29, Window.currentRow)
    roll = lagged.select(
        "event_type",
        "t",
        "event_id",
        F.count(F.lit(1)).over(wf).alias("n"),
        F.sum("x").over(wf).alias("sx"),
        F.sum("y").over(wf).alias("sy"),
        F.sum(F.col("x") * F.col("x")).over(wf).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).over(wf).alias("syy"),
        F.sum(F.col("x") * F.col("y")).over(wf).alias("sxy"),
    ).filter(F.col("n") == 30)
    nD, sxD, syD, sxxD, syyD, sxyD = [
        F.col(c).cast("double") for c in ("n", "sx", "sy", "sxx", "syy", "sxy")
    ]
    corr = (nD * sxyD - sxD * syD) / (
        F.sqrt(nD * sxxD - sxD * sxD) * F.sqrt(nD * syyD - syD * syD)
    )
    return roll.select(
        "event_type",
        "t",
        "event_id",
        F.col("n").cast("bigint").alias("n_window"),
        round9(corr).alias("rolling_corr"),
    )


@register(
    "window_moving_median",
    oracle="""
    SELECT user_id, event_id,
           (ROUND((MEDIAN(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN 14 PRECEDING AND CURRENT ROW
           )) * 1e9) / 1e9 + 0.0) AS med15
    FROM events
    """,
)
def window_moving_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact moving median over a trailing 15-row frame per user (the
    robust-smoothing twin of the moving average).  Exact medians are
    order-insensitive within the frame, and the frame itself is pinned by
    the (ts, event_id) total order, so the result is engine-independent
    (even-sized frames average the two middle DOUBLEs — one float op, same
    on both engines).  Spark refuses aggregate ``median`` over a framed
    window, so the frame is materialized with ``collect_list`` (15 values
    max — constant state) and the middle is read off the sorted array.
    Scale: one shuffle on user_id; the frame bound keeps per-row state at
    15 values regardless of series length."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts"), F.col("event_id"))
        .rowsBetween(-14, Window.currentRow)
    )
    arr = F.array_sort(F.collect_list("value").over(w))
    n = F.size(arr)
    return e.select(
        "user_id",
        "event_id",
        F.when(
            n % 2 == 1,
            F.element_at(arr, ((n + F.lit(1)) / F.lit(2)).cast("int")),
        )
        .otherwise(
            (
                F.element_at(arr, (n / F.lit(2)).cast("int"))
                + F.element_at(arr, (n / F.lit(2)).cast("int") + 1)
            )
            / 2.0
        )
        .alias("med15"),
    ).withColumn("med15", round9("med15")
    )
