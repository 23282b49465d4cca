"""Audience-overlap analytics — the ClickHouse groupBitmap-family workload
(bitmapAndCardinality / bitmapOrCardinality over user-id bitmaps), expressed
Spark-first.

Exact path: no bitmaps needed — distinct (user, type) pairs self-join on the
user key, so the shuffle carries user ids once and the pair fan-out per user
is bounded by |event types| (tiny). Output is the |types|² overlap matrix:
the segment-intersection shape stays one user-keyed shuffle at any corpus
size, which IS the 100 TB plan (bitmap structures are a single-node
optimization; the distributed equivalent is key-partitioned set semantics).

Sketch path: per-type DataSketches HLL over user ids, pairwise union via the
hll_union scalar, intersection by inclusion-exclusion — the constant-size
precompute a 100 TB deployment stores per day/segment and merges at query
time without rescanning users. Engine-specific estimates follow the
invariant-twin oracle pattern (queries/sketches.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.queries.registry import exempt_round9, register
from chainhouse_spark.tables import load_table


@register(
    "audience_overlap_matrix",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    sz AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type),
    b AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type <= b.event_type
        GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both,
           sa.n AS n_a, sb.n AS n_b,
           sa.n + sb.n - n_both AS n_union,
           CAST(n_both AS DOUBLE) / (sa.n + sb.n - n_both) AS jaccard
    FROM b
    JOIN sz sa ON sa.event_type = b.type_a
    JOIN sz sb ON sb.event_type = b.type_b
    """,
)
def audience_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact audience overlap for every event-type pair: intersection,
    union, Jaccard.

    Plan shape (the 100 TB form): ONE user-keyed shuffle builds each
    user's sorted type set; every user then emits its ordered type pairs
    IN PLACE (fan-out bounded by |types|² per user, tiny) and the pair /
    size aggregates run on the |types|²-key space — no self-join, no
    second pass over events. Jaccard is one float division —
    deterministic across engines."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    # Lazy localCheckpoint, not .cache(): same materialize-once sharing
    # for the two aggregates below, but no CacheManager entry left behind
    # in a resident session (round-13).
    per_user = per_user.localCheckpoint(eager=False)
    both = (
        per_user.select(
            F.explode(
                F.expr(
                    "flatten(transform(types, (a, i) -> "
                    "transform(slice(types, i + 1, size(types)), "
                    "b -> struct(a AS type_a, b AS type_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.type_a", "p.type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sz = (
        per_user.select(F.explode("types").alias("event_type"))
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sa = sz.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sz.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        both.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            (F.col("n_a") + F.col("n_b") - F.col("n_both")).alias("n_union"),
            (
                F.col("n_both").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_both"))
            ).alias("jaccard"),
        )
    )


@register(
    "audience_overlap_hll",
    oracle="""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    b AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               COUNT(*) AS n_both
        FROM ut a JOIN ut b
          ON a.user_id = b.user_id AND a.event_type < b.event_type
        GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both, TRUE AS approx_ok FROM b
    """,
)
def audience_overlap_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-algebra overlap: one HLL per event type (the per-segment
    precompute), pairwise |A ∩ B| by inclusion-exclusion over hll_union —
    no user rescan. The estimate is engine-specific, so the oracled
    surface is the invariant twin: exact intersection (cross-checked) + a
    bool asserting the sketch estimate lands within 20% + 25 of exact
    (three ~1.6%-rsd estimates compound through inclusion-exclusion; the
    bound is several times the observed error).

    Sketches aggregate raw events directly — HLL dedups by construction,
    so no distinct pass; the exact intersection reuses the one-shuffle
    per-user pair expansion (see audience_overlap_matrix)."""
    e = load_table(spark, sf_dir, "events")
    sk = e.groupBy("event_type").agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    a = sk.select(F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a"))
    b = sk.select(F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b"))
    pairs = a.crossJoin(b).filter(F.col("type_a") < F.col("type_b"))
    est = pairs.select(
        "type_a",
        "type_b",
        (
            F.expr("hll_sketch_estimate(sk_a)")
            + F.expr("hll_sketch_estimate(sk_b)")
            - F.expr("hll_sketch_estimate(hll_union(sk_a, sk_b))")
        ).alias("approx_both"),
    )

    per_user = e.groupBy("user_id").agg(
        F.array_sort(F.collect_set("event_type")).alias("types")
    )
    exact = (
        per_user.select(
            F.explode(
                F.expr(
                    "flatten(transform(types, (a, i) -> "
                    "transform(slice(types, i + 2, size(types)), "
                    "b -> struct(a AS type_a, b AS type_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.type_a", "p.type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    return exact.join(
        F.broadcast(est), ["type_a", "type_b"]
    ).select(
        "type_a",
        "type_b",
        "n_both",
        (
            F.abs(F.col("approx_both") - F.col("n_both"))
            <= F.lit(0.2) * (F.col("n_both")) + F.lit(25.0)
        ).alias("approx_ok"),
    )


@register(
    "audience_rfm_segments",
    oracle="""
    WITH per_cust AS (
        SELECT o_custkey,
               MAX(o_orderdate) AS last_order,
               CAST(COUNT(*) AS BIGINT) AS frequency,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
                   AS monetary
        FROM orders GROUP BY o_custkey
    ),
    scored AS (
        SELECT o_custkey, frequency, monetary,
               NTILE(5) OVER (ORDER BY last_order DESC, o_custkey) AS r,
               NTILE(5) OVER (ORDER BY frequency DESC, o_custkey) AS f,
               NTILE(5) OVER (ORDER BY monetary DESC, o_custkey) AS m
        FROM per_cust
    )
    SELECT r, f, m,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(frequency) AS BIGINT) AS total_orders,
           CAST(SUM(monetary) AS DOUBLE) AS total_monetary
    FROM scored
    GROUP BY r, f, m
    """,
)
def audience_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: customers quintiled on Recency (last order date),
    Frequency (order count), and Monetary (exact-decimal spend), then the
    125-cell segment grid with counts and totals — the standard customer-
    value rollup. NTILE orders tie-break on custkey so quintile membership
    is a total order in both engines; monetary stays DECIMAL until the
    final per-segment sum. The per-customer aggregate collapses orders
    first (one shuffle); each quintile is then computed CLOSED-FORM from
    the distributed exact rank (operators/ranking.py) plus a broadcast
    total — NTILE(k) of the row ranked rk among n is determined by
    (rk, n, k) alone — so no unpartitioned window survives (round-5 scale
    audit replaced the three single-task NTILE windows)."""
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("monetary"),
    )
    from chainhouse_spark.operators.ranking import global_row_number

    # Rank THIN (key, dim) projections and join back on the key instead of
    # chaining three ranks over the full row: each range-partition sort
    # then moves 2 columns instead of 5, and the three rank lineages hang
    # off one materialized per-customer aggregate (round-7 measurement:
    # ~20% faster warm, 3.7x faster cold than the chained form).
    per_cust = per_cust.localCheckpoint(eager=False)
    ranked = per_cust
    for dim, rk in (
        ("last_order", "__rk_r"),
        ("frequency", "__rk_f"),
        ("monetary", "__rk_m"),
    ):
        thin = global_row_number(
            per_cust.select("o_custkey", dim),
            [F.desc(dim), F.asc("o_custkey")],
            rk,
        ).select("o_custkey", rk)
        ranked = ranked.join(thin, "o_custkey")
    n_df = per_cust.agg(F.count(F.lit(1)).alias("__n"))

    def ntile5(rk: str):
        # SQL NTILE(5): the first (n % 5) tiles hold ceil(n/5) rows, the
        # rest floor(n/5). greatest(q,1) guards the (never-taken at n>=5)
        # small-n branch under ANSI division.
        q = F.floor(F.col("__n") / 5)
        r = F.col("__n") % 5
        big = r * (q + 1)
        return (
            F.when(F.col(rk) <= big, F.floor((F.col(rk) - 1) / (q + 1)) + 1)
            .otherwise(
                r + F.floor((F.col(rk) - big - 1) / F.greatest(q, F.lit(1))) + 1
            )
            .cast("int")
        )

    scored = ranked.crossJoin(F.broadcast(n_df)).select(
        "frequency",
        "monetary",
        ntile5("__rk_r").alias("r"),
        ntile5("__rk_f").alias("f"),
        ntile5("__rk_m").alias("m"),
    )
    return scored.groupBy("r", "f", "m").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers"),
        F.sum("frequency").cast("bigint").alias("total_orders"),
        F.sum("monetary").cast("double").alias("total_monetary"),
    )


@register(
    "audience_ltv_cohort",
    oracle="""
    WITH buys AS (
        SELECT user_id, CAST(ts AS DATE) AS d,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    first_buy AS (
        SELECT user_id, MIN(d) AS d0 FROM buys GROUP BY user_id
    ),
    cohort_size AS (
        SELECT CAST(date_trunc('week', d0) AS TIMESTAMP) AS cohort_week,
               CAST(COUNT(*) AS BIGINT) AS cohort_users
        FROM first_buy GROUP BY 1
    ),
    cell AS (
        SELECT CAST(date_trunc('week', f.d0) AS TIMESTAMP) AS cohort_week,
               CAST(FLOOR(date_diff('day', f.d0, b.d) / 7) AS BIGINT)
                 AS age_weeks,
               CAST(SUM(b.cents) AS BIGINT) AS revenue_cents
        FROM buys b JOIN first_buy f ON b.user_id = f.user_id
        GROUP BY 1, 2
    ),
    cum AS (
        SELECT cohort_week, age_weeks, revenue_cents,
               CAST(SUM(revenue_cents) OVER (
                   PARTITION BY cohort_week ORDER BY age_weeks
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_revenue_cents
        FROM cell
    )
    SELECT c.cohort_week, c.age_weeks, s.cohort_users, c.revenue_cents,
           c.cum_revenue_cents,
           CAST(c.cum_revenue_cents AS DOUBLE) / s.cohort_users
             AS ltv_cents_per_user
    FROM cum c JOIN cohort_size s ON c.cohort_week = s.cohort_week
    """,
)
def audience_ltv_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value matrix: users grouped by first-purchase week,
    revenue summed per (cohort, weeks-since-first-purchase) cell, then the
    running cumulative per cohort — LTV-per-user is the number growth teams
    read off the diagonal. Money stays exact integer cents until the one
    final per-row division; day arithmetic runs on DATE (timezone-free,
    the retention_weekly recipe). Scale: one user-keyed aggregate, one
    (cohort, age) aggregate over |users| rows, and the cumulative window
    is PARTITIONED by cohort (|ages| rows per task, never the corpus)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    buys = e.select(
        "user_id",
        F.col("ts").cast("date").alias("d"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    first_buy = buys.groupBy("user_id").agg(F.min("d").alias("d0"))
    cohort_size = first_buy.groupBy(
        F.date_trunc("week", F.col("d0")).cast("timestamp_ntz").alias("cohort_week")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cohort_users"))
    cell = (
        buys.join(first_buy, "user_id")
        .select(
            F.date_trunc("week", F.col("d0"))
            .cast("timestamp_ntz")
            .alias("cohort_week"),
            F.floor(F.datediff(F.col("d"), F.col("d0")) / 7).alias("age_weeks"),
            "cents",
        )
        .groupBy("cohort_week", "age_weeks")
        .agg(F.sum("cents").cast("bigint").alias("revenue_cents"))
    )
    w = (
        Window.partitionBy("cohort_week")
        .orderBy("age_weeks")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = cell.withColumn(
        "cum_revenue_cents", F.sum("revenue_cents").over(w).cast("bigint")
    )
    return cum.join(F.broadcast(cohort_size), "cohort_week").select(
        "cohort_week",
        "age_weeks",
        "cohort_users",
        "revenue_cents",
        "cum_revenue_cents",
        F.expr("CAST(cum_revenue_cents AS DOUBLE) / cohort_users").alias(
            "ltv_cents_per_user"
        ),
    )


@register(
    "audience_engagement_decay",
    oracle="""
    WITH w AS (
        SELECT user_id, event_type,
               CAST(ROUND(
                 POWER(2.0, -((epoch_us(TIMESTAMP '2024-01-31 00:00:00')
                               - epoch_us(ts)) / 86400000000.0) / 7.0),
                 9) AS DECIMAL(18,9)) AS wt
        FROM events
    ),
    per_user AS (
        SELECT user_id,
               CAST(SUM(wt) AS DECIMAL(28,9)) AS score,
               CAST(SUM(CASE WHEN event_type = 'purchase' THEN wt
                             ELSE CAST(0 AS DECIMAL(18,9)) END)
                    AS DECIMAL(28,9)) AS purchase_score,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM w GROUP BY user_id
    )
    SELECT user_id,
        CAST(score AS DOUBLE) AS score,
        CAST(purchase_score AS DOUBLE) AS purchase_score,
        n_events,
        CASE WHEN score >= 40 THEN 'hot' WHEN score >= 20 THEN 'warm'
             ELSE 'cool' END AS tier
    FROM per_user
    """,
)
def audience_engagement_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed engagement score (half-life 7 days,
    anchored at the corpus end 2024-01-31): each event contributes
    2^(-age_days/7), so recent activity dominates — the standard recency
    weighting behind churn/win-back audiences. Cross-engine exactness:
    the per-event weight is computed INDEPENDENTLY per row and rounded to
    DECIMAL(18,9) BEFORE the sum, so the aggregate is an order-independent
    decimal sum (float += in partition order would diverge between
    engines). One user-keyed shuffle; the tier CASE is free."""
    e = load_table(spark, sf_dir, "events")
    age_days = (
        F.lit(1706659200000000)  # epoch_us('2024-01-31 00:00:00Z')
        - F.unix_micros(F.col("ts").cast("timestamp"))
    ) / F.lit(86400000000.0)
    wt = F.round(F.pow(F.lit(2.0), -age_days / F.lit(7.0)), 9).cast(
        "decimal(18,9)"
    )
    per_user = (
        e.select(
            "user_id",
            "event_type",
            wt.alias("wt"),
        )
        .groupBy("user_id")
        .agg(
            F.sum("wt").cast("decimal(28,9)").alias("score"),
            F.sum(
                F.when(F.col("event_type") == "purchase", F.col("wt")).otherwise(
                    F.lit(0).cast("decimal(18,9)")
                )
            )
            .cast("decimal(28,9)")
            .alias("purchase_score"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
    )
    return per_user.select(
        "user_id",
        F.col("score").cast("double").alias("score"),
        F.col("purchase_score").cast("double").alias("purchase_score"),
        "n_events",
        F.when(F.col("score") >= 40, "hot")
        .when(F.col("score") >= 20, "warm")
        .otherwise("cool")
        .alias("tier"),
    )


# Round-at-9 exemption (registry.ROUND9_EXEMPT): cents scale ~6e4, past
# the cross-engine ROUND agreement zone — protected by the exact integer
# cents sum with one shared final division.
exempt_round9("audience_ltv_cohort", {
    "ltv_cents_per_user": "cents scale (~6e4 at sf0.01)",
})
