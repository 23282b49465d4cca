"""Behavioral analytics — ClickHouse funnel/retention parity surface.

The reference delegates all analytics to ClickHouse (SURVEY.md §2.6,
`/root/reference/src/main.rs:56-161` is the full query-facing contract), and
ClickHouse's signature event-analytics aggregates are `windowFunnel`,
`retention`, and `sequenceCount`. These re-express each one as declarative
Spark over the `events` table, with exact DuckDB oracles.

Semantics pinned here (the ClickHouse versions have modes; we document ours):

- funnel: step k+1 must occur strictly after step k and within WINDOW_DAYS of
  the user's FIRST step-1 event (windowFunnel 'strict_order'-ish, window
  anchored at step 1).
- retention: cohort = week of a user's first event; a user counts for offset
  k if they have any event in cohort-week + k.
- sequence pairs: per user, the number of (A, B) ordered pairs with
  ts_A < ts_B — ClickHouse sequenceCount('(?1).*(?2)') over non-distinct
  matches.

Scale: every stage shuffles on user_id only, so the per-step aggregates and
the step-to-step joins all reuse ONE exchange layout; per-step inputs are
filtered before the shuffle (events at 100 TB reduce to |users| rows per
step before any join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table

WINDOW_DAYS = 14

_FUNNEL_CTES = f"""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t0 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t1
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'view'
          AND e.ts > s1.t0 AND e.ts <= s1.t0 + INTERVAL {WINDOW_DAYS} DAY
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e
        JOIN s1 ON e.user_id = s1.user_id
        JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase'
          AND e.ts > s2.t1 AND e.ts <= s1.t0 + INTERVAL {WINDOW_DAYS} DAY
        GROUP BY e.user_id
    )
"""


def _funnel_stages(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, ...]:
    e = load_table(spark, sf_dir, "events")
    # Round-12 measured NO-GO on checkpointing s1/s2 here: the lazy
    # localCheckpoint halves the plan (8 events scans -> 3) but the two
    # materialization jobs cost more than the re-derived pushed-filter
    # scans they save (funnel_depth_histogram 0.808 -> 1.003 s same-host,
    # +24%) — the per-stage subplans are cheap broadcast-join pipelines
    # locally. Left as the planner-duplicated form; at true 100 TB the
    # |users|-sized checkpoint flips profitable, revisit with a cluster
    # measurement (OPTIMIZATION_r12.md "left alone").
    s1 = (
        e.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t0"))
    )
    deadline = F.col("t0") + F.expr(f"INTERVAL {WINDOW_DAYS} DAYS")
    s2 = (
        e.filter(F.col("event_type") == "view")
        .join(s1, "user_id")
        .filter((F.col("ts") > F.col("t0")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s1, "user_id")
        .join(s2, "user_id")
        .filter((F.col("ts") > F.col("t1")) & (F.col("ts") <= deadline))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    return s1, s2, s3


@register(
    "funnel_steps",
    oracle=_FUNNEL_CTES
    + """
    SELECT 1 AS step, 'signup' AS step_name, COUNT(*) AS n_users FROM s1
    UNION ALL
    SELECT 2 AS step, 'view' AS step_name, COUNT(*) AS n_users FROM s2
    UNION ALL
    SELECT 3 AS step, 'purchase' AS step_name, COUNT(*) AS n_users FROM s3
    """,
)
def funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """windowFunnel analogue: users surviving each step of
    signup -> view -> purchase, window anchored at first signup."""
    s1, s2, s3 = _funnel_stages(spark, sf_dir)
    rows = [
        s1.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(1).alias("step"), F.lit("signup").alias("step_name"), "n_users"
        ),
        s2.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(2).alias("step"), F.lit("view").alias("step_name"), "n_users"
        ),
        s3.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(3).alias("step"), F.lit("purchase").alias("step_name"), "n_users"
        ),
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


@register(
    "funnel_depth_histogram",
    oracle=_FUNNEL_CTES
    + """
    SELECT depth, COUNT(*) AS n_users FROM (
        SELECT s1.user_id,
               1 + (s2.user_id IS NOT NULL)::INT + (s3.user_id IS NOT NULL)::INT
                 AS depth
        FROM s1
        LEFT JOIN s2 ON s1.user_id = s2.user_id
        LEFT JOIN s3 ON s1.user_id = s3.user_id
    ) GROUP BY depth
    """,
)
def funnel_depth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user deepest funnel step reached -> histogram. The three stage
    aggregates and both left joins share the user_id hash partitioning, so
    Catalyst reuses a single exchange across the whole plan."""
    s1, s2, s3 = _funnel_stages(spark, sf_dir)
    depth = (
        s1.join(s2, "user_id", "left")
        .join(s3, "user_id", "left")
        .select(
            (
                F.lit(1)
                + F.col("t1").isNotNull().cast("int")
                + F.col("t2").isNotNull().cast("int")
            ).alias("depth")
        )
    )
    return depth.groupBy("depth").agg(F.count(F.lit(1)).alias("n_users"))


@register(
    "retention_weekly",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS d0 FROM events GROUP BY user_id
    )
    SELECT
        CAST(date_trunc('week', f.d0) AS TIMESTAMP) AS cohort_week,
        CAST(FLOOR(date_diff('day', f.d0, CAST(e.ts AS DATE)) / 7) AS BIGINT)
          AS week_offset,
        COUNT(DISTINCT e.user_id) AS n_active
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def retention_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse retention() analogue as a cohort matrix: users grouped by
    first-seen week, counted distinct in each subsequent week offset.
    Day arithmetic runs on DATE (timezone-free) so both engines agree."""
    e = load_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(F.min(F.col("ts").cast("date")).alias("d0"))
    return (
        e.join(first_seen, "user_id")
        .select(
            F.date_trunc("week", F.col("d0")).cast("timestamp_ntz").alias("cohort_week"),
            F.floor(F.datediff(F.col("ts").cast("date"), F.col("d0")) / 7).alias(
                "week_offset"
            ),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "sequence_pairs_click_purchase",
    oracle="""
    SELECT c.user_id, COUNT(*) AS n_pairs
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND c.ts < p.ts
    GROUP BY c.user_id
    """,
)
def sequence_pairs_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """sequenceCount('(?1).*(?2)') analogue: ordered (click, purchase) pairs
    per user. Equi-join on user_id with the ts inequality as a post-join
    predicate — pair expansion happens inside each user's partition, never
    across users."""
    e = load_table(spark, sf_dir, "events")
    c = e.filter(F.col("event_type") == "click").select("user_id", F.col("ts").alias("c_ts"))
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    return (
        c.join(p, "user_id")
        .filter(F.col("c_ts") < F.col("p_ts"))
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@register(
    "attribution_last_click",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, event_type, event_id FROM events
        WHERE event_type IN ('click', 'purchase')
    ),
    locf AS (
        SELECT user_id, ts, event_type,
               last_value(CASE WHEN event_type = 'click' THEN ts END IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS last_click_ts
        FROM u
    )
    SELECT user_id, ts AS purchase_ts, last_click_ts,
           epoch_us(ts) - epoch_us(last_click_ts) AS gap_us
    FROM locf WHERE event_type = 'purchase'
    """,
)
def attribution_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch attribution: for every purchase, the user's most recent
    strictly-earlier click — a per-key pandas merge_asof through the
    COGROUPED applyInPandas surface (two grouped relations, one Python
    stage, Arrow both ways). The oracle states the same join as an
    IGNORE NULLS LOCF window, exact because (user_id, ts) is unique in this
    data. At scale both inputs hash-partition on user_id once; Python state
    is one user's clicks+purchases at a time."""
    import pandas as pd

    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts")
    purchases = e.filter(F.col("event_type") == "purchase").select("user_id", "ts")

    def merge(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        # left: one user's clicks; right: the same user's purchases.
        if right.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "purchase_ts": pd.Series([], dtype="datetime64[us]"),
                    "last_click_ts": pd.Series([], dtype="datetime64[us]"),
                    "gap_us": pd.Series([], dtype="Int64"),
                }
            )
        p = right.sort_values("ts").rename(columns={"ts": "purchase_ts"})
        p["purchase_ts"] = p["purchase_ts"].astype("datetime64[us]")
        c = (
            left.sort_values("ts")[["ts"]]
            .rename(columns={"ts": "last_click_ts"})
            .astype({"last_click_ts": "datetime64[us]"})
        )
        merged = pd.merge_asof(
            p,
            c,
            left_on="purchase_ts",
            right_on="last_click_ts",
            direction="backward",
            allow_exact_matches=False,
        )
        gap_ns = merged["purchase_ts"] - merged["last_click_ts"]
        merged["gap_us"] = (
            (gap_ns.dt.total_seconds() * 1_000_000).round().astype("Int64")
        )
        return merged[["user_id", "purchase_ts", "last_click_ts", "gap_us"]]

    return clicks.groupBy("user_id").cogroup(purchases.groupBy("user_id")).applyInPandas(
        merge,
        schema="user_id bigint, purchase_ts timestamp_ntz, "
        "last_click_ts timestamp_ntz, gap_us bigint",
    )


# --------------------------------------------------------------------------
# sequenceMatch — regex over a user's ordered event-type string
# --------------------------------------------------------------------------

_SEQ_PATTERN = "s.*v.*p"  # signup, then view, then purchase — any gaps


@register(
    "sequence_match_regex",
    oracle=f"""
    WITH seqs AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
                 AS seq
        FROM events GROUP BY user_id
    )
    SELECT regexp_matches(seq, '{_SEQ_PATTERN}') AS matched,
           COUNT(*) AS n_users
    FROM seqs GROUP BY matched
    """,
)
def sequence_match_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``sequenceMatch('(?1).*(?2).*(?3)')`` analogue: per user,
    concatenate the first letter of each event type in (ts, event_id) order
    (the five types have distinct initials) and regex-match the pattern.

    Spark shape: one shuffle on user_id; the per-user sequence is built with
    ``array_sort(collect_list(struct(...)))`` — sorting happens inside the
    aggregation buffer, not as a global sort.  At 100 TB the collected
    per-user event string is the only state, bounded by events-per-user.
    """
    e = load_table(spark, sf_dir, "events")
    seq = F.concat_ws(
        "",
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("ts"), F.col("event_id"),
                        F.substring("event_type", 1, 1).alias("code"),
                    )
                )
            ),
            lambda x: x["code"],
        ),
    )
    return (
        e.groupBy("user_id")
        .agg(seq.alias("seq"))
        .select(F.col("seq").rlike(_SEQ_PATTERN).alias("matched"))
        .groupBy("matched")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "funnel_latency_percentiles",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'click' THEN epoch_us(ts) END) AS t_click,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS t_buy
        FROM events
        WHERE event_type IN ('click', 'purchase')
        GROUP BY user_id
    ),
    conv AS (
        SELECT user_id, (t_buy - t_click) AS lat_us
        FROM firsts
        WHERE t_click IS NOT NULL AND t_buy IS NOT NULL AND t_buy >= t_click
    ),
    ranked AS (
        SELECT lat_us,
               ROW_NUMBER() OVER (ORDER BY lat_us, user_id) AS rk,
               COUNT(*) OVER () AS n
        FROM conv
    )
    SELECT CAST(MIN(n) AS BIGINT) AS n_conversions,
           CAST(MAX(CASE WHEN rk = (n * 50 + 99) // 100 THEN lat_us END)
                // 1000000 AS BIGINT) AS p50_latency_s,
           CAST(MAX(CASE WHEN rk = (n * 90 + 99) // 100 THEN lat_us END)
                // 1000000 AS BIGINT) AS p90_latency_s,
           CAST(MAX(CASE WHEN rk = (n * 99 + 99) // 100 THEN lat_us END)
                // 1000000 AS BIGINT) AS p99_latency_s,
           CAST(MAX(lat_us) // 1000000 AS BIGINT) AS max_latency_s
    FROM ranked
    """,
)
def funnel_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution for the click -> purchase edge: per user
    the latency from FIRST click to FIRST subsequent purchase, then exact
    ceil-rank p50/p90/p99 (integer microseconds, the stream_watermark_advisor
    percentile recipe) — the product metric behind funnel SLAs. One
    user-keyed aggregate collapses the corpus; the rank over converting
    users is the DISTRIBUTED exact rank (operators/ranking.py) and the
    total count a broadcast scalar — no single-task window even if every
    user converts (round-5 scale audit)."""
    from chainhouse_spark.operators.ranking import global_row_number

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    t = F.unix_micros(F.col("ts").cast("timestamp"))
    firsts = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "click", t)).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", t)).alias("t_buy"),
    )
    conv = firsts.filter(
        F.col("t_click").isNotNull()
        & F.col("t_buy").isNotNull()
        & (F.col("t_buy") >= F.col("t_click"))
    ).select("user_id", (F.col("t_buy") - F.col("t_click")).alias("lat_us"))
    n_df = conv.agg(F.count(F.lit(1)).alias("n"))
    ranked = (
        global_row_number(conv, [F.asc("lat_us"), F.asc("user_id")], "rk")
        .crossJoin(F.broadcast(n_df))
        .select("lat_us", "rk", "n")
    )

    def at_rank(pct: int):
        return F.max(
            F.when(F.col("rk") == F.expr(f"(n * {pct} + 99) div 100"), F.col("lat_us"))
        )

    return ranked.agg(
        F.min("n").cast("bigint").alias("n_conversions"),
        (at_rank(50) / 1000000).cast("bigint").alias("p50_latency_s"),
        (at_rank(90) / 1000000).cast("bigint").alias("p90_latency_s"),
        (at_rank(99) / 1000000).cast("bigint").alias("p99_latency_s"),
        F.expr("MAX(lat_us) div 1000000").cast("bigint").alias("max_latency_s"),
    )


@register(
    "sequence_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) AS prev_type
        FROM events
    ),
    cnt AS (
        SELECT prev_type, event_type AS next_type,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM seq WHERE prev_type IS NOT NULL
        GROUP BY prev_type, next_type
    )
    SELECT prev_type, next_type, n,
           (ROUND((CAST(n AS DOUBLE)
               / SUM(n) OVER (PARTITION BY prev_type)) * 1e9) / 1e9 + 0.0) AS p
    FROM cnt
    """,
)
def sequence_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    sequence: counts and row-normalized probabilities of event_type ->
    next event_type — the behavior model behind next-action prediction and
    anomalous-session scoring (a session whose transitions are improbable
    under this matrix is an outlier). One user-keyed shuffle for the lag,
    then the matrix is a |types|^2 aggregate; probabilities are single
    divisions of exact counts (the row-sum window runs over matrix cells,
    not events)."""
    from pyspark.sql import Window

    seq = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.lag("event_type")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("prev_type"),
    )
    cnt = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    return cnt.select(
        "prev_type",
        "next_type",
        "n",
        F.round(
            F.col("n").cast("double")
            / F.sum("n").over(Window.partitionBy("prev_type")),
            9,
        ).alias("p"),
    )


@register(
    "funnel_retention_conditions",
    oracle="""
    WITH per_user AS (
        SELECT user_id,
               MAX(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-06'
                        THEN 1 ELSE 0 END) AS c1,
               MAX(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-07'
                        THEN 1 ELSE 0 END) AS c2,
               MAX(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-09'
                        THEN 1 ELSE 0 END) AS c3,
               MAX(CASE WHEN CAST(ts AS DATE) = DATE '2024-01-13'
                        THEN 1 ELSE 0 END) AS c4
        FROM events GROUP BY user_id
    )
    SELECT CAST(SUM(c1) AS BIGINT) AS r1,
           CAST(SUM(c1 * c2) AS BIGINT) AS r2,
           CAST(SUM(c1 * c3) AS BIGINT) AS r3,
           CAST(SUM(c1 * c4) AS BIGINT) AS r4,
           (ROUND((CAST(SUM(c1 * c2) AS DOUBLE) / SUM(c1)) * 1e9) / 1e9 + 0.0) AS day1_retention,
           (ROUND((CAST(SUM(c1 * c3) AS DOUBLE) / SUM(c1)) * 1e9) / 1e9 + 0.0) AS day3_retention,
           (ROUND((CAST(SUM(c1 * c4) AS DOUBLE) / SUM(c1)) * 1e9) / 1e9 + 0.0) AS day7_retention
    FROM per_user
    """,
)
def funnel_retention_conditions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse retention(cond1..condN) aggregate, exact semantics:
    per user, r[1] = cond1 ever true, r[i>1] = cond1 AND cond_i — here
    'active on day 0 / +1 / +3 / +7' (the day-N retention readout, unlike
    `retention_weekly`'s cohort matrix). One user-keyed aggregate of four
    condition bits, then a 1-row global sum — exact integers to the three
    final ratio divisions. At 100 TB: one shuffle of (user, 4 bits)."""
    e = load_table(spark, sf_dir, "events")
    d = F.col("ts").cast("date")

    def cond(day: str):
        return F.max(
            F.when(d == F.lit(day).cast("date"), 1).otherwise(0)
        )

    per_user = e.groupBy("user_id").agg(
        cond("2024-01-06").alias("c1"),
        cond("2024-01-07").alias("c2"),
        cond("2024-01-09").alias("c3"),
        cond("2024-01-13").alias("c4"),
    )
    return per_user.agg(
        F.sum("c1").cast("bigint").alias("r1"),
        F.sum(F.col("c1") * F.col("c2")).cast("bigint").alias("r2"),
        F.sum(F.col("c1") * F.col("c3")).cast("bigint").alias("r3"),
        F.sum(F.col("c1") * F.col("c4")).cast("bigint").alias("r4"),
        F.expr("(ROUND((CAST(SUM(c1 * c2) AS DOUBLE) / SUM(c1)) * 1e9) / 1e9 + 0.0)").alias("day1_retention"),
        F.expr("(ROUND((CAST(SUM(c1 * c3) AS DOUBLE) / SUM(c1)) * 1e9) / 1e9 + 0.0)").alias("day3_retention"),
        F.expr("(ROUND((CAST(SUM(c1 * c4) AS DOUBLE) / SUM(c1)) * 1e9) / 1e9 + 0.0)").alias("day7_retention"),
    )


@register(
    "attribution_position_based",
    oracle="""
    WITH u AS (
        SELECT user_id, ts, event_type, event_id FROM events
        WHERE event_type IN ('click', 'purchase')
    ),
    scan AS (
        SELECT user_id, ts, event_type,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS n_clicks,
               MIN(CASE WHEN event_type = 'click' THEN ts END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS first_click_ts,
               MAX(CASE WHEN event_type = 'click' THEN ts END)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                 AS last_click_ts
        FROM u
    )
    SELECT user_id, ts AS purchase_ts,
           CAST(n_clicks AS BIGINT) AS n_prior_clicks,
           first_click_ts, last_click_ts,
           CASE WHEN n_clicks = 0 THEN NULL
                WHEN n_clicks = 1 THEN 1.0
                ELSE 0.4 END AS first_credit,
           CASE WHEN n_clicks = 0 THEN NULL
                WHEN n_clicks = 1 THEN 1.0
                WHEN n_clicks = 2 THEN 0.6
                ELSE 0.4 END AS last_credit,
           CASE WHEN n_clicks <= 2 THEN NULL
                ELSE ROUND(0.2 / (n_clicks - 2), 9) END AS middle_credit_each
    FROM scan WHERE event_type = 'purchase'
    """,
)
def attribution_position_based(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped, 40/20/40) attribution: for each purchase,
    the user's strictly-earlier clicks share credit — 40% to the first
    click, 40% to the most recent, the remaining 20% split evenly across
    the middle. One click takes 100%; two split 40/60 (first keeps its 40,
    the last absorbs the middle's share). Expressed as three running
    window aggregates (count / min-ts / max-ts of prior clicks) over the
    user's (ts, event_id)-ordered stream — one shuffle on user_id, no
    purchase-x-click pair join, so the pair space never materializes (at
    100 TB a user's history streams through one window pass; credits per
    middle click are closed-form, not per-row).  Credits are exact
    decimals via ROUND(.., 9)."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    u = e.filter(F.col("event_type").isin("click", "purchase")).select(
        "user_id", "ts", "event_type", "event_id"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_ts = F.when(F.col("event_type") == "click", F.col("ts"))
    scan = u.select(
        "user_id",
        "ts",
        "event_type",
        F.count(F.when(F.col("event_type") == "click", 1)).over(w).alias("n_clicks"),
        F.min(click_ts).over(w).alias("first_click_ts"),
        F.max(click_ts).over(w).alias("last_click_ts"),
    )
    n = F.col("n_clicks")
    return scan.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("purchase_ts"),
        n.cast("bigint").alias("n_prior_clicks"),
        "first_click_ts",
        "last_click_ts",
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n == 1, F.lit(1.0))
        .otherwise(F.lit(0.4))
        .alias("first_credit"),
        F.when(n == 0, F.lit(None).cast("double"))
        .when(n == 1, F.lit(1.0))
        .when(n == 2, F.lit(0.6))
        .otherwise(F.lit(0.4))
        .alias("last_credit"),
        F.when(n <= 2, F.lit(None).cast("double"))
        .otherwise(F.round(F.lit(0.2) / (n - 2), 9))
        .alias("middle_credit_each"),
    )


@register(
    "funnel_time_to_convert",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'signup' THEN ts END) AS signup_ts
        FROM events GROUP BY user_id
    ),
    conv AS (
        SELECT f.user_id, f.signup_ts,
               MIN(e.ts) AS purchase_ts
        FROM firsts f
        JOIN events e ON e.user_id = f.user_id
         AND e.event_type = 'purchase' AND e.ts > f.signup_ts
        WHERE f.signup_ts IS NOT NULL
        GROUP BY f.user_id, f.signup_ts
    ),
    lat AS (
        SELECT (epoch_us(purchase_ts) - epoch_us(signup_ts)) / 3600000000.0
                 AS hours
        FROM conv
    )
    SELECT
        CASE WHEN hours < 1 THEN '0-1h' WHEN hours < 6 THEN '1-6h'
             WHEN hours < 24 THEN '6-24h' WHEN hours < 168 THEN '1-7d'
             ELSE '7d+' END AS bucket,
        CAST(COUNT(*) AS BIGINT) AS n_users,
        ROUND(MIN(hours), 6) AS min_hours,
        ROUND(MAX(hours), 6) AS max_hours
    FROM lat GROUP BY 1
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: latency from a user's FIRST signup to
    their first subsequent purchase, bucketed into product-friendly bands.
    Two user-keyed aggregates sharing one shuffle layout (first-signup,
    then min-purchase-after) — the conditional-min formulation avoids any
    window; the final histogram is a tiny groupBy. Latency arithmetic is
    integer microseconds divided once at the end (exact in both
    engines)."""
    e = load_table(spark, sf_dir, "events")
    firsts = (
        e.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "signup", F.col("ts"))
            ).alias("signup_ts")
        )
        .filter(F.col("signup_ts").isNotNull())
    )
    conv = (
        e.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .filter(F.col("ts") > F.col("signup_ts"))
        .groupBy("user_id", "signup_ts")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    hours = (
        (
            F.unix_micros(F.col("purchase_ts").cast("timestamp"))
            - F.unix_micros(F.col("signup_ts").cast("timestamp"))
        )
        / F.lit(3600000000.0)
    ).alias("hours")
    lat = conv.select(hours)
    return (
        lat.select(
            F.when(F.col("hours") < 1, "0-1h")
            .when(F.col("hours") < 6, "1-6h")
            .when(F.col("hours") < 24, "6-24h")
            .when(F.col("hours") < 168, "1-7d")
            .otherwise("7d+")
            .alias("bucket"),
            "hours",
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.round(F.min("hours"), 6).alias("min_hours"),
            F.round(F.max("hours"), 6).alias("max_hours"),
        )
    )
