"""Aggregation coverage — SURVEY.md §2.6 "Aggregation" parity surface.

Hash/sort agg, partial+final (map-side combine is automatic in Spark),
distinct aggregates, rollup/cube/grouping sets, min_by/max_by, exact
percentiles, ordered string aggregation, and an approximate-distinct
(rows-only gate: HLL implementations differ across engines by design).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.operators.partitioning import spread
from chainhouse_spark.queries.registry import exempt_round9, register
from chainhouse_spark.tables import load_table


@register(
    "agg_distinct",
    oracle="""
    SELECT
        o_orderstatus,
        COUNT(DISTINCT o_custkey) AS n_customers,
        COUNT(*) AS n_orders,
        CAST(SUM(DISTINCT CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_distinct_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.expr(
            "CAST(SUM(DISTINCT CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)"
        ).alias("sum_distinct_price"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical subtotals; GROUPING() disambiguates subtotal rows from
    genuine NULL group keys. The N+1-way Expand makes this CPU-heavy, so the
    under-partitioned local scan is spread() first (identity at real scale;
    ~20% faster at sf0.1)."""
    li = spread(load_table(spark, sf_dir, "lineitem"))
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.grouping("l_returnflag").cast("int").alias("g_flag"),
        F.grouping("l_linestatus").cast("int").alias("g_status"),
        F.expr("CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "agg_rollup_reagg",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(GROUPING(l_returnflag) AS INT) AS g_flag,
        CAST(GROUPING(l_linestatus) AS INT) AS g_status,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def agg_rollup_reagg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB rollup shape: native `rollup()` Expands every RAW row
    N+1 ways before the partial aggregate — 3x scan-side CPU here, N+1x in
    general. This version aggregates the finest grain ONCE (one shuffle on
    the full key) and derives every coarser subtotal by re-aggregating the
    already-compacted result, whose size is the number of groups, not rows.
    Decimal sums make the re-aggregation exact, so the output (and oracle)
    is identical to agg_rollup's.

    Applicability note: works for decomposable aggregates (SUM/COUNT/MIN/
    MAX, and AVG via sum+count); for holistic ones (exact percentiles,
    COUNT DISTINCT) use the native rollup or sketch-mergeable forms.
    """
    li = spread(load_table(spark, sf_dir, "lineitem"))
    base = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("_sq"),
        F.count(F.lit(1)).alias("_n"),
    )
    lvl0 = base.select(
        "l_returnflag",
        "l_linestatus",
        F.lit(0).alias("g_flag"),
        F.lit(0).alias("g_status"),
        F.col("_sq").cast("double").alias("sum_qty"),
        F.col("_n").alias("n_rows"),
    )
    lvl1 = (
        base.groupBy("l_returnflag")
        .agg(F.sum("_sq").alias("_sq"), F.sum("_n").alias("_n"))
        .select(
            "l_returnflag",
            F.lit(None).cast("string").alias("l_linestatus"),
            F.lit(0).alias("g_flag"),
            F.lit(1).alias("g_status"),
            F.col("_sq").cast("double").alias("sum_qty"),
            F.col("_n").alias("n_rows"),
        )
    )
    lvl2 = base.agg(F.sum("_sq").alias("_sq"), F.sum("_n").alias("_n")).select(
        F.lit(None).cast("string").alias("l_returnflag"),
        F.lit(None).cast("string").alias("l_linestatus"),
        F.lit(1).alias("g_flag"),
        F.lit(1).alias("g_status"),
        F.col("_sq").cast("double").alias("sum_qty"),
        F.col("_n").alias("n_rows"),
    )
    return lvl0.unionAll(lvl1).unionAll(lvl2)


@register(
    "agg_cube",
    oracle="""
    SELECT
        o_orderstatus,
        o_orderpriority,
        CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        CAST(GROUPING(o_orderpriority) AS INT) AS g_priority,
        COUNT(*) AS n_orders,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.grouping("o_orderstatus").cast("int").alias("g_status"),
        F.grouping("o_orderpriority").cast("int").alias("g_priority"),
        F.count(F.lit(1)).alias("n_orders"),
        F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)").alias("total"),
    )


@register(
    "agg_grouping_sets",
    oracle="""
    SELECT
        l_returnflag,
        l_shipmonth,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
    FROM (
        SELECT l_returnflag, CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS l_shipmonth,
               l_extendedprice
        FROM lineitem
    )
    GROUP BY GROUPING SETS ((l_returnflag), (l_shipmonth))
    """,
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spread(load_table(spark, sf_dir, "lineitem"))
    li.select(
        "l_returnflag",
        F.date_trunc("month", F.col("l_shipdate")).alias("l_shipmonth"),
        "l_extendedprice",
    ).createOrReplaceTempView("_li_gs")
    return spark.sql(
        """
        SELECT l_returnflag, l_shipmonth,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        FROM _li_gs
        GROUP BY GROUPING SETS ((l_returnflag), (l_shipmonth))
        """
    )


@register(
    "agg_min_max_by",
    oracle="""
    SELECT
        o_orderstatus,
        MIN(o_orderkey) AS first_key,
        MAX(o_orderkey) AS last_key,
        ARG_MAX(o_orderkey, o_totalprice) AS biggest_order_key,
        ARG_MIN(o_orderkey, o_totalprice) AS smallest_order_key
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (ClickHouse argMax/argMin equivalents)."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.min("o_orderkey").alias("first_key"),
        F.max("o_orderkey").alias("last_key"),
        F.expr("MAX_BY(o_orderkey, o_totalprice)").alias("biggest_order_key"),
        F.expr("MIN_BY(o_orderkey, o_totalprice)").alias("smallest_order_key"),
    )


@register(
    "agg_percentiles",
    oracle="""
    SELECT
        l_returnflag,
        QUANTILE_CONT(l_quantity, 0.5) AS median_qty,
        QUANTILE_CONT(l_extendedprice, 0.9) AS p90_price,
        MIN(l_quantity) AS min_qty,
        MAX(l_quantity) AS max_qty
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (percentile_cont semantics both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("PERCENTILE(l_quantity, 0.5)").alias("median_qty"),
        F.expr("PERCENTILE(l_extendedprice, 0.9)").alias("p90_price"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
    )


@register(
    "agg_string_collect",
    oracle="""
    SELECT
        n_regionkey,
        STRING_AGG(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_string_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered list aggregation: sort the collected array for determinism."""
    n = load_table(spark, sf_dir, "nation")
    return n.groupBy("n_regionkey").agg(
        F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations")
    )


@register(
    "agg_approx_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS approx_orders_ok,
           TRUE AS approx_parts_ok
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) — at 100 TB the only affordable
    distinct-count. HLL estimates are engine-specific, so the oracled
    surface is the invariant: exact counts (cross-checked) plus a bool
    asserting the sketch estimate landed within 15 % of exact (HLL++
    default rsd is 5 %, so a pass is a real accuracy statement, and the
    oracle's TRUE fails the hash-match if the sketch drifts)."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey").alias("approx_orders"),
        F.approx_count_distinct("l_partkey").alias("approx_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )

    def _ok(approx, exact):
        return (
            F.abs(F.col(approx) - F.col(exact))
            <= F.lit(0.15) * F.col(exact).cast("double")
        )

    return agg.select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        _ok("approx_orders", "exact_orders").alias("approx_orders_ok"),
        _ok("approx_parts", "exact_parts").alias("approx_parts_ok"),
    )


@register(
    "agg_salted_two_phase",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY event_type
    """,
)
def agg_salted_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-proof aggregation: explicit salt -> partial agg on
    (key, salt) -> final re-agg on key. Bit-identical to the plain GROUP BY
    (the oracle) because count and decimal-sum are associative.

    Map-side combine already handles most skew for algebraic aggregates;
    explicit salting is the pattern for when a single hot key still
    overwhelms one reducer AFTER combining (billions of rows per key at
    100 TB, or non-algebraic aggregates like collect_list). The salt fans
    each hot key over 16 reducers; the final agg touches 16 rows per key.
    AQE's skew handling covers joins, not aggregations — this is the
    aggregation-side answer.
    """
    e = load_table(spark, sf_dir, "events")
    partial = (
        e.withColumn("salt", F.pmod(F.col("event_id"), F.lit(16)))
        .groupBy("event_type", "salt")
        .agg(
            F.count(F.lit(1)).alias("pn"),
            F.expr("SUM(CAST(value AS DECIMAL(18,6)))").alias("pv"),
        )
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n_events"),
        F.expr("CAST(SUM(pv) AS DOUBLE)").alias("total_value"),
    )


@register(
    "agg_unpivot",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS metric_value FROM m
    UNION ALL
    SELECT l_returnflag, 'sum_price' AS metric, sum_price AS metric_value FROM m
    """,
)
def agg_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide-to-long reshape (the inverse of pivot) via UNPIVOT/stack — the
    export shape metric stores want. Map-side expansion of the already-small
    aggregate, no extra shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        F.expr("CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)").alias("sum_qty"),
        F.expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)").alias(
            "sum_price"
        ),
    )
    return m.unpivot(
        ["l_returnflag"], ["sum_qty", "sum_price"], "metric", "metric_value"
    )


@register(
    "agg_mode_deterministic",
    oracle="""
    WITH c AS (
        SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS cnt
        FROM orders GROUP BY o_orderpriority, o_orderstatus
    ),
    r AS (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                     ORDER BY cnt DESC, o_orderstatus DESC) AS rn
        FROM c
    )
    SELECT o_orderpriority, o_orderstatus AS modal_status,
           CAST(cnt AS BIGINT) AS modal_count
    FROM r WHERE rn = 1
    """,
)
def agg_mode_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mode with a total-order tie-break. The built-in `mode()` (Spark 4 and
    DuckDB both have one) picks an ARBITRARY value among tied candidates —
    un-oracle-able and irreproducible across partitionings. The scalable
    deterministic rewrite: count per (group, value) — one shuffle, map-side
    combinable — then max_by on the (count, value) pair. The second element
    of the pair makes ties resolve to the lexicographically greatest value
    on every engine and every partitioning."""
    o = load_table(spark, sf_dir, "orders")
    c = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return c.groupBy("o_orderpriority").agg(
        F.expr("MAX_BY(o_orderstatus, struct(cnt, o_orderstatus))").alias(
            "modal_status"
        ),
        F.max("cnt").cast("bigint").alias("modal_count"),
    )


@register(
    "agg_uniq_up_to",
    oracle="""
    SELECT o_orderpriority,
           LEAST(COUNT(DISTINCT o_custkey), 6) AS uniq_up_to_5,
           COUNT(DISTINCT o_custkey) > 5 AS saturated
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_uniq_up_to(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse ``uniqUpTo(5)``: exact distinct count capped at N+1 —
    "more than N" is all the answer some gates need.  Expressed as
    LEAST(COUNT(DISTINCT), N+1); at 100 TB the cap means the per-group
    distinct state can stop growing at N+1 entries (ClickHouse's actual
    trick), and Spark's partial aggregation bounds the same way when the
    distinct key set is small."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.least(F.countDistinct("o_custkey"), F.lit(6)).alias("uniq_up_to_5"),
        (F.countDistinct("o_custkey") > 5).alias("saturated"),
    )


@register(
    "agg_sum_map_merge",
    oracle="""
    WITH per_user AS (
        SELECT user_id % 10 AS cohort, event_type, COUNT(*) AS cnt
        FROM events GROUP BY user_id % 10, event_type
    )
    SELECT cohort,
           array_to_string(ARRAY_AGG(event_type || ':' || cnt
                     ORDER BY event_type), ',') AS type_counts,
           CAST(SUM(cnt) AS BIGINT) AS total
    FROM per_user GROUP BY cohort
    """,
)
def agg_sum_map_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse sumMap analogue: per-user (event_type -> count) maps
    merged key-wise into per-cohort maps. Spark has no native map-merging
    aggregate, so the merge is the explode -> sum-by-(group, key) ->
    rebuild shape — which is also the SCALABLE shape: the shuffle carries
    (cohort, type, partial count) rows, never serialized maps, and
    map-side partial aggregation collapses duplicates before the exchange.
    The map is emitted as a KEY-SORTED 'type:count' string: deterministic
    order (map iteration order is engine-specific) and hash-stable through
    pandas (the driver canonicalizer cannot hash list/map cells)."""
    e = load_table(spark, sf_dir, "events")
    per = e.groupBy(
        (F.col("user_id") % 10).alias("cohort"), "event_type"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    return per.groupBy("cohort").agg(
        F.expr(
            "array_join(transform("
            "array_sort(collect_list(struct(event_type, cnt)), "
            "(l, r) -> CASE WHEN l.event_type < r.event_type THEN -1 "
            "WHEN l.event_type > r.event_type THEN 1 ELSE 0 END), "
            "s -> concat(s.event_type, ':', s.cnt)), ',')"
        ).alias("type_counts"),
        F.sum("cnt").alias("total"),
    )


# Round-at-9 exemption (registry.ROUND9_EXEMPT): price scale ~1e5, past
# the cross-engine ROUND agreement zone; the percentile itself is an
# exact order statistic both engines pick identically.
exempt_round9("agg_percentiles", {
    "p90_price": "price scale (~1e5 at sf0.01)",
})
