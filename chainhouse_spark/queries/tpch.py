"""TPC-H-style analytic queries over the synthetic star schema.

These are the headline queries: scan+agg (q1), selective join+top-k (q3),
multi-way join (q5), filter+agg (q6). Capability parity per SURVEY.md §2.6 —
the reference delegates all analytics to ClickHouse SQL; Spark SQL over the
same tables is the replacement surface.

Determinism vs the DuckDB oracle: double columns are cast to DECIMAL before
aggregation (exact, order-insensitive), cast back to DOUBLE at the end. See
registry.py docstring.

Scale notes (100 TB): q1/q6 are single-pass scan+partial-agg — Catalyst emits
map-side combine, no data motion beyond the 4-row final agg. q3/q5 join
fact tables on their natural keys; dimension sides (customer/supplier/
nation/region) are broadcast (they stay small relative to facts at every SF),
so the only shuffles are the fact-fact join and the final group-by.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.queries.registry import exempt_round9, register
from chainhouse_spark.tables import load_table

# Exact decimal views of the double money columns (see registry.py):
_QTY = "CAST(l_quantity AS DECIMAL(12,2))"
_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DISC_F = "CAST(1 - l_discount AS DECIMAL(4,2))"
_TAX_F = "CAST(1 + l_tax AS DECIMAL(4,2))"
_DISC = "CAST(l_discount AS DECIMAL(4,2))"


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT
        l_returnflag,
        l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc_price,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2)) * CAST(1 + l_tax AS DECIMAL(4,2))) AS DOUBLE) AS sum_charge,
        (ROUND((CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) * 1e9) / 1e9 + 0.0) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
        COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 analogue: full-scan aggregate with decimal-exact sums."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.expr("TIMESTAMP_NTZ '1998-09-02 00:00:00'"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(f"CAST(SUM({_QTY}) AS DOUBLE)").alias("sum_qty"),
            F.expr(f"CAST(SUM({_PRICE}) AS DOUBLE)").alias("sum_base_price"),
            F.expr(f"CAST(SUM({_PRICE} * {_DISC_F}) AS DOUBLE)").alias("sum_disc_price"),
            F.expr(f"CAST(SUM({_PRICE} * {_DISC_F} * {_TAX_F}) AS DOUBLE)").alias("sum_charge"),
            F.expr(f"(ROUND((CAST(SUM({_QTY}) AS DOUBLE) / COUNT(*)) * 1e9) / 1e9 + 0.0)").alias("avg_qty"),
            F.expr(f"CAST(SUM({_PRICE}) AS DOUBLE) / COUNT(*)").alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT
        l_orderkey,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        o_orderdate,
        o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 analogue: selective join + agg + deterministic top-k.

    EAGER AGGREGATION: revenue is reduced per orderkey BELOW the joins —
    legal because the other group keys (o_orderdate, o_orderpriority)
    functionally depend on orderkey, and the joins only prune whole
    orderkeys. The join probe shrinks by the lines-per-order fan-in
    (~20% faster at sf0.1; more at scale). customer is broadcast;
    LIMIT after ORDER BY compiles to TakeOrderedAndProject — no full sort
    at scale. Tie-break on l_orderkey keeps top-k deterministic.
    """
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    la = (
        li.filter(F.col("l_shipdate") > F.expr("TIMESTAMP_NTZ '1998-03-15 00:00:00'"))
        .groupBy("l_orderkey")
        .agg(F.expr(f"CAST(SUM({_PRICE} * {_DISC_F}) AS DOUBLE)").alias("revenue"))
    )
    return (
        la.join(
            o.filter(F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1998-03-15 00:00:00'")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            F.broadcast(cu.filter(F.col("c_mktsegment") == "BUILDING")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_region_revenue",
    oracle="""
    SELECT
        r_name,
        n_name,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey
      AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey
      AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey
      AND n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 analogue: 6-way join, dimensions broadcast, facts shuffled once."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("c_nationkey") == F.col("s_nationkey")))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(F.expr(f"CAST(SUM({_PRICE} * {_DISC_F}) AS DOUBLE)").alias("revenue"))
    )


@register(
    "q6_forecast_revenue",
    oracle="""
    SELECT
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
        COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.05 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 analogue: pure filter + global agg; all predicates push to scan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.expr(f"CAST(SUM({_PRICE} * {_DISC}) AS DOUBLE)").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


# Round-at-9 exemption (registry.ROUND9_EXEMPT): price-scale mean ~5e4,
# past the cross-engine ROUND agreement zone — protected by the exact
# decimal sum with one shared final division.
exempt_round9("q1_pricing_summary", {
    "avg_price": "price-scale mean (~5e4 at sf0.01)",
})
