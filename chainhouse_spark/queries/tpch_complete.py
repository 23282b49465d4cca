"""Remaining TPC-H-style coverage (q2, q8, q11, q12, q15, q16, q20, q21) —
completes the 22-query family over the simplified star schema.

Adaptations (no partsupp / commitdate / shipmode columns in the test schema):
  - The part-supplier relation is derived from lineitem: distinct
    (l_partkey, l_suppkey) pairs, with min(l_extendedprice / l_quantity) as
    the unit-cost stand-in for ps_supplycost (q2, q16).
  - q12's ship-mode buckets become lateness buckets (FAST/SLOW/LATE by days
    between order date and ship date).
  - q20's availability threshold becomes a shipped-quantity threshold.
  - q21's "late" is l_shipdate >= o_orderdate + 90 days.

Determinism vs the DuckDB oracle (registry.py rules): money aggregates in
DECIMAL, one double division at the end, deterministic tie-breaks on every
LIMIT, CAST(SUM(int)) AS BIGINT (DuckDB sums to HUGEINT otherwise). Unit
cost uses raw double division — elementwise IEEE division is bit-identical
across engines, and MIN over identical sets is exact.

Scale notes (100 TB): the derived part-supplier relation is a fact-sized
aggregate — it shuffles once on (l_partkey, l_suppkey) with map-side
combine. Dimension tables (part, supplier, nation, region) broadcast
everywhere. q2's correlated min is a window over partkey on the already-
reduced supply relation, not a self-join. q21 reduces lineitem⨝orders to
per-order stats before the supplier-level count, so the EXISTS / NOT
EXISTS pair costs one aggregation instead of two correlated joins.
Reference parity: the reference delegates this entire surface to ClickHouse
SQL (src/main.rs:46 connects; SURVEY.md §2.6) — Spark SQL is the
replacement surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chainhouse_spark.functions.rounding import round9
from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table

_QTY = "CAST(l_quantity AS DECIMAL(12,2))"
_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DISC_F = "CAST(1 - l_discount AS DECIMAL(4,2))"
_REV = f"{_PRICE} * {_DISC_F}"


def _supply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived part-supplier relation: one row per (partkey, suppkey) with the
    min observed unit price. Shuffles once with map-side partial min."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )


@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
           (ROUND((CAST(unit_cost AS DOUBLE)) * 1e9) / 1e9 + 0.0) AS unit_cost
    FROM part
    JOIN supply ON p_partkey = l_partkey
    JOIN eu ON l_suppkey = s_suppkey
    WHERE p_size = 5 AND p_type = 'STANDARD'
      AND unit_cost = (
        SELECT MIN(s2.unit_cost) FROM supply s2
        JOIN eu e2 ON s2.l_suppkey = e2.s_suppkey
        WHERE s2.l_partkey = p_partkey
      )
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 analogue: cheapest EUROPE supplier per qualifying part.

    The correlated min-cost subquery is a window min over partkey on the
    reduced supply relation — no second scan, no self-join.
    """
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 5) & (F.col("p_type") == "STANDARD")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    eu = (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    # eu-joined supply BEFORE the part filter so the correlated min sees every
    # EUROPE supplier of the part; the part join then prunes to qualifying parts.
    supply_eu = _supply(spark, sf_dir).join(
        F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey")
    )
    w = Window.partitionBy("l_partkey")
    return (
        supply_eu.withColumn("min_cost", F.min("unit_cost").over(w))
        .filter(F.col("unit_cost") == F.col("min_cost"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "p_partkey", "p_brand",
            round9(F.col("unit_cost").cast("double")).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q8_market_share",
    oracle=f"""
    SELECT yr,
           (ROUND((CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE)) * 1e9) / 1e9 + 0.0) AS mkt_share
    FROM (
      SELECT year(o_orderdate) AS yr, {_REV} AS volume, n2.n_name AS supp_nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND s_nationkey = n2.n_nationkey
        AND r_name = 'ASIA' AND p_type = 'ECONOMY'
    ) all_sales
    GROUP BY yr
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 analogue: NATION_1's share of ECONOMY-part volume sold into
    ASIA, by order year. All dimensions broadcast; facts shuffle once."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    n1 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk"))
    n2 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    sales = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == F.col("r_regionkey"))
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("s_nk"))
        .select(
            F.year("o_orderdate").alias("yr"),
            F.expr(_REV).alias("volume"),
            "supp_nation",
        )
    )
    return sales.groupBy("yr").agg(
        F.expr(
            "(ROUND((CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume "
            "ELSE CAST(0 AS DECIMAL(4,2)) END) AS DOUBLE) "
            "/ CAST(SUM(volume) AS DOUBLE)) * 1e9) / 1e9 + 0.0)"
        ).alias("mkt_share")
    )


@register(
    "q11_important_parts",
    oracle="""
    WITH partval AS (
      SELECT l_partkey AS partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS value_dec
      FROM lineitem
      WHERE l_suppkey IN (
        SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
      )
      GROUP BY l_partkey
    )
    SELECT partkey, CAST(value_dec AS DOUBLE) AS part_value
    FROM partval
    WHERE CAST(value_dec AS DOUBLE) >
          0.0001 * (SELECT CAST(SUM(value_dec) AS DOUBLE) FROM partval)
    """,
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 analogue: parts whose NATION_3-supplied value exceeds a
    fraction of the total. The scalar total is a broadcast cross join of a
    1-row aggregate — fully distributed, no driver collect."""
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_3")
    supp_n3 = s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")).select(
        "s_suppkey"
    )
    partval = (
        li.join(F.broadcast(supp_n3), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.expr("SUM(CAST(l_extendedprice AS DECIMAL(12,2)))").alias("value_dec"))
    )
    total = partval.agg(
        F.expr("CAST(SUM(value_dec) AS DOUBLE)").alias("total_value")
    )
    return (
        partval.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > 0.0001 * F.col("total_value"))
        .select("partkey", F.col("value_dec").cast("double").alias("part_value"))
    )


@register(
    "q12_lateness_priority",
    oracle="""
    SELECT ship_bucket,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM (
      SELECT o_orderpriority,
             CASE WHEN l_shipdate >= o_orderdate + INTERVAL 90 DAY THEN 'LATE'
                  WHEN l_shipdate >= o_orderdate + INTERVAL 30 DAY THEN 'SLOW'
                  ELSE 'FAST' END AS ship_bucket
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    ) t
    GROUP BY ship_bucket
    """,
)
def q12_lateness_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 analogue: priority mix per lateness bucket (ship-mode
    stand-in). Single fact-fact shuffle on orderkey, then a 3-group agg."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
    )
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.expr(
                "CASE WHEN l_shipdate >= o_orderdate + INTERVAL 90 DAY THEN 'LATE' "
                "WHEN l_shipdate >= o_orderdate + INTERVAL 30 DAY THEN 'SLOW' "
                "ELSE 'FAST' END"
            ).alias("ship_bucket"),
            F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").alias("is_high"),
        )
        .groupBy("ship_bucket")
        .agg(
            F.sum(F.when(F.col("is_high"), 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(F.col("is_high"), 0).otherwise(1)).alias("low_line_count"),
        )
    )


@register(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no, SUM({_REV}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 analogue: supplier(s) with max quarterly revenue. The scalar
    max is a broadcast 1-row aggregate; equality on exact decimals."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1996-04-01 00:00:00'"))
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.expr(f"SUM({_REV})").alias("total_rev")
    )
    top = revenue.agg(F.max("total_rev").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey", "s_name",
            F.col("total_rev").cast("double").alias("total_revenue"),
        )
    )


@register(
    "q16_supplier_count",
    oracle="""
    WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM ps JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
      AND p_size IN (1, 2, 3, 4, 5)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 analogue: distinct supplier counts per (brand, type, size),
    excluding negative-balance suppliers (complaint stand-in). The derived
    ps relation dedups map-side before the part join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 2, 3, 4, 5))
    )
    bad = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    ps = li.select("l_partkey", "l_suppkey").distinct()
    return (
        ps.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q20_excess_suppliers",
    oracle="""
    SELECT s_name, CAST(s_acctbal AS DOUBLE) AS acctbal
    FROM supplier
    WHERE s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_5')
      AND s_suppkey IN (
        SELECT l_suppkey FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE p_type = 'PROMO'
          AND l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 50
      )
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 analogue: NATION_5 suppliers who shipped > 50 units of PROMO
    parts in 1997. Two stacked semi-joins; the heavy side aggregates first."""
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_5")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
        & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1998-01-01 00:00:00'"))
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    heavy = (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.expr("SUM(CAST(l_quantity AS DECIMAL(12,2)))").alias("total_qty"))
        .filter(F.col("total_qty") > 50)
        .select("l_suppkey")
    )
    return (
        s.join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi")
        .join(F.broadcast(heavy), F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("acctbal"))
    )


@register(
    "q21_waiting_supplier",
    oracle="""
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F'
      AND l1.l_shipdate >= o_orderdate + INTERVAL 90 DAY
      AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_7')
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_shipdate >= o_orderdate + INTERVAL 90 DAY
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 analogue: suppliers who were the sole late shipper on
    multi-supplier finalized orders.

    The EXISTS / NOT-EXISTS pair collapses into one per-order aggregate:
    an order qualifies for supplier S iff it has >= 2 distinct suppliers and
    exactly one distinct LATE supplier (S itself, guaranteed because the
    counted row is late). One lineitem⨝orders shuffle + one per-order agg
    replaces two correlated self-joins — at 100 TB this halves the scan and
    avoids the skew of orderkey self-joins.
    """
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_7")
    lo = li.join(o, F.col("l_orderkey") == F.col("o_orderkey")).withColumn(
        "is_late", F.expr("l_shipdate >= o_orderdate + INTERVAL 90 DAY")
    )
    per_order = lo.groupBy("l_orderkey").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct(F.when(F.col("is_late"), F.col("l_suppkey"))).alias("n_late_supp"),
    ).filter((F.col("n_supp") >= 2) & (F.col("n_late_supp") == 1)).select(
        F.col("l_orderkey").alias("ok")
    )
    supp_n7 = s.join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"), "left_semi"
    ).select("s_suppkey", "s_name")
    return (
        lo.filter(F.col("is_late"))
        .join(per_order, F.col("l_orderkey") == F.col("ok"))
        .join(F.broadcast(supp_n7), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
