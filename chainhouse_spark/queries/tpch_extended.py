"""Extended TPC-H-style coverage over the synthetic star schema: semi/anti
join aggregates (q4, q22), multi-nation volume (q7), profit rollup (q9),
returned-item ranking (q10), distribution agg (q13), conditional share
(q14), correlated-average filter (q17), having + top-k (q18), disjunctive
predicate pushdown (q19).

Adaptations to the simplified schema (no partsupp / commitdate / phone):
q4 defines "late" as shipped >= 60 days after order date; q9 uses
p_retailprice as the cost term; q22's country code is c_nationkey.

Determinism: decimal-exact aggregation, single float division at the end,
deterministic tie-breaks on every top-k (registry.py rules).

Scale: dimensions (part/customer/nation) broadcast everywhere they appear;
fact-fact edges shuffle on their join key once; every semi/anti join is
expressed as such (no distinct-after-inner-join), so Catalyst plans
LeftSemi/LeftAnti with the fact side streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.queries.registry import exempt_round9, register
from chainhouse_spark.tables import load_table

_QTY = "CAST(l_quantity AS DECIMAL(12,2))"
_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
_DISC_F = "CAST(1 - l_discount AS DECIMAL(4,2))"
_REV = f"{_PRICE} * {_DISC_F}"
_BAL = "CAST(c_acctbal AS DECIMAL(12,2))"


@register(
    "q4_order_priority",
    oracle=f"""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey
          AND l_shipdate >= o_orderdate + INTERVAL 60 DAY
      )
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 analogue: priority counts for orders with a late line item
    (shipped >= 60 days after order date). Left-semi join on orderkey —
    lineitem never expands the orders side."""
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-01-01 00:00:00'"))
        & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") >= F.expr("o_orderdate + INTERVAL 60 DAY")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("order_count"))


@register(
    "q7_nation_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, yr, CAST(SUM(volume) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l_shipdate) AS yr, {_REV} AS volume
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, yr
    """,
)
def q7_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 analogue: bilateral trade volume by year. Both nation maps
    broadcast; the only shuffles are lineitem⨝orders and the final agg."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    cu = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nk"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nk"))
        .filter(
            ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
            | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
        )
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("yr"))
        .agg(F.expr(f"CAST(SUM({_REV}) AS DOUBLE)").alias("revenue"))
    )


@register(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, yr, CAST(SUM(amount) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation, year(o_orderdate) AS yr,
             {_REV} - CAST(p_retailprice AS DECIMAL(12,2)) * {_QTY} AS amount
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%e%'
    ) profit
    GROUP BY nation, yr
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 analogue (p_retailprice stands in for supply cost): profit
    by supplier nation and order year for parts matching a name pattern."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    s = load_table(spark, sf_dir, "supplier")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%e%"))
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("yr"))
        .agg(
            F.expr(
                f"CAST(SUM({_REV} - CAST(p_retailprice AS DECIMAL(12,2)) * {_QTY}) AS DOUBLE)"
            ).alias("sum_profit")
        )
    )


@register(
    "q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, CAST(SUM({_REV}) AS DOUBLE) AS revenue,
           c_acctbal, n_name
    FROM customer, orders, lineitem, nation
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_returnflag = 'R' AND c_nationkey = n_nationkey
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 analogue: top 20 customers by returned-item revenue in a
    quarter. TakeOrderedAndProject — no global sort materializes."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(
            o.filter(
                (F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '1996-10-01 00:00:00'"))
                & (F.col("o_orderdate") < F.expr("TIMESTAMP_NTZ '1997-01-01 00:00:00'"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.expr(f"CAST(SUM({_REV}) AS DOUBLE)").alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 analogue: two-level aggregation over a left outer join;
    COUNT(col) counts only matches, so customers with no orders land in the
    c_count=0 bucket."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "1-URGENT")
    return (
        cu.join(o, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
        .groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@register(
    "q14_promo_revenue",
    oracle=f"""
    SELECT (ROUND((100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV} ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(SUM({_REV}) AS DOUBLE)) * 1e9) / 1e9 + 0.0) AS promo_revenue
    FROM lineitem, part
    WHERE l_partkey = p_partkey
      AND l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 analogue: promo revenue share for one month. part is
    broadcast; both sums are decimal-exact, one float division at the end."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.expr("TIMESTAMP_NTZ '1996-09-01 00:00:00'"))
            & (F.col("l_shipdate") < F.expr("TIMESTAMP_NTZ '1996-10-01 00:00:00'"))
        )
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            F.expr(
                f"(ROUND((100.00 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_REV} "
                f"ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) "
                f"/ CAST(SUM({_REV}) AS DOUBLE)) * 1e9) / 1e9 + 0.0)"
            ).alias("promo_revenue")
        )
    )


@register(
    "q17_small_quantity_revenue",
    oracle=f"""
    SELECT CAST(SUM({_PRICE}) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (
      SELECT l_partkey AS pk,
             0.5 * (CAST(SUM({_QTY}) AS DOUBLE) / COUNT(*)) AS half_avg_qty
      FROM lineitem GROUP BY l_partkey
    ) pa ON pa.pk = l_partkey
    WHERE p_brand = 'Brand#23' AND l_quantity < half_avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 analogue: revenue of below-half-average-quantity line items
    for one brand. The per-part average is one decimal-exact aggregate
    (deterministic double) joined back on partkey."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    pa = (
        li.groupBy(F.col("l_partkey").alias("pk"))
        .agg(F.expr(f"0.5 * (CAST(SUM({_QTY}) AS DOUBLE) / COUNT(*))").alias("half_avg_qty"))
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(pa, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(F.expr(f"CAST(SUM({_PRICE}) AS DOUBLE) / 7.0").alias("avg_yearly"))
    )


@register(
    "q18_large_orders",
    oracle=f"""
    SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
           CAST(SUM({_QTY}) AS DOUBLE) AS total_qty
    FROM customer, orders, lineitem
    WHERE o_orderkey IN (
        SELECT l_orderkey FROM lineitem
        GROUP BY l_orderkey
        HAVING SUM({_QTY}) > 150
      )
      AND c_custkey = o_custkey AND o_orderkey = l_orderkey
    GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 analogue: customers behind the largest orders by total
    quantity. The HAVING subquery is a semi join on orderkey; quantities
    re-aggregate decimal-exact in the outer query."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.expr(f"SUM({_QTY})").alias("sq"))
        .filter(F.col("sq") > 150)
        .select(F.col("l_orderkey").alias("big_ok"))
    )
    return (
        li.join(big, F.col("l_orderkey") == F.col("big_ok"), "left_semi")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cu), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.expr(f"CAST(SUM({_QTY}) AS DOUBLE)").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


@register(
    "q19_disjunctive_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
    FROM lineitem, part
    WHERE p_partkey = l_partkey
      AND ((p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5  AND l_quantity BETWEEN 1 AND 11)
        OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
        OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30))
    """,
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 analogue: three-branch disjunctive predicate across the
    join. The part-side conjuncts (brand/size) are derivable per branch, so
    Catalyst pushes the brand/size union filter below the broadcast join."""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
    qty, brand, size = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((brand == "Brand#12") & size.between(1, 5) & qty.between(1, 11))
        | ((brand == "Brand#23") & size.between(1, 10) & qty.between(10, 20))
        | ((brand == "Brand#34") & size.between(1, 15) & qty.between(20, 30))
    )
    return j.filter(cond).agg(
        F.expr(f"CAST(SUM({_REV}) AS DOUBLE)").alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@register(
    "q22_idle_customers",
    oracle=f"""
    SELECT c_nationkey AS cntry, COUNT(*) AS numcust,
           CAST(SUM({_BAL}) AS DOUBLE) AS totacctbal
    FROM customer
    WHERE c_acctbal > (
        SELECT CAST(SUM({_BAL}) AS DOUBLE) / COUNT(*)
        FROM customer WHERE c_acctbal > 0.0
      )
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
)
def q22_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 analogue (nationkey as country code): wealthy customers who
    placed no order since 2000. Scalar subquery broadcasts one value; the NOT EXISTS is a
    left-anti join streaming the customer side."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    avg_bal = cu.filter(F.col("c_acctbal") > 0.0).agg(
        F.expr(f"CAST(SUM({_BAL}) AS DOUBLE) / COUNT(*)").alias("avg_bal")
    )
    return (
        cu.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(
            o.filter(F.col("o_orderdate") >= F.expr("TIMESTAMP_NTZ '2000-01-01 00:00:00'")),
            F.col("c_custkey") == F.col("o_custkey"),
            "left_anti",
        )
        .groupBy(F.col("c_nationkey").alias("cntry"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.expr(f"CAST(SUM({_BAL}) AS DOUBLE)").alias("totacctbal"),
        )
    )


# Round-at-9 exemption (registry.ROUND9_EXEMPT): Q17's avg_yearly is a
# revenue sum / 7 (~4e6 at sf0.01, grows linearly with data volume) —
# past the cross-engine ROUND agreement zone; protected by the exact
# decimal revenue sum with one shared final division.
exempt_round9("q17_small_quantity_revenue", {
    "avg_yearly": "revenue sum scale, grows with SF (~4e6 at sf0.01)",
})
