"""Subquery coverage — IN / EXISTS / scalar / correlated subqueries, plus
pivot. Expressed through `spark.sql` over registered views (the reference's
query-facing contract is SQL over its four tables; same surface here —
SURVEY.md §2.6 "SQL frontend").

Catalyst decorrelates the correlated forms into joins (RewriteCorrelated
ScalarSubquery / RewritePredicateSubquery), so at 100 TB these execute as
ordinary shuffled/broadcast joins, not per-row probes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table


def _views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@register(
    "subquery_in",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
    """,
)
def subquery_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'MACHINERY')
        """
    )


@register(
    "subquery_not_in",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
    """,
)
def subquery_not_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "orders", "customer")
    return spark.sql(
        """
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        """
    )


@register(
    "subquery_exists_correlated",
    oracle="""
    SELECT p_partkey, p_name
    FROM part
    WHERE EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_partkey = p_partkey AND l_quantity > 45
    )
    """,
)
def subquery_exists_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    _views(spark, sf_dir, "part", "lineitem")
    return spark.sql(
        """
        SELECT p_partkey, p_name
        FROM part
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_partkey = p_partkey AND l_quantity > 45
        )
        """
    )


@register(
    "subquery_scalar",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    WHERE o_totalprice > 2 * (
        SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
        FROM orders
    )
    """,
)
def subquery_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: orders above 2× the global mean price."""
    _views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_totalprice > 2 * (
            SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
            FROM orders
        )
        """
    )


@register(
    "subquery_correlated_scalar",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity
    FROM lineitem outer_li
    WHERE l_quantity > (
        SELECT 1.5 * (CAST(SUM(CAST(inner_li.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
        FROM lineitem inner_li
        WHERE inner_li.l_partkey = outer_li.l_partkey
    )
    """,
)
def subquery_correlated_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery (TPC-H Q17 shape): lines 1.5× above their
    part's mean quantity. Catalyst decorrelates into an aggregate + join."""
    _views(spark, sf_dir, "lineitem")
    return spark.sql(
        """
        SELECT l_orderkey, l_linenumber, l_quantity
        FROM lineitem outer_li
        WHERE l_quantity > (
            SELECT 1.5 * (CAST(SUM(CAST(inner_li.l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*))
            FROM lineitem inner_li
            WHERE inner_li.l_partkey = outer_li.l_partkey
        )
        """
    )


@register(
    "agg_pivot",
    oracle="""
    SELECT
        EXTRACT(YEAR FROM o_orderdate) AS order_year,
        CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS open_total,
        CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS closed_total,
        CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS pending_total
    FROM orders
    GROUP BY EXTRACT(YEAR FROM o_orderdate)
    """,
)
def agg_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation). Explicit value list keeps the
    output schema static — required both for the oracle and for plan
    stability at scale (no extra pass to discover pivot values)."""
    from pyspark.sql import functions as F

    o = load_table(spark, sf_dir, "orders")
    return (
        o.withColumn("order_year", F.year("o_orderdate").cast("long"))
        .groupBy("order_year")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE)"))
        .withColumnRenamed("O", "open_total")
        .withColumnRenamed("F", "closed_total")
        .withColumnRenamed("P", "pending_total")
    )


@register(
    "lateral_topk_per_customer",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM customer,
    LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 2
    ) t
    WHERE c_custkey < 300
    """,
)
def lateral_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery: each customer's 2 biggest orders —
    the per-row-subquery formulation of top-k-per-group. Spark plans the
    correlation as a join + ranking (same physical shape as the window
    form in windows.py::window_topn_per_group — the two surfaces converge,
    which is exactly why exposing both costs nothing at scale).
    """
    from chainhouse_spark.tables import register_views

    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c_custkey, o_orderkey, o_totalprice
        FROM customer,
        LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders
          WHERE o_custkey = c_custkey
          ORDER BY o_totalprice DESC, o_orderkey
          LIMIT 2
        ) t
        WHERE c_custkey < 300
        """
    )
