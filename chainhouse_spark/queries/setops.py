"""Set operations + sort/limit coverage — SURVEY.md §2.6.

UNION / UNION ALL / INTERSECT / EXCEPT (+ the ALL variants Spark exposes
as intersectAll/exceptAll, matched by DuckDB's INTERSECT ALL/EXCEPT ALL),
distinct, and deterministic global sort + limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table


def _buyers(spark, sf_dir):
    o = load_table(spark, sf_dir, "orders")
    return o.select(F.col("o_custkey").alias("custkey"))


def _high_balance(spark, sf_dir):
    c = load_table(spark, sf_dir, "customer")
    return c.filter(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("custkey"))


@register(
    "setop_union_distinct",
    oracle="""
    SELECT custkey FROM (
        SELECT o_custkey AS custkey FROM orders
        UNION
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    )
    """,
)
def setop_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _buyers(spark, sf_dir).union(_high_balance(spark, sf_dir)).distinct()


@register(
    "setop_union_all",
    oracle="""
    SELECT custkey, COUNT(*) AS n FROM (
        SELECT o_custkey AS custkey FROM orders
        UNION ALL
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    )
    GROUP BY custkey
    """,
)
def setop_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL preserves duplicates; aggregate to make the result compact."""
    return (
        _buyers(spark, sf_dir)
        .union(_high_balance(spark, sf_dir))
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "setop_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    """,
)
def setop_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _buyers(spark, sf_dir).intersect(_high_balance(spark, sf_dir))


@register(
    "setop_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
)
def setop_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _high_balance(spark, sf_dir).exceptAll(_buyers(spark, sf_dir)).distinct()


@register(
    "setop_except_all",
    oracle="""
    SELECT custkey, COUNT(*) AS n FROM (
        SELECT o_custkey AS custkey FROM orders
        EXCEPT ALL
        SELECT c_custkey AS custkey FROM customer
    )
    GROUP BY custkey
    """,
)
def setop_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag difference: each order beyond the first per customer survives."""
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    return (
        _buyers(spark, sf_dir)
        .exceptAll(c)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "sort_limit_topk",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: compiles to TakeOrderedAndProject (per-partition heaps +
    driver merge), never a full global sort."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderdate")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "setop_intersect_all",
    oracle="""
    SELECT custkey, COUNT(*) AS n FROM (
        SELECT o_custkey AS custkey FROM orders
        INTERSECT ALL
        SELECT l_suppkey AS custkey FROM lineitem
    )
    GROUP BY custkey
    """,
)
def setop_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag intersection (INTERSECT ALL — each key survives min(count_left,
    count_right) times), completing the multiset trio next to EXCEPT ALL
    and UNION ALL. Spark's intersectAll plans the same partial-count
    aggregate + join shape any engine uses; keys here overlap the
    custkey/suppkey id ranges so the multiset min is exercised on real
    multiplicities."""
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("custkey")
    )
    return (
        o.intersectAll(li)
        .groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
