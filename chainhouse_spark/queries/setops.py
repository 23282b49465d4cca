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


@register(
    "setop_symmetric_difference",
    oracle="""
    WITH clickers AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'click'
          AND ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
    ),
    buyers AS (
        SELECT DISTINCT user_id FROM events
        WHERE event_type = 'purchase'
          AND ts >= TIMESTAMP '2024-01-15' AND ts < TIMESTAMP '2024-01-16'
    ),
    sym AS (
        SELECT user_id, 'click_only' AS side FROM (
            SELECT user_id FROM clickers EXCEPT SELECT user_id FROM buyers
        )
        UNION ALL
        SELECT user_id, 'purchase_only' AS side FROM (
            SELECT user_id FROM buyers EXCEPT SELECT user_id FROM clickers
        )
    )
    SELECT user_id, side FROM sym
    """,
)
def setop_symmetric_difference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric difference with provenance: users who clicked but never
    purchased, and users who purchased without a single click — the two
    one-sided audiences a remarketing team actually targets. Completes
    the set-operation family (union/intersect/except and their ALL
    variants are registered above). Both EXCEPT branches reuse the same
    two distinct-aggregated inputs; at scale this is two user-keyed
    shuffles of already-deduplicated keys, and the union is free."""
    e = load_table(spark, sf_dir, "events")
    day = (F.col("ts") >= F.lit("2024-01-15").cast("timestamp_ntz")) & (
        F.col("ts") < F.lit("2024-01-16").cast("timestamp_ntz")
    )
    clickers = (
        e.filter((F.col("event_type") == "click") & day)
        .select("user_id")
        .distinct()
    )
    buyers = (
        e.filter((F.col("event_type") == "purchase") & day)
        .select("user_id")
        .distinct()
    )
    return (
        clickers.exceptAll(buyers).select("user_id", F.lit("click_only").alias("side"))
        .unionByName(
            buyers.exceptAll(clickers).select(
                "user_id", F.lit("purchase_only").alias("side")
            )
        )
    )
