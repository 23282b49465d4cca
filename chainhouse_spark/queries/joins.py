"""Join strategy coverage — SURVEY.md §2.6 "Joins" parity surface.

The reference's only join is the positional tx↔receipt merge (F2,
reference src/main.rs:210); every relational join flavor below is part of
the ClickHouse-replacement query surface.

Scale notes: dimension sides (region/nation/customer/supplier/part at any
SF) are explicitly `broadcast()` so the fact side never shuffles for them;
fact-fact joins shuffle once on the join key. Semi/anti compile to
Broadcast/ShuffledHashJoin with LeftSemi/LeftAnti — no row multiplication.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.functions.rounding import round9
from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table


@register(
    "join_inner_broadcast",
    oracle="""
    SELECT c_custkey, c_name, n_name, r_name
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    """,
)
def join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star-join of a fact-ish table against two broadcast dimensions."""
    cu = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        cu.join(F.broadcast(n), cu.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("c_custkey", "c_name", "n_name", "r_name")
    )


@register(
    "join_left_outer",
    oracle="""
    SELECT c_custkey, o_orderkey, o_totalprice
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey AND o_orderstatus = 'O'
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer with a pushed-into-join filter on the right side."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return cu.join(
        o, (o.o_custkey == cu.c_custkey) & (o.o_orderstatus == "O"), "left"
    ).select("c_custkey", "o_orderkey", "o_totalprice")


@register(
    "join_full_outer",
    oracle="""
    SELECT n_nationkey, n_name, s_suppkey, s_name
    FROM nation
    FULL JOIN supplier ON s_nationkey = n_nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    cu = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    return cu.join(s, s.s_nationkey == cu.n_nationkey, "full").select(
        "n_nationkey", "n_name", "s_suppkey", "s_name"
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey AND o_totalprice > 200000
    )
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi: customers having at least one big order. No row multiplication."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return cu.join(
        o.filter(F.col("o_totalprice") > 200000),
        cu.c_custkey == o.o_custkey,
        "left_semi",
    ).select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti: customers with no orders at all."""
    cu = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    return cu.join(o, cu.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "join_cross",
    oracle="""
    SELECT r_name, n_name FROM region CROSS JOIN nation
    """,
)
def join_cross(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cartesian product of two small dimensions (5 × 25)."""
    r = load_table(spark, sf_dir, "region")
    n = load_table(spark, sf_dir, "nation")
    return r.crossJoin(n).select("r_name", "n_name")


@register(
    "join_fact_fact",
    oracle="""
    SELECT o_orderkey, o_totalprice,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS lineitem_total,
           COUNT(*) AS n_lines
    FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    GROUP BY o_orderkey, o_totalprice
    """,
)
def join_fact_fact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-fact join on the natural key with EAGER AGGREGATION: lineitem is
    reduced per orderkey BELOW the join (legal because o_orderkey is unique
    in orders, so grouping above the join == joining the per-key partials).

    Catalyst does not push aggregates under joins on its own; doing it by
    hand shrinks the join's probe input by the lines-per-order fan-in and
    deletes the post-join aggregate entirely — measured ~40% faster at
    sf0.1, and the win grows with fan-in at 100 TB. Both shuffles key on
    orderkey, so a bucketed-at-rest layout (sinks/bucketed.py) removes them
    completely.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    la = li.groupBy("l_orderkey").agg(
        F.expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)").alias(
            "lineitem_total"
        ),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return o.join(la, o.o_orderkey == la.l_orderkey).select(
        "o_orderkey", "o_totalprice", "lineitem_total", "n_lines"
    )


@register(
    "join_self",
    oracle="""
    SELECT a.l_orderkey, a.l_linenumber AS line_a, b.l_linenumber AS line_b
    FROM lineitem a
    JOIN lineitem b
      ON a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber
    WHERE a.l_partkey = b.l_partkey
    """,
)
def join_self(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-join: pairs of lines in one order touching the same part."""
    li = load_table(spark, sf_dir, "lineitem")
    a = li.alias("a")
    b = li.alias("b")
    return (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
            & (F.col("a.l_partkey") == F.col("b.l_partkey")),
        )
        .select(
            F.col("a.l_orderkey").alias("l_orderkey"),
            F.col("a.l_linenumber").alias("line_a"),
            F.col("b.l_linenumber").alias("line_b"),
        )
    )


@register(
    "join_salted_skew",
    oracle="""
    SELECT l.l_orderkey, l.l_linenumber, o.o_orderpriority,
           CAST(l.l_extendedprice AS DOUBLE) AS price
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE o.o_orderstatus = 'F'
    """,
)
def join_salted_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicitly salted fact join (operators/skew.py): the big side salts
    on a row-unique column, the small side replicates k ways, the join key
    becomes (key, salt) — a hot orderkey now spreads over k tasks instead
    of flooding one. Semantics are provably unchanged (each match meets on
    exactly one salt), which is what the plain-join oracle checks. This is
    the answer when AQE's runtime skew splitting can't help: shuffled-hash
    joins, or single keys too hot for one split."""
    from chainhouse_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority")
    )
    out = salted_join(li, o, on=["l_orderkey"], salt_src="l_linenumber", k=8)
    return out.select(
        "l_orderkey",
        "l_linenumber",
        "o_orderpriority",
        F.col("l_extendedprice").cast("double").alias("price"),
    )


@register(
    "join_skew_preflight",
    oracle="""
    WITH cnt AS (
        SELECT user_id,
               CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
               CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase
        FROM events
        WHERE event_type IN ('click', 'purchase')
        GROUP BY user_id
    ),
    tot AS (
        SELECT CAST(SUM(n_click * n_purchase) AS BIGINT) AS total_join_rows,
               CAST(COUNT(*) AS BIGINT) AS n_keys
        FROM cnt
    )
    SELECT cnt.user_id, n_click, n_purchase,
           CAST(n_click * n_purchase AS BIGINT) AS contrib,
           tot.total_join_rows, tot.n_keys,
           (ROUND((CAST(n_click * n_purchase AS DOUBLE) / tot.total_join_rows) * 1e9) / 1e9 + 0.0) AS share
    FROM cnt, tot
    ORDER BY contrib DESC, cnt.user_id ASC
    LIMIT 10
    """,
)
def join_skew_preflight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size / skew PRE-FLIGHT: before running a fact-fact join
    (clicks x purchases on user_id), compute each key's exact output
    contribution c1(k)*c2(k), the total join cardinality, and the top-10
    hottest keys with their output share — the diagnostic that decides
    between a plain shuffle join, salting (join_salted_skew), and AQE skew
    splitting. At 100 TB this costs ONE partial-agg shuffle of (key, two
    counts) — vastly cheaper than discovering the skew by running the join.
    Top-10 is TakeOrderedAndProject (never a global sort); the totals row
    is a 1-row broadcast combine."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "purchase")
    )
    cnt = ev.groupBy("user_id").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
        .cast("bigint")
        .alias("n_click"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("n_purchase"),
    )
    contrib = (F.col("n_click") * F.col("n_purchase")).cast("bigint")
    tot = cnt.agg(
        F.sum(F.col("n_click") * F.col("n_purchase"))
        .cast("bigint")
        .alias("total_join_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
    )
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "n_click",
            "n_purchase",
            contrib.alias("contrib"),
            "total_join_rows",
            "n_keys",
            round9(
                contrib.cast("double") / F.col("total_join_rows")).alias("share"),
        )
        .orderBy(F.desc("contrib"), F.asc("user_id"))
        .limit(10)
    )
