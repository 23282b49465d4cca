"""Collection-valued query surface: set algebra over aggregated arrays and
positional zip/explode round-trips.

ClickHouse exposes groupUniqArray + arrayIntersect/arrayConcat/arrayFilter
over the tables the reference provisions (SURVEY.md §2.6); the Spark twins
are collect_set + array_intersect/array_union/array_except. The positional
zip-explode query is the F2 operator from the ETL core (SURVEY.md §2.3,
reference `src/main.rs:210` — `receipts[transaction_index]`) expressed as a
standalone query so its semantics are oracle-checked against a window
formulation, not just golden-tested.

All arrays are sorted before comparison — set results have no inherent
order, and both engines agree after an explicit sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table


@register(
    "array_set_algebra",
    oracle="""
    WITH ns AS (
        SELECT n_regionkey,
               list_sort(list_distinct(list(n_name))) AS all_nations
        FROM nation GROUP BY n_regionkey
    ),
    sn AS (
        SELECT n_regionkey,
               list_sort(list_distinct(list(n_name))) AS supp_nations
        FROM (
            SELECT DISTINCT n.n_regionkey, n.n_name
            FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
            WHERE s.s_acctbal > 9000.0
        ) GROUP BY n_regionkey
    )
    SELECT
        ns.n_regionkey,
        len(ns.all_nations) AS n_nations,
        -- coalesce('') twice: DuckDB array_to_string([]) is NULL, Spark's ''
        coalesce(array_to_string(list_sort(list_intersect(ns.all_nations,
                  coalesce(sn.supp_nations, CAST([] AS VARCHAR[])))), ','), '') AS with_rich_supplier,
        coalesce(array_to_string(list_filter(ns.all_nations,
                    x -> NOT list_contains(coalesce(sn.supp_nations, CAST([] AS VARCHAR[])), x)), ','), '')
          AS without_rich_supplier,
        len(list_distinct(list_concat(ns.all_nations,
                  coalesce(sn.supp_nations, CAST([] AS VARCHAR[]))))) AS n_union
    FROM ns LEFT JOIN sn ON ns.n_regionkey = sn.n_regionkey
    """,
)
def array_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set algebra between two grouped collect_sets: nations per region vs
    nations having a high-balance supplier — intersect / except / union at
    the array level (ClickHouse groupUniqArray + arrayIntersect parity).
    Both inputs aggregate to |regions| rows before the join, so the join is
    a broadcast of a handful of rows no matter the fact-side scale. Array
    outputs serialize via array_join — the driver canonicalizer cannot
    hash list cells (CORRECTNESS_r04)."""
    n = load_table(spark, sf_dir, "nation")
    s = load_table(spark, sf_dir, "supplier")
    ns = n.groupBy("n_regionkey").agg(
        F.sort_array(F.collect_set("n_name")).alias("all_nations")
    )
    sn = (
        s.filter(F.col("s_acctbal") > 9000.0)
        .join(n, s["s_nationkey"] == n["n_nationkey"])
        .select("n_regionkey", "n_name")
        .distinct()
        .groupBy("n_regionkey")
        .agg(F.sort_array(F.collect_set("n_name")).alias("supp_nations"))
    )
    empty = F.array().cast("array<string>")
    supp = F.coalesce(F.col("supp_nations"), empty)
    return ns.join(sn, "n_regionkey", "left").select(
        "n_regionkey",
        F.size("all_nations").alias("n_nations"),
        F.array_join(
            F.array_sort(F.array_intersect("all_nations", supp)), ","
        ).alias("with_rich_supplier"),
        F.array_join(F.array_except("all_nations", supp), ",").alias(
            "without_rich_supplier"
        ),
        F.size(F.array_union("all_nations", supp)).alias("n_union"),
    )


@register(
    "array_zip_positional",
    oracle="""
    SELECT l_orderkey,
           CAST(ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                   ORDER BY l_linenumber, l_partkey) - 1
                AS INT) AS pos,
           l_partkey
    FROM lineitem
    """,
)
def array_zip_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The F2 positional-join core (`receipts[transaction_index]`,
    reference src/main.rs:210) as a query: collect each order's lines sorted
    by line number, take the part keys positionally, posexplode back out.
    The oracle states the same semantics as a window row_number — proving
    collect/sort/posexplode positions agree with ordered enumeration."""
    li = load_table(spark, sf_dir, "lineitem")
    arrs = li.groupBy("l_orderkey").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(l_linenumber, l_partkey))),"
            " s -> s.l_partkey)"
        ).alias("parts")
    )
    return arrs.select(
        "l_orderkey", F.posexplode("parts").alias("pos", "l_partkey")
    )
