"""SQL-frontend passthrough: one ANSI-SQL string, executed verbatim by BOTH
spark.sql() (over registered views) and the DuckDB oracle.

The reference's entire query surface is "whatever SQL the store runs"
(SURVEY.md §2.6); this query is the most direct proof of that parity —
no DataFrame translation at all, the dialect-shared text IS the program.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import register_views

# Strict dialect-shared subset: ANSI joins, TIMESTAMP literals, decimal
# casts, window function, CASE — identical bytes run on both engines.
_SQL = """
    SELECT n_name,
           o_orderpriority,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price,
           COUNT(*) AS n_orders,
           CAST(RANK() OVER (
               PARTITION BY n_name
               ORDER BY CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) DESC,
                        o_orderpriority
           ) AS INT) AS priority_rank,
           CASE WHEN COUNT(*) > 100 THEN 'high' ELSE 'low' END AS volume_class
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name, o_orderpriority
"""


@register("sql_frontend_passthrough", oracle=_SQL)
def sql_frontend_passthrough(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the oracle's exact SQL text through spark.sql() over the
    registered table views — frontend parity with zero translation."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL)


# Recursive CTE (Spark 4 native): a generated month spine joined to order
# totals — identical bytes on both engines. The recursion is depth-bounded
# (24 iterations) and the per-step relation is one row, so the Spark
# execution is 24 tiny local steps + one aggregate over orders: the
# recursive part never scans the fact table.
_SQL_RECURSIVE = """
    WITH RECURSIVE months(m) AS (
        SELECT TIMESTAMP '1995-01-01 00:00:00'
        UNION ALL
        SELECT m + INTERVAL 1 MONTH FROM months
        WHERE m < TIMESTAMP '1996-12-01 00:00:00'
    )
    SELECT m AS month,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total_price
    FROM months
    LEFT JOIN orders ON date_trunc('month', o_orderdate) = m
    GROUP BY m
"""


@register("sql_recursive_cte_spine", oracle=_SQL_RECURSIVE)
def sql_recursive_cte_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE through spark.sql(): a 24-month spine built by
    recursion, left-joined to monthly order totals (months with no orders
    survive as zero rows). Proof that the recursive-SQL surface of the
    oracle engines is available natively on Spark 4."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_RECURSIVE)


# GROUP BY ALL / ORDER BY ALL — the modern analyst-SQL ergonomics both
# engines added independently (Spark 4, DuckDB): every non-aggregate select
# item becomes a group key, orderable without restating the list. Identical
# bytes on both engines; the ordering keys are the full grouped output so
# the result is total-ordered and hash-stable.
_SQL_GROUP_BY_ALL = """
    SELECT l_returnflag,
           l_linestatus,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
    FROM lineitem
    GROUP BY ALL
    ORDER BY ALL
"""


@register("sql_group_by_all", oracle=_SQL_GROUP_BY_ALL)
def sql_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL / ORDER BY ALL passthrough — dialect-shared modern SQL
    ergonomics, one text on both engines."""
    register_views(spark, sf_dir)
    return spark.sql(_SQL_GROUP_BY_ALL)
