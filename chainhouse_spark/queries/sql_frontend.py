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
