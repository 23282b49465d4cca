"""ClickHouse-dialect frontend as a driver-checked query: the exact query a
reference user would have run against their ClickHouse, executed on Spark
via `frontend/ch_dialect.py`, oracle-checked against hand-written ANSI SQL.

Registered after llm_advanced (last import in queries/__init__.py) so it
queues behind the existing never-driver-checked block.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from chainhouse_spark.frontend import ch_sql
from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import register_views

# What a ClickHouse user actually writes: PREWHERE, toStartOfHour, agg
# combinators, toDecimal64 for exact money, uniqExact, a FORMAT tail.
_CH_SQL = """
    SELECT toStartOfHour(ts) AS hour,
           countIf(event_type = 'purchase') AS purchases,
           toFloat64(sumIf(toDecimal64(value, 2), event_type = 'purchase'))
               AS purchase_value,
           uniqExact(user_id) AS users,
           multiIf(countIf(event_type = 'error') > 5, 'noisy',
                   countIf(event_type = 'error') > 0, 'some', 'clean')
               AS error_band
    FROM events
    PREWHERE event_type != 'view'
    GROUP BY hour
    FORMAT TabSeparated
"""


@register(
    "ch_dialect_frontend",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour,
           COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchases,
           CAST(SUM(CASE WHEN event_type = 'purchase'
                         THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
               AS purchase_value,
           COUNT(DISTINCT user_id) AS users,
           CASE WHEN COUNT(CASE WHEN event_type = 'error' THEN 1 END) > 5
                    THEN 'noisy'
                WHEN COUNT(CASE WHEN event_type = 'error' THEN 1 END) > 0
                    THEN 'some'
                ELSE 'clean' END AS error_band
    FROM events
    WHERE event_type != 'view'
    GROUP BY date_trunc('hour', ts)
    """,
)
def ch_dialect_frontend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A ClickHouse-dialect query (PREWHERE / toStartOfHour / countIf /
    sumIf / toDecimal64 / uniqExact / multiIf / FORMAT tail) translated by
    `translate_ch_sql` and executed by spark.sql — dialect-level parity
    with the reference's actual user-facing SQL surface."""
    register_views(spark, sf_dir)
    return ch_sql(spark, _CH_SQL)
