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


# Round-3 dialect widening exercised end-to-end: JSON extraction from the
# props column, match() regex, 15-minute toStartOfInterval buckets, plural
# quantiles, empty/array handling via extractAll.
_CH_SQL_JSON = """
    SELECT toStartOfInterval(ts, INTERVAL 15 MINUTE) AS bucket,
           countIf(JSONExtractInt(props, 'k') >= 50) AS high_k,
           toFloat64(sumIf(toDecimal64(value, 2),
                           JSONHas(props, 'k'))) AS keyed_value,
           countIf(match(event_type, '^(click|purchase)$')) AS click_or_buy,
           uniqExact(JSONExtractInt(props, 'k')) AS distinct_k
    FROM events
    PREWHERE notEmpty(extractAll(props, '\\\\d+'))
    GROUP BY bucket
    SETTINGS max_threads = 8
"""


@register(
    "ch_dialect_json_buckets",
    oracle="""
    SELECT CAST(to_timestamp(FLOOR(epoch(ts) / 900) * 900) AS TIMESTAMP)
               AS bucket,
           COUNT(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                           >= 50 THEN 1 END) AS high_k,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.k') IS NOT NULL
                         THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE)
               AS keyed_value,
           COUNT(CASE WHEN regexp_matches(event_type, '^(click|purchase)$')
                      THEN 1 END) AS click_or_buy,
           COUNT(DISTINCT CAST(json_extract_string(props, '$.k') AS BIGINT))
               AS distinct_k
    FROM events
    WHERE len(regexp_extract_all(props, '\\d+')) > 0
    GROUP BY 1
    """,
)
def ch_dialect_json_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The round-3 dialect additions run end-to-end: JSONExtractInt/JSONHas
    over the props column, match() regex, toStartOfInterval 15-minute
    epoch-floor buckets, extractAll/notEmpty in PREWHERE, and a SETTINGS
    tail — all translated to one Spark SQL statement and hash-checked
    against hand-written ANSI."""
    register_views(spark, sf_dir)
    return ch_sql(spark, _CH_SQL_JSON)
