"""Temporal join queries over the events stream: as-of join (most recent
preceding event) and banded range join — oracle'd against DuckDB's native
ASOF JOIN / inequality join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.operators.asof import asof_join, range_join
from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table


@register(
    "asof_purchase_click",
    oracle="""
    SELECT p.event_id AS purchase_id,
           p.user_id,
           p.ts AS purchase_ts,
           c.event_id AS click_id,
           c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every purchase, the most recent click by the same user at or
    before it (classic attribution as-of join)."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("ts").alias("ts"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"),
    )
    return asof_join(
        purchases.withColumnRenamed("purchase_ts", "ts"),
        clicks,
        by="user_id",
        ts="ts",
        right_payload=["click_id", "click_ts"],
        tie_col="click_id",
    ).select(
        "purchase_id",
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "click_id",
        "click_ts",
    )


@register(
    "range_join_sessions",
    oracle="""
    SELECT c.event_id AS click_id,
           p.event_id AS purchase_id,
           c.user_id,
           CAST(date_diff('second', c.ts, p.ts) AS BIGINT) AS secs_between
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts >= c.ts
     AND p.ts <= c.ts + INTERVAL 1 DAY
    """,
)
def range_join_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Click→purchase pairs within 24h for the same user (banded range join,
    equi-keyed on user so it never goes nested-loop)."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click")
    purchases = e.filter(F.col("event_type") == "purchase")
    joined = range_join(
        clicks, purchases, by="user_id", left_ts="ts", right_ts="ts",
        lower_sec=0, upper_sec=86400,
    )
    return joined.select(
        F.col("l.event_id").alias("click_id"),
        F.col("r.event_id").alias("purchase_id"),
        F.col("l.user_id").alias("user_id"),
        (
            F.unix_seconds(F.col("r.ts").cast("timestamp"))
            - F.unix_seconds(F.col("l.ts").cast("timestamp"))
        ).alias("secs_between"),
    )
