"""Dimension-maintenance queries: SCD Type-2 history merge over the customer
dimension (operators/scd2.py). The update batch is synthesized
deterministically from the table itself so the query is self-contained:

  - customers in nations ≡ 0 (mod 5): balance +100  -> change (close + open)
  - customers in nations ≡ 1 (mod 5): same balance  -> no-op update
  - synthetic new keys (custkey + 10,000,000)       -> fresh inserts
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.operators.scd2 import scd2_apply
from chainhouse_spark.queries.registry import exempt_round9, register
from chainhouse_spark.tables import load_table

_T0 = "1995-01-01 00:00:00"
_T1 = "2000-01-01 00:00:00"


@register(
    "scd2_customer_merge",
    oracle=f"""
    WITH cur AS (
      SELECT c_custkey, c_acctbal,
             TIMESTAMP '{_T0}' AS valid_from,
             CAST(NULL AS TIMESTAMP) AS valid_to
      FROM customer
    ),
    chg AS (
      SELECT c_custkey, c_acctbal + 100 AS new_bal
      FROM customer WHERE c_nationkey % 5 = 0
    ),
    fresh AS (
      SELECT c_custkey + 10000000 AS c_custkey, 42.0 AS c_acctbal
      FROM customer WHERE c_nationkey % 5 = 2
    )
    SELECT c_custkey, c_acctbal, valid_from, valid_to
    FROM cur WHERE c_custkey NOT IN (SELECT c_custkey FROM chg)
    UNION ALL
    SELECT c.c_custkey, c.c_acctbal, c.valid_from, TIMESTAMP '{_T1}' AS valid_to
    FROM cur c JOIN chg USING (c_custkey)
    UNION ALL
    SELECT c_custkey, new_bal AS c_acctbal,
           TIMESTAMP '{_T1}' AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
    FROM chg
    UNION ALL
    SELECT c_custkey, c_acctbal,
           TIMESTAMP '{_T1}' AS valid_from, CAST(NULL AS TIMESTAMP) AS valid_to
    FROM fresh
    """,
)
def scd2_customer_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 merge: changed keys close-and-reopen, no-op updates pass through,
    new keys insert — the full output dimension table, hash-checked."""
    c = load_table(spark, sf_dir, "customer")
    cur = c.select(
        "c_custkey",
        "c_acctbal",
        F.expr(f"TIMESTAMP_NTZ '{_T0}'").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
    )
    upd = (
        c.filter(F.col("c_nationkey") % 5 == 0)
        .select("c_custkey", (F.col("c_acctbal") + 100).alias("c_acctbal"))
        .unionByName(
            c.filter(F.col("c_nationkey") % 5 == 1).select("c_custkey", "c_acctbal")
        )
        .unionByName(
            c.filter(F.col("c_nationkey") % 5 == 2).select(
                (F.col("c_custkey") + 10_000_000).alias("c_custkey"),
                F.lit(42.0).alias("c_acctbal"),
            )
        )
    )
    return scd2_apply(
        cur, upd, keys=["c_custkey"], attrs=["c_acctbal"], effective_ts=_T1
    )


@register(
    "cdc_snapshot_diff",
    oracle="""
    WITH old AS (
        SELECT o_orderkey, CAST(o_totalprice AS DECIMAL(14,2)) AS price
        FROM orders WHERE o_orderkey % 11 != 0
    ),
    new AS (
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 5 = 0
                    THEN CAST(o_totalprice AS DECIMAL(14,2)) * 2
                    ELSE CAST(o_totalprice AS DECIMAL(14,2)) END AS price
        FROM orders WHERE o_orderkey % 13 != 0
    )
    SELECT COALESCE(old.o_orderkey, new.o_orderkey) AS o_orderkey,
           CASE WHEN old.o_orderkey IS NULL THEN 'insert'
                WHEN new.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END AS change_type,
           CAST(old.price AS DOUBLE) AS old_price,
           CAST(new.price AS DOUBLE) AS new_price
    FROM old FULL OUTER JOIN new ON old.o_orderkey = new.o_orderkey
    WHERE old.o_orderkey IS NULL OR new.o_orderkey IS NULL
       OR old.price != new.price
    """,
)
def cdc_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot differencing (CDC without a log): two table versions
    full-outer-joined on the key, rows classified insert / delete / update,
    unchanged rows dropped. This is how a ReplacingMergeTree world computes
    what changed between loads when the source can't emit a changelog. The
    two snapshots here are deterministic slices/mutations of `orders` so
    both engines derive identical versions. Scale: one co-partitioned
    full-outer join on the key — with both snapshots bucketed on the key at
    rest the diff is shuffle-free; payload equality compares exact
    decimals, never floats."""
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(14,2)")
    old = o.filter(F.col("o_orderkey") % 11 != 0).select(
        "o_orderkey", price.alias("price")
    )
    new = o.filter(F.col("o_orderkey") % 13 != 0).select(
        "o_orderkey",
        F.when(F.col("o_orderkey") % 5 == 0, price * 2)
        .otherwise(price)
        .alias("price"),
    )
    j = old.alias("old").join(
        new.alias("new"),
        F.col("old.o_orderkey") == F.col("new.o_orderkey"),
        "full_outer",
    )
    return (
        j.select(
            F.coalesce(F.col("old.o_orderkey"), F.col("new.o_orderkey")).alias(
                "o_orderkey"
            ),
            F.when(F.col("old.o_orderkey").isNull(), F.lit("insert"))
            .when(F.col("new.o_orderkey").isNull(), F.lit("delete"))
            .otherwise(F.lit("update"))
            .alias("change_type"),
            F.col("old.price").cast("double").alias("old_price"),
            F.col("new.price").cast("double").alias("new_price"),
        )
        .filter(
            F.col("old_price").isNull()
            | F.col("new_price").isNull()
            | (F.col("old_price") != F.col("new_price"))
        )
    )


# Round-at-9 exemption (registry.ROUND9_EXEMPT): c_acctbal is a raw data
# column passed through (~1e4) — rounding would alter data semantics AND
# sits past the cross-engine ROUND agreement zone.
exempt_round9("scd2_customer_merge", {
    "c_acctbal": "raw data column passthrough (~1e4)",
})
