"""Incremental-aggregation query: AggregatingMergeTree-style state merge
(see operators/incremental.py). Three disjoint date slices of `orders` are
aggregated INDEPENDENTLY, their partial states merged associatively, and the
finals derived at read time — the oracle aggregates the whole table in one
pass and must match bit-for-bit.

This is the continuous-aggregate maintenance path: at 100 TB you aggregate
only the new slice and merge kilobyte-sized state, never rescanning history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.operators.incremental import (
    finalize,
    merge_states,
    partial_state,
)
from chainhouse_spark.queries.registry import exempt_round9, register
from chainhouse_spark.tables import load_table

_KEYS = ["o_orderpriority"]
_MEASURE = "CAST(o_totalprice AS DECIMAL(12,2))"


@register(
    "incremental_agg_merge",
    oracle=f"""
    SELECT o_orderpriority,
           count(*) AS n_rows,
           CAST(SUM({_MEASURE}) AS DOUBLE) AS sum_val,
           CAST(SUM({_MEASURE}) AS DOUBLE) / count(*) AS avg_val,
           CAST(MIN({_MEASURE}) AS DOUBLE) AS min_val,
           CAST(MAX({_MEASURE}) AS DOUBLE) AS max_val
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def incremental_agg_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate three disjoint slices independently, merge the partial
    states, finalize — proves the state algebra is associative (the oracle
    is a single-pass GROUP BY over the union of the slices)."""
    o = load_table(spark, sf_dir, "orders")
    measure = F.expr(_MEASURE)
    slices = [
        o.filter(F.year("o_orderdate") <= 1993),
        o.filter((F.year("o_orderdate") > 1993) & (F.year("o_orderdate") <= 1995)),
        o.filter(F.year("o_orderdate") > 1995),
    ]
    states = [partial_state(s, _KEYS, measure) for s in slices]
    merged = merge_states(states, _KEYS)
    fin = finalize(merged)
    return fin.select(
        "o_orderpriority",
        "n_rows",
        F.col("sum_val").cast("double").alias("sum_val"),
        "avg_val",
        F.col("min_val").cast("double").alias("min_val"),
        F.col("max_val").cast("double").alias("max_val"),
    )


# Round-at-9 exemption (registry.ROUND9_EXEMPT): value-scale mean ~2.5e5,
# past the cross-engine ROUND agreement zone — protected by the exact
# decimal sum merge with one shared final division.
exempt_round9("incremental_agg_merge", {
    "avg_val": "value-scale mean (~2.5e5 at sf0.01)",
})
