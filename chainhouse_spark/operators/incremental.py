"""Incremental aggregate maintenance — the AggregatingMergeTree /
continuous-aggregate pattern from the reference's ClickHouse engine family
(ReplacingMergeTree DDL at reference src/main.rs:87,122,139,156; the
aggregating sibling is what a ClickHouse user reaches for next).

The idea: keep per-key PARTIAL aggregate state (sum / count / min / max as
plain columns), produced independently per ingest batch or per partition,
then MERGE states associatively instead of rescanning history. At 100 TB
this is the difference between "aggregate 100 TB nightly" and "aggregate
yesterday's 300 GB and merge one small state table":

  - `partial_state` is one partial-agg pass over the new slice only.
  - `merge_states` is a union + groupBy over STATE rows (|keys| rows per
    state, not |fact| rows) — the shuffle moves kilobytes per key.
  - Every combine function is associative + commutative (sum, count-as-sum,
    min, max), so merge order and batch boundaries cannot change the result.
  - Non-decomposable finals (avg) are derived at read time in `finalize`.

Exact sums: the caller passes the measure as an EXACT type (decimal or
integer — e.g. the money doubles cast to DECIMAL(12,2), which is lossless
for 2-dp values) so partial/merge order is irrelevant down to the bit
(float sums are order-dependent; the whole point of state merging is that
grouping of batches must not matter).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def partial_state(df: DataFrame, keys: list[str], measure: Column) -> DataFrame:
    """One batch/partition's partial aggregate state for `measure` (an
    exact-typed Column expression).

    State schema: keys..., cnt, sum_m, min_m, max_m.
    """
    m = measure.alias("_m")
    return df.select(*keys, m).groupBy(*keys).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("_m").alias("sum_m"),
        F.min("_m").alias("min_m"),
        F.max("_m").alias("max_m"),
    )


def merge_states(states: list[DataFrame], keys: list[str]) -> DataFrame:
    """Associatively merge partial states: sums add, counts add, min/max
    fold. Input is state rows (small), so this shuffle is key-cardinality
    sized regardless of how much raw data each state summarizes."""
    unioned = reduce(DataFrame.unionByName, states)
    return unioned.groupBy(*keys).agg(
        F.sum("cnt").alias("cnt"),
        F.sum("sum_m").alias("sum_m"),
        F.min("min_m").alias("min_m"),
        F.max("max_m").alias("max_m"),
    )


def finalize(state: DataFrame) -> DataFrame:
    """Derive read-time finals from state columns (avg = sum/cnt as one
    float division — deterministic)."""
    return state.select(
        *[c for c in state.columns if c not in ("cnt", "sum_m", "min_m", "max_m")],
        F.col("cnt").alias("n_rows"),
        F.col("sum_m").alias("sum_val"),
        (F.col("sum_m").cast("double") / F.col("cnt")).alias("avg_val"),
        F.col("min_m").alias("min_val"),
        F.col("max_m").alias("max_val"),
    )
