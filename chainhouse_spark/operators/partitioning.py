"""Partition-shape helpers for compute-heavy operators.

A tiny input file scans as one partition, and Spark never re-splits it — so
an operator that multiplies work per row (shingle explosion × 16 hashes,
binary decode) runs single-threaded no matter how many cores exist. spread()
widens such inputs to cluster parallelism; on real-scale inputs (partitions
>= cores) it is the identity, so the extra shuffle only ever moves data that
is small by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame, *key_cols: str) -> DataFrame:
    """Repartition `df` up to the cluster's default parallelism if (and only
    if) it currently has fewer partitions. Hash-keyed when key columns are
    given (deterministic placement), round-robin otherwise. Never shrinks."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target, *key_cols) if key_cols else df.repartition(target)
