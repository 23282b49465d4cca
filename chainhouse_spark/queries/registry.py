"""Registry mapping query name -> (callable(spark, sf_dir) -> DataFrame,
optional DuckDB oracle SQL).

Contract (driver, __spark_entry__.py): every query gets an entry in
``queries()``; SQL-expressible ones also get the equivalent ANSI SQL in
``oracle_sql()``. Column names must match exactly between the Spark result
and the oracle result (the driver sorts columns by name and hashes values).

Determinism rules used throughout the query modules so that value-hashes
match DuckDB bit-for-bit:
  - Aggregates over DOUBLE columns are computed in DECIMAL (exact, order-
    insensitive) and only cast to DOUBLE at the end — float summation order
    differs between engines, decimal arithmetic does not.
  - Averages are expressed as CAST(sum AS DOUBLE) / count (one float
    division, deterministic) rather than avg() (engine-specific).
  - Cross-engine hashing uses md5 (identical everywhere), never engine
    hash functions (xxhash64/murmur differ).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: Optional[str] = None):
    """Decorator: register a query under `name` with an optional DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
