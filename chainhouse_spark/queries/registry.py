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

# Prefix for oracles that OOM'd in the memory-capped driver sandbox
# (CORRECTNESS_r02): cap DuckDB's own footprint, allow spilling instead of
# failing allocation, and skip result-order bookkeeping. A multi-statement
# oracle returns the final SELECT's result through duckdb's execute()/
# sql()/query() APIs alike (verified against all three).
FRUGAL_ORACLE = (
    "SET threads=2; SET memory_limit='500MB'; "
    "SET temp_directory='/tmp/duckdb_oracle_spill'; "
    "SET preserve_insertion_order=false;\n"
)


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
