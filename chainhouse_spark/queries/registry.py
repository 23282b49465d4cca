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


# Round-at-9 convention (tests/compare.py, tools/float_convention_sweep.py):
# every float column a query emits is rounded at 9 decimal digits by
# association-identical formulas on BOTH the Spark and oracle sides, so a
# future re-association of one side cannot silently re-arm a last-ulp
# divergence (the round-7 ts_trend_slope_by_type class).
#
# HOW to round — use chainhouse_spark.functions.rounding (round9 for
# Columns, round9_sql for oracle SQL): the scheme is
# `ROUND(x * 1e9) / 1e9 + 0.0`, NOT plain ROUND(x, 9). Plain ROUND
# resolves 9th-digit ties differently per engine (Spark: decimal repr,
# DuckDB: binary product — measured 9/3M divergence even below |x|=1e3,
# plus a -0.0 class on tiny negatives); the product-space scheme makes
# both engines round the same double with the same tie rule, so agreement
# is deterministic (tests/test_round_convention.py pins this).
#
# CAVEAT — even scheme-B rounding is pointless for UNBOUNDED columns:
# once |x|*1e9 leaves the 2^53 integer range (|x| ≳ 9e6) rounding
# degenerates to identity, and plain ROUND would actively diverge there.
# Columns here are therefore deliberately left unrounded; their
# protection is the original rule (association-identical formulas on both
# sides), stated per-column below. The sweep and the pytest gate
# (tests/test_oracle_parity.py) treat these as documented exemptions.
ROUND9_EXEMPT: dict[str, dict[str, str]] = {}


def exempt_round9(name: str, cols: dict[str, str]) -> None:
    """Declare emitted float columns exempt from the round-at-9 convention.

    `cols` maps column name -> one-line reason (normally "magnitude can
    exceed ~1e6 at scale; ROUND itself diverges cross-engine there —
    kept association-identical instead"). Call next to the query's
    @register so the exemption lives with the formula it documents.
    """
    ROUND9_EXEMPT.setdefault(name, {}).update(cols)


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
