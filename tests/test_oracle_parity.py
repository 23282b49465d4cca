"""Run every registered query in Spark AND its DuckDB oracle, compare results.

This mirrors the driver's t2 correctness gate (CORRECTNESS_r{N}.json) so
regressions are caught locally before a round ends.
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pytest

_REPO = Path(__file__).resolve().parent.parent

from chainhouse_spark.queries import ORACLES, QUERIES
from tests.compare import compare_frames

from tests.conftest import SF_DIR


def _duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    import tempfile

    con = duckdb.connect()
    # Cap + spill dir: under concurrent JVM memory pressure duckdb's default
    # 80%-of-RAM limit can fail with a hard bad_alloc; capped, it spills.
    # The spill dir must be PER-CONNECTION: two concurrent pytest sessions
    # sharing one spill path can read each other's spill files and return
    # wrong oracle values (observed as sporadic window-query mismatches).
    # 600MB emulates the driver sandbox's observed cap (the r02 OOM class):
    # an oracle that cannot run here cannot run there, so memory-hungry
    # oracle SQL fails in CI instead of in the driver. Override with
    # SPARK_GRAFT_ORACLE_MEM for local debugging.
    import os as _os

    con.execute(
        f"SET memory_limit='{_os.environ.get('SPARK_GRAFT_ORACLE_MEM', '600MB')}'"
    )
    spill = tempfile.mkdtemp(prefix="duckdb_spill_")
    con.execute(f"SET temp_directory='{spill}'")
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


@pytest.fixture(scope="module")
def duck():
    con = _duck_con(SF_DIR)
    yield con
    con.close()


def _spark_type_class(dt) -> str:
    """Map a Spark DataType to the DuckDB DBAPI type-code class so output
    dtype classes can be compared across engines. Registry invariant added
    after eth_erc20_transfer_decode (r04/r05): Spark DECIMAL(38,0) vs oracle
    VARCHAR held identical values but deterministically hash-mismatched under
    any driver canonicalization that treats numerics differently from
    strings. Every query must emit the SAME type class on both sides.
    """
    from pyspark.sql import types as T

    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
                       T.FloatType, T.DoubleType, T.DecimalType)):
        return "NUMBER"
    if isinstance(dt, T.StringType):
        return "STRING"
    if isinstance(dt, T.BooleanType):
        return "bool"
    if isinstance(dt, T.DateType):
        return "Date"
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        return "DATETIME"
    if isinstance(dt, T.BinaryType):
        return "BINARY"
    return type(dt).__name__


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir, duck):
    from pyspark.sql.types import ArrayType, MapType

    sdf = QUERIES[name](spark, sf_dir)
    # No query surface may emit array/map columns: the driver's canonicalizer
    # pandas-sorts every output column and dies on unhashable list cells
    # (CORRECTNESS_r04 eth_blocks_table / scalar_higher_order). Serialize
    # collections to canonical strings (array_join / to_json) or explode.
    bad = [
        f.name for f in sdf.schema.fields
        if isinstance(f.dataType, (ArrayType, MapType))
    ]
    assert not bad, (
        f"{name}: array/map output columns {bad} break the driver "
        "canonicalizer — serialize them to strings or explode to rows"
    )
    spdf = sdf.toPandas()
    # Round-at-9 convention gate (VERDICT r08 task 1): no non-exempt float
    # column may emit raw unrounded doubles — the latent class that re-arms
    # last-ulp divergences when one side's formula is later re-associated.
    # Exemptions (magnitude-unbounded columns, where ROUND itself diverges
    # cross-engine) are documented in registry.ROUND9_EXEMPT. The check
    # runs here, on the already-materialized pandas frame, so the full-
    # registry audit costs nothing beyond the parity run itself.
    sys.path.insert(0, str(_REPO / "tools"))
    from float_convention_sweep import flag_unrounded_cols

    from chainhouse_spark.queries.registry import ROUND9_EXEMPT

    stale_exempt = set(ROUND9_EXEMPT.get(name, {})) - set(spdf.columns)
    assert not stale_exempt, (
        f"{name}: ROUND9_EXEMPT names columns {sorted(stale_exempt)} that "
        "the query no longer emits — update the exemption next to the query"
    )
    unrounded_cols = flag_unrounded_cols(name, spdf)
    assert not unrounded_cols, (
        f"{name}: float columns {unrounded_cols} emit raw unrounded doubles "
        "— apply round-at-9 on BOTH the Spark and oracle sides, or document "
        "a magnitude exemption in registry.ROUND9_EXEMPT"
    )
    if name not in ORACLES:
        # Rows-only check (driver's weaker gate for non-SQL-expressible ops).
        assert spdf is not None
        return
    from chainhouse_spark.queries.registry import FRUGAL_ORACLE

    if ORACLES[name].startswith(FRUGAL_ORACLE):
        # Frugal-pragma oracles re-SET temp_directory; on the SHARED
        # connection that SET fails once any earlier query has spilled
        # ("Cannot switch temporary directory after the current one has
        # been used"). Run them on a fresh connection, where the pragma
        # always precedes first use — matching how the driver and
        # tools/parity_subset.py execute single queries.
        con = _duck_con(sf_dir)
        try:
            cur = con.execute(ORACLES[name])
            duck_desc = list(cur.description)
            dpdf = cur.df()
        finally:
            con.close()
    else:
        cur = duck.execute(ORACLES[name])
        duck_desc = list(cur.description)
        dpdf = cur.df()
    # Engine-level dtype-class parity (see _spark_type_class docstring):
    # identical VALUES with asymmetric types (DECIMAL vs VARCHAR) still fail
    # the driver gate, so catch the asymmetry here, per column, by name.
    spark_classes = {f.name: _spark_type_class(f.dataType) for f in sdf.schema.fields}
    duck_classes = {c[0]: c[1] for c in duck_desc}
    mismatched = {
        col: (spark_classes[col], duck_classes[col])
        for col in spark_classes
        if col in duck_classes and spark_classes[col] != duck_classes[col]
    }
    assert not mismatched, (
        f"{name}: output dtype class differs between Spark and the DuckDB "
        f"oracle for {mismatched} (col: (spark, duckdb)) — cast BOTH sides "
        "to the same class or the driver canonicalizer may hash-mismatch"
    )
    issues = compare_frames(spdf, dpdf)
    assert not issues, f"{name}: " + " | ".join(issues)
