"""Run a subset of registered queries through the driver's oracle gate.

    python tools/parity_subset.py [--sf DIR] [--mem LIMIT] name [name ...]

Runs each named query on Spark AND its DuckDB oracle at the given scale
factor (default sf0.01, the driver's), compares with tests/compare.py, and
prints one line per query. Use during development for a fast signal on a
handful of queries; tests/test_oracle_parity.py replays the full registry.
--mem sets a deliberately tight DuckDB memory_limit (default 600MB) to
emulate the driver sandbox's cap — an oracle that OOMs here would OOM
there.
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--mem", default="600MB")
    ap.add_argument("names", nargs="+")
    args = ap.parse_args()

    from chainhouse_spark.queries import ORACLES, QUERIES
    from chainhouse_spark.session import build_spark
    from tests.compare import compare_frames

    spark = build_spark()

    def fresh_con() -> duckdb.DuckDBPyConnection:
        # One connection PER QUERY: frugal-pragma oracles carry their own
        # SET statements, and DuckDB refuses to switch temp_directory on a
        # connection that already spilled (the test_oracle_parity.py fix).
        c = duckdb.connect()
        c.execute(f"SET memory_limit='{args.mem}'")
        c.execute(
            f"SET temp_directory='{tempfile.mkdtemp(prefix='duck_sub_')}'"
        )
        for t in TABLES:
            c.execute(
                f"CREATE VIEW {t} AS SELECT * FROM '{args.sf}/{t}.parquet'"
            )
        return c

    failed = 0
    for name in args.names:
        if name not in QUERIES:
            print(f"{name}: UNKNOWN")
            failed += 1
            continue
        try:
            spdf = QUERIES[name](spark, args.sf).toPandas()
            # Round-at-9 convention gate (same check test_oracle_parity.py
            # runs): without it this tool green-lit queries whose raw
            # unrounded emissions only show at sf0.01 (the round-9
            # text_ngram_entropy_rate / ts_rollup_minute class).
            sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
            from float_convention_sweep import flag_unrounded_cols

            bad_cols = flag_unrounded_cols(name, spdf)
            if bad_cols:
                print(f"{name}: CONVENTION-FAIL unrounded {bad_cols}")
                failed += 1
                continue
            if name not in ORACLES:
                print(f"{name}: rows-only OK ({len(spdf)} rows)")
                continue
            con = fresh_con()
            try:
                dpdf = con.execute(ORACLES[name]).df()
            finally:
                con.close()
            issues = compare_frames(spdf, dpdf)
            status = "OK" if not issues else "FAIL " + " | ".join(issues)
            if issues:
                failed += 1
            print(f"{name}: {status} ({len(spdf)} rows)")
        except Exception as e:  # surface per-query, keep sweeping
            failed += 1
            print(f"{name}: ERR {type(e).__name__}: {e}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
