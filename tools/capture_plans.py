"""Dump `.explain("formatted")` for bench headline queries to files.

    python tools/capture_plans.py <outdir> [query ...]

Writes <outdir>/<query>.txt for each named query (default: the whole
bench.py headline set) at sf0.1 — the optimization-round evidence trail
(plans/r12/<query>_before.txt / _after.txt). Queries that execute driver
actions at build time (kcore's peel rounds, the planned-LSH collect) run
them; the captured plan is the final returned DataFrame's, same as
PLANS.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    outdir = sys.argv[1]
    names = sys.argv[2:]
    os.makedirs(outdir, exist_ok=True)

    from bench import BENCH_QUERIES  # noqa: E402
    from chainhouse_spark.queries import QUERIES  # noqa: E402
    from chainhouse_spark.session import build_spark  # noqa: E402

    if not names:
        names = list(BENCH_QUERIES)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_spark(app_name="capture-plans")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        text = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(text)
        print(f"{name}: {len(text)} chars", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
