#!/usr/bin/env python
"""Sweep the full query registry for float outputs that violate the repo's
round-at-9 convention.

Convention (see tests/compare.py): every float column a query emits should be
rounded at 9 decimal digits in BOTH the Spark expression and the oracle SQL,
so that cross-engine last-ulp association differences can never flip the
exact-repr comparison. This sweep runs each registered query at sf0.001 and
flags any double column containing a value v where round(v, 9) != v — i.e. a
raw unrounded double (rounding is idempotent in double space, so convention-
compliant columns pass; integer-valued and dyadic-exact doubles also pass,
which is fine — those cannot ulp-diverge from an identical oracle formula).

Usage: python tools/float_convention_sweep.py [sf_dir]
Exit 0 and one JSON line per query; a final summary line lists offenders.
"""

from __future__ import annotations

import json
import math
import sys

sys.path.insert(0, ".")

from chainhouse_spark.session import build_spark  # noqa: E402
from chainhouse_spark.queries import QUERIES  # noqa: E402


def unrounded(v) -> bool:
    if v is None:
        return False
    f = float(v)
    if math.isnan(f) or math.isinf(f):
        return False
    return round(f, 9) != f


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = build_spark("float_convention_sweep")
    offenders: dict[str, list[str]] = {}
    for name, fn in sorted(QUERIES.items()):
        try:
            df = fn(spark, sf_dir)
            dbl_cols = [f.name for f in df.schema.fields
                        if f.dataType.typeName() in ("double", "float")]
            if not dbl_cols:
                print(json.dumps({"q": name, "double_cols": 0, "flagged": []}))
                continue
            pdf = df.select(*dbl_cols).toPandas()
            bad = [c for c in dbl_cols if pdf[c].map(unrounded).any()]
            print(json.dumps({"q": name, "double_cols": len(dbl_cols),
                              "flagged": bad}))
            if bad:
                offenders[name] = bad
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"q": name, "error": str(exc)[:200]}))
            offenders[name] = ["<error>"]
    print(json.dumps({"summary": True, "n_offenders": len(offenders),
                      "offenders": offenders}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
