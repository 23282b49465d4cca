#!/usr/bin/env python
"""Sweep the full query registry for float outputs that violate the repo's
round-at-9 convention.

Convention (see tests/compare.py): every float column a query emits should
be rounded at 9 decimal digits in BOTH the Spark expression and the oracle
SQL, so that a future re-association of one side's formula cannot silently
re-arm a last-ulp divergence (the round-7 ``ts_trend_slope_by_type``
class). Rounding uses the product-space scheme ``ROUND(x*1e9)/1e9 + 0.0``
(``chainhouse_spark.functions.rounding`` — round9 / round9_sql): plain
ROUND(x, 9) resolves 9th-digit ties differently per engine and diverges
on signed zero, while the product-space form is deterministically
cross-engine-exact (tests/test_round_convention.py). Columns whose
magnitude can exceed ~9e6 (where rounding degenerates to identity) are
DELIBERATELY unrounded and documented in
``chainhouse_spark.queries.registry.ROUND9_EXEMPT`` — for them the
protection is the original rule (association-identical formulas on both
sides), and this sweep skips them.

This sweep runs each registered query at sf0.001 and flags any
non-exempt double column containing a value v where round(v, 9) != v —
i.e. a raw unrounded double (rounding is idempotent in double space, so
convention-compliant columns pass; integer-valued and dyadic-exact doubles
also pass, which is fine — those cannot ulp-diverge from an identical
oracle formula). The same per-frame check gates every query in
tests/test_oracle_parity.py, where the Spark result is already in pandas;
this standalone tool exists for ad-hoc full-registry audits.

Usage: python tools/float_convention_sweep.py [sf_dir]
One JSON line per query; a final summary line lists offenders.
Exits 1 if any non-exempt offender is found.

AUDIT SCALE MATTERS: default is sf0.01 (the driver's adjudication scale).
The round-9 sf0.001 sweep missed four latent offenders whose values
happened to be round-clean at that size (ts_rollup_minute.avg_value,
ts_rolling_mad_anomaly.med, q8_market_share.mkt_share,
sketch_theta_set_ops.est_*) — the sf0.01 parity run surfaced them.
Audit at the scale the driver checks, or larger.
"""

from __future__ import annotations

import json
import math
import sys

sys.path.insert(0, ".")

from chainhouse_spark.session import build_spark  # noqa: E402
from chainhouse_spark.queries import QUERIES  # noqa: E402
from chainhouse_spark.queries.registry import ROUND9_EXEMPT  # noqa: E402


def unrounded(v) -> bool:
    if v is None:
        return False
    f = float(v)
    if math.isnan(f) or math.isinf(f):
        return False
    return round(f, 9) != f


def flag_unrounded_cols(name: str, pdf) -> list[str]:
    """Names of non-exempt float columns in `pdf` holding unrounded values.

    `pdf` is the query's pandas result (all columns); float columns are
    detected by dtype so the caller needn't pre-project.
    """
    import numpy as np

    exempt = ROUND9_EXEMPT.get(name, {})
    bad = []
    for c in pdf.columns:
        if c in exempt:
            continue
        if pdf[c].dtype.kind != "f" and not (
            pdf[c].dtype == object
            and pdf[c].map(lambda v: isinstance(v, (float, np.floating))).any()
        ):
            continue
        if pdf[c].map(unrounded).any():
            bad.append(c)
    return bad


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
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
            bad = flag_unrounded_cols(name, pdf)
            skipped = sorted(set(dbl_cols) & set(ROUND9_EXEMPT.get(name, {})))
            print(json.dumps({"q": name, "double_cols": len(dbl_cols),
                              "flagged": bad, "exempt": skipped}))
            if bad:
                offenders[name] = bad
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"q": name, "error": str(exc)[:200]}))
            offenders[name] = ["<error>"]
    print(json.dumps({"summary": True, "n_offenders": len(offenders),
                      "offenders": offenders}))
    return 1 if offenders else 0


if __name__ == "__main__":
    raise SystemExit(main())
