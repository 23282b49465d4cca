"""Spark-vs-DuckDB result comparison mirroring the driver's correctness gate:
row-count + column names + order-insensitive value comparison.

AUTHORITATIVE comparator. This module canonicalizes floats via exact
``repr`` (17-significant-digit round-trip), so it is strictly AT LEAST as
strict as the external driver's value-hash — which was observed (round 7,
``ts_trend_slope_by_type``) to tolerate a last-ulp divergence this module
correctly rejects. Keep it that way: a green driver row does not imply the
local parity suite passes, but a local pass has always implied a driver
pass. Queries meet this bar via the round-at-9 convention — float outputs
are rounded at 9 decimal digits by association-identical formulas on both
the Spark and oracle sides (audited by ``tools/float_convention_sweep.py``
and gated per-query in test_oracle_parity.py). The rounding itself uses
the product-space scheme ``ROUND(x * 1e9) / 1e9 + 0.0``
(``chainhouse_spark.functions.rounding``) — plain ROUND(x, 9) resolves
9th-digit ties differently per engine (measured 9/3M divergence on
natural doubles even below |x|=1e3, plus a -0.0 class), while the
product-space form makes both engines round the same double with the
same tie rule, so agreement is deterministic
(tests/test_round_convention.py). Magnitude-unbounded columns are exempt
(documented in ``queries.registry.ROUND9_EXEMPT``) and rely on the
underlying rule that rounding merely backs up: the Spark and oracle
formulas must stay association-identical, so both engines compute the
same double before any rounding at all.
"""

from __future__ import annotations

import math
from decimal import Decimal

import numpy as np
import pandas as pd


def _canon_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        return repr(v)
    if isinstance(v, (np.floating,)):
        f = float(v)
        return "NULL" if math.isnan(f) else repr(f)
    if isinstance(v, (np.integer,)):
        return str(int(v))
    if isinstance(v, Decimal):
        return str(v)
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if isinstance(v, (list, tuple, np.ndarray)):
        return "[" + ",".join(_canon_cell(x) for x in v) + "]"
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if v is pd.NaT:
        return "NULL"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)


def canon_rows(df: pd.DataFrame) -> list[tuple]:
    cols = sorted(df.columns)
    out = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False, name=None)]
    out.sort()
    return out


def compare_frames(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    """Return a list of human-readable mismatch descriptions (empty == match)."""
    issues: list[str] = []
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        issues.append(f"columns differ: spark={s_cols} duckdb={d_cols}")
        return issues
    if len(spark_pdf) != len(duck_pdf):
        issues.append(f"row count differs: spark={len(spark_pdf)} duckdb={len(duck_pdf)}")
    s_rows, d_rows = canon_rows(spark_pdf), canon_rows(duck_pdf)
    if s_rows != d_rows:
        only_s = [r for r in s_rows if r not in set(d_rows)][:5]
        only_d = [r for r in d_rows if r not in set(s_rows)][:5]
        issues.append(f"values differ; sample only-in-spark={only_s} only-in-duckdb={only_d} (cols={s_cols})")
    return issues
