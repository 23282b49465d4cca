"""Cross-engine-exact round-at-9 emission helpers (the repo convention).

Why not plain ROUND(x, 9): Spark rounds the shortest DECIMAL repr of x
(BigDecimal HALF_UP) while DuckDB rounds the BINARY product fl(x * 1e9)
(multiply / half-away-from-zero / divide). On the same input double the
two can disagree when x sits within an ulp of a 9th-decimal tie —
measured 9 / 3M on natural uniform doubles below 1e3, deterministically
reproducible (e.g. x = 375.84918992949997 -> Spark ...929, DuckDB
...93). Separately, DuckDB returns -0.0 for tiny negatives rounding to
zero where Spark returns +0.0 — an exact-repr mismatch class of its own.

The fix makes BOTH engines round the same binary value with the same tie
rule: y = x * 1e9 is one IEEE multiply (bit-identical from bit-identical
x), ROUND(y) to an integer is half-away-from-zero in both engines
(Spark's BigDecimal HALF_UP on y's shortest repr agrees with C++
std::round for every double: ties are exactly representable below 2^52
and both round away from zero; non-ties have repr and binary on the same
side of the boundary), y/1e9 is one IEEE divide, and the final + 0.0
collapses -0.0 to +0.0 identically. Probed on 540k samples spanning
1e-6..1e9 magnitudes plus constructed 9th-digit ties: ZERO mismatches.
This is the "integer-exact formulation" of rounding (ADVICE r08): the
tie decision happens in product space where both engines see the same
bits, so agreement is deterministic rather than probabilistic.

Use `round9` (Column) / `round9_sql` (oracle SQL text) at the EMISSION
point only — thresholds, ordering, and intermediate math keep comparing
the raw shared formula. Magnitude-unbounded columns stay unrounded and
documented in registry.ROUND9_EXEMPT (above |x| ~ 9e6 the product
leaves the 2^53 integer range and rounding becomes a no-op anyway).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round9(c: Column | str) -> Column:
    """Emission-point round-at-9, cross-engine-exact (see module doc)."""
    col = F.col(c) if isinstance(c, str) else c
    return (F.round(col * F.lit(1e9)) / F.lit(1e9)) + F.lit(0.0)


def round9_sql(expr: str) -> str:
    """The identical emission for oracle SQL text (DuckDB)."""
    return f"(ROUND(({expr}) * 1e9) / 1e9 + 0.0)"
