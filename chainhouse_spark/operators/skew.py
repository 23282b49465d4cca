"""Skewed-join salting: the join-side companion to the salted two-phase
aggregation (queries/aggregates.py::agg_salted_two_phase).

AQE's skew-join handling splits oversized SORT-MERGE partitions at runtime,
but it only fires post-shuffle and only for sort-merge; a hot key that
dominates a shuffled-hash join, or a key so hot one split still floods a
task, needs the explicit form:

    big side:    salt = hash(row-unique col) % k     (each row one salt)
    small side:  replicate every row k times (explode over 0..k-1)
    join on (key, salt)                               (hot key now spreads
                                                       across k tasks)

Join semantics are unchanged — every (big, small) key match still meets on
exactly one salt — so the salted inner/left join is bit-identical to the
plain join and fully oracle-able. Cost: small side inflates k×, which is
the explicit, bounded price for k-way spreading of the hot key's probe
rows. Pick k ≈ (hot-key rows / target task rows); salting everything is
wasteful — in production, gate it to keys above a frequency threshold
(two-pass or sketch-estimated) and union the unsalted remainder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt_src: str,
    k: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join `big` ⨝ `small` on `on`, spreading each join key across `k`
    salted sub-keys. `salt_src` is any big-side column that varies within a
    key (a row id) so the salt spreads rows uniformly and DETERMINISTICALLY
    (no rand(): replays and retries must salt identically)."""
    b = big.withColumn("__salt", F.pmod(F.xxhash64(F.col(salt_src)), F.lit(k)))
    s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0).cast("long"), F.lit(k - 1).cast("long"))),
    )
    out = b.join(s, on + ["__salt"], how)
    return out.drop("__salt")
