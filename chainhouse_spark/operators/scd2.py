"""SCD Type-2 merge: apply a batch of dimension updates while preserving
history — every attribute change closes the open row (sets `valid_to`) and
opens a new one, so any past point in time can be reconstructed with
`valid_from <= t AND (valid_to IS NULL OR t < valid_to)`.

The reference keeps no dimension history (ClickHouse tables are overwritten
by re-ingest; src/main.rs:62–161) — this is the warehouse-grade strengthening
a real analytics deployment layers on.

Scale: one full-outer join on the natural key is the whole operator —
shuffle both sides on the key once; attribute comparison is codegen
null-safe equality. History rows (already closed) pass through untouched, so
at 100 TB the join input is |open rows| + |update batch|, not |history|.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    keys: list[str],
    attrs: list[str],
    effective_ts: str,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Merge `updates` (one row per key: the new attribute values) into the
    SCD2 table `current` as of `effective_ts` (a TIMESTAMP literal string).

    Returns the new full dimension table:
      - closed history rows: unchanged, passed through;
      - open rows whose key is absent from updates, or present with
        identical attributes: unchanged;
      - open rows with differing attributes: closed at effective_ts, plus a
        new open row carrying the update's values;
      - keys new to the dimension: new open rows.
    """
    ts = F.expr(f"TIMESTAMP_NTZ '{effective_ts}'")
    history = current.filter(F.col(valid_to).isNotNull())
    open_rows = current.filter(F.col(valid_to).isNull())

    u = updates.select(
        *[F.col(k).alias(f"u_{k}") for k in keys],
        *[F.col(a).alias(f"u_{a}") for a in attrs],
    )
    key_eq = reduce(
        lambda x, y: x & y, [F.col(k) == F.col(f"u_{k}") for k in keys]
    )
    j = open_rows.join(u, key_eq, "full_outer")

    existing = F.col(keys[0]).isNotNull()
    updated = F.col(f"u_{keys[0]}").isNotNull()
    # null-safe inequality on any attribute == "this update changes the row"
    changed = updated & existing & ~reduce(
        lambda x, y: x & y,
        [F.col(a).eqNullSafe(F.col(f"u_{a}")) for a in attrs],
    )

    unchanged_open = j.filter(existing & ~changed).select(
        *keys, *attrs, valid_from, valid_to
    )
    closed_now = j.filter(changed).select(
        *keys, *attrs, F.col(valid_from), ts.alias(valid_to)
    )
    opened_now = j.filter(changed | ~existing).select(
        *[F.coalesce(F.col(k), F.col(f"u_{k}")).alias(k) for k in keys],
        *[F.col(f"u_{a}").alias(a) for a in attrs],
        ts.alias(valid_from),
        F.lit(None).cast("timestamp_ntz").alias(valid_to),
    )
    return history.unionByName(unchanged_open).unionByName(closed_now).unionByName(
        opened_now
    )
