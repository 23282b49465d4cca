"""Z-order (Morton) clustering for multi-column data skipping.

A single-column sort key gives parquet row-group min/max pruning on that
column only; filters on a second column scan everything. Interleaving the
bits of two (rank-normalized) key columns into one sort key clusters rows
so that EVERY row group covers a small rectangle of the (a, b) space —
min/max stats then prune on either column, the same effect Delta/Iceberg
OPTIMIZE ZORDER provides, built from plain expressions here.

Rank normalization first (percent_rank scaled to the bit budget) makes the
curve robust to skewed value distributions — raw values would waste bits on
empty ranges. Everything is codegen expressions; the only cost is the sort
the writer was already doing (K9).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def interleave_bits_sql(a: str, b: str, bits: int = 16) -> str:
    """SQL expression interleaving the low `bits` of two BIGINT expressions
    into one BIGINT (a's bits at even positions). Pure shifts/masks —
    whole-stage codegen, no UDF."""
    parts = []
    for i in range(bits):
        parts.append(f"(shiftleft(shiftright({a}, {i}) & 1, {2 * i + 1}))")
        parts.append(f"(shiftleft(shiftright({b}, {i}) & 1, {2 * i}))")
    return "(" + " + ".join(parts) + ")"


def _rank_scaled(col: str, bits: int) -> Column:
    """Dense rank of the column scaled into [0, 2^bits): distribution-robust
    coordinates for the curve."""
    w = Window.orderBy(col)
    return (
        (F.percent_rank().over(w) * ((1 << bits) - 1)).cast("bigint")
    )


def zorder_by(df: DataFrame, col_a: str, col_b: str, bits: int = 16) -> DataFrame:
    """Return df sorted by the Z-value of (col_a, col_b).

    The percent_rank window is a single global sort — the same cost class as
    the range partitioning a plain sorted write needs. At 100 TB compute the
    rank boundaries on a sample instead (approxQuantile -> width_bucket)
    to avoid the global window; the curve only needs approximate uniformity.
    """
    z = df.withColumn("__ra", _rank_scaled(col_a, bits)).withColumn(
        "__rb", _rank_scaled(col_b, bits)
    ).withColumn("__z", F.expr(interleave_bits_sql("__ra", "__rb", bits)))
    return z.orderBy("__z").drop("__ra", "__rb", "__z")
