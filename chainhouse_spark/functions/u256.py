"""Vectorized 256-bit quantity codecs — the one genuinely custom scalar the
rebuild needs (SURVEY.md §2.2 P3, §7 "built-in vs custom").

JSON-RPC carries quantities as 0x-hex strings of up to 32 bytes. Spark's
built-in conv() is 64-bit-bounded, so column-wise conversion needs Python —
done here as Arrow-batched pandas UDFs (never row-at-a-time):

- hex_to_decimal: 0x-hex -> Decimal(38,0). The arithmetic type for every
  quantity column whose real-world domain fits 38 digits (wei amounts, gas,
  timestamps, difficulty — SURVEY §1.2). Values beyond 38 digits raise a
  clear error rather than silently corrupting; full-range columns (r, s,
  legacy totalDifficulty) must use hex_to_bytes instead.
- hex_to_bytes: 0x-hex -> fixed-width binary (the full-range round-trip
  representation).
"""

from __future__ import annotations

from decimal import Decimal

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BinaryType, DecimalType

_DEC_MAX = 10**38


@pandas_udf(DecimalType(38, 0))
def hex_to_decimal(s: pd.Series) -> pd.Series:
    """0x-hex quantity string -> Decimal(38,0) (NULL-safe, overflow-checked)."""

    def conv(v):
        if v is None:
            return None
        n = int(v, 16)
        if n >= _DEC_MAX:
            raise ValueError(
                f"quantity {v!r} exceeds Decimal(38,0); store this column as "
                "32-byte binary (hex_to_bytes) instead"
            )
        return Decimal(n)

    return s.map(conv)


def hex_to_bytes_udf(width: int | None = 32):
    """0x-hex -> binary pandas UDF, left-padded to `width` bytes (None: no
    padding). Use for full-range 256-bit scalars (r/s) and fixed-width ids."""

    @pandas_udf(BinaryType())
    def conv(s: pd.Series) -> pd.Series:
        def one(v):
            if v is None:
                return None
            h = v[2:] if v.lower().startswith("0x") else v
            if len(h) % 2:
                h = "0" + h
            b = bytes.fromhex(h)
            if width is not None:
                if len(b) > width:
                    raise ValueError(f"value {v!r} wider than {width} bytes")
                b = b.rjust(width, b"\x00")
            return b

        return s.map(one)

    return conv
