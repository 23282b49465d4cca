"""Binary/hex ergonomics for the chain tables (SURVEY.md §7 hard part 2).

Canonical storage is BinaryType (hashes, addresses, bloom filters, input
data — ClickHouse FixedString/String equivalents, src/schema.rs:3–83).
Humans and JSON-RPC speak 0x-hex. These helpers are the bridge:

- hex views are lowercase 0x-prefixed strings (RPC convention);
- unhex accepts 0x-prefixed or bare, any case;
- predicate helpers compare a binary column against a *binary literal* —
  the form Catalyst folds to a constant and pushes into the parquet scan
  (comparing hex(col) = 'ab…' instead would wrap the column in a function
  and defeat pushdown; this is the rewrite SURVEY §4 flagged as the one
  candidate custom rule, done here as an API instead of a Catalyst rule).

All built-ins, codegen-friendly, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_hex(col: str | Column) -> Column:
    """Binary -> lowercase 0x-hex string view (NULL-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c.isNotNull(), F.concat(F.lit("0x"), F.lower(F.hex(c))))


def from_hex(col: str | Column) -> Column:
    """0x-hex (or bare hex, any case) string -> binary (NULL-safe)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.unhex(F.regexp_replace(c, "^0[xX]", ""))


def _hex_literal_to_binary(value: str) -> bytes:
    h = value[2:] if value.lower().startswith("0x") else value
    if len(h) % 2:
        raise ValueError(f"odd-length hex literal: {value!r}")
    return bytes.fromhex(h)


def eq_hex(col: str | Column, hex_value: str) -> Column:
    """`col = <hex literal>` as a binary-literal comparison — constant-folded
    and pushed to the scan (PushedFilters shows EqualTo on the binary col)."""
    c = F.col(col) if isinstance(col, str) else col
    return c == F.lit(_hex_literal_to_binary(hex_value))


def in_hex(col: str | Column, hex_values: list[str]) -> Column:
    """`col IN (<hex literals>)` as binary literals (pushdown-friendly)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.isin([_hex_literal_to_binary(v) for v in hex_values])


def is_address(col: str | Column) -> Column:
    """True when the value is a well-formed 20-byte address."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) == 20


def is_hash32(col: str | Column) -> Column:
    """True when the value is a well-formed 32-byte hash/root/topic."""
    c = F.col(col) if isinstance(col, str) else col
    return F.length(c) == 32


WEI_PER_ETH = 10**18


def wei_to_eth(col: str | Column) -> Column:
    """Decimal(38,0) wei -> Decimal(38,18) ether, exact.

    A direct decimal division loses scale under Spark's precision-loss rules
    ((38,0)/(19,0) keeps only 6 fractional digits — 1 wei would round to 0),
    so the value is split: the quotient is integral (division is exact by
    construction), and the remainder scales through an exact multiply by
    1E-18 (multiplication preserves full scale)."""
    from decimal import Decimal

    c = (F.col(col) if isinstance(col, str) else col).cast("decimal(38,0)")
    wei = F.lit(Decimal(WEI_PER_ETH))
    r = c % wei
    q = ((c - r) / wei).cast("decimal(19,0)")  # integral -> truncation-safe
    frac = (r.cast("decimal(18,0)") * F.lit(Decimal("1E-18")).cast("decimal(18,18)")).cast(
        "decimal(19,18)"  # value < 1; tight int-digits keep the sum at (38,18)
    )
    return q + frac


def word_u120_sql(data_col: str, word: int = 0) -> str:
    """SQL expression decoding the LOW 120 BITS of the `word`-th 32-byte ABI
    word of a binary column into DECIMAL(38,0), entirely JVM-side.

    `conv(hex, 16, 10)` only covers 64 bits, so the low 15 bytes are decoded
    as a 7-byte high chunk and an 8-byte low chunk recombined in exact
    decimal arithmetic (hi * 2^64 + lo; 2^120 ≈ 1.3e36 fits (38,0)).
    120 bits cover every realistic ERC-20 amount (≈ 1.3e18 whole tokens at
    18 decimals); amounts using the upper 136 bits of the word need the
    vectorized full-width decoder (functions/u256.py::hex_to_decimal).
    Bytes 1..17 of the word are the truncated high part — callers that must
    detect overflow can test `substring(word, 1, 17) <> X'00...'`.
    """
    base = word * 32
    hi = f"CAST(conv(hex(substring({data_col}, {base + 18}, 7)), 16, 10) AS DECIMAL(17,0))"
    lo = f"CAST(conv(hex(substring({data_col}, {base + 25}, 8)), 16, 10) AS DECIMAL(20,0))"
    return (
        f"CAST({hi} * CAST(18446744073709551616 AS DECIMAL(20,0)) + {lo} AS DECIMAL(38,0))"
    )


def topic_address_hex(col: Column) -> Column:
    """Topic (32-byte left-padded address) -> lowercase 0x hex address."""
    return F.concat(F.lit("0x"), F.lower(F.hex(F.substring(col, 13, 20))))
