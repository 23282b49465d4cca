"""ClickHouse RowBinary insert path — the native-wire-format equivalent of
the reference's `INSERT INTO ... FORMAT native` bulk load (src/main.rs:
294-309), built on ClickHouse's documented RowBinary encoding over the HTTP
interface (stdlib urllib; no driver jar, no third-party client).

Why RowBinary over HTTP as the default: RowBinary's spec is a stable,
byte-exact contract a test can pin WITHOUT a running server, and the HTTP
interface needs no protocol negotiation. Column-blocked `FORMAT Native`
over the native TCP protocol — the reference's actual wire — lives in
sinks/native_tcp.py for native-TCP-only deployments.
The JDBC path (sinks/clickhouse.py) remains the generic-database fallback;
this path carries the chain tables' full fidelity: FixedString widths, real
UInt256 (32-byte LE) for u256 decimals, Array columns as native arrays
rather than JSON strings.

Encoding rules (RowBinary spec):
- UInt64                 8 bytes little-endian
- UInt256                32 bytes little-endian
- UInt8 (Boolean)        1 byte
- String                 LEB128 varint length + raw bytes
- FixedString(N)         exactly N raw bytes (values are validated)
- Array(T)               LEB128 varint count + element encodings
- Nullable(T)            0x00 + value, or 0x01 for NULL

Executor-side dataflow mirrors the reference's batched flush (K4/K5):
`foreachPartition` encodes `batch_size`-row chunks and POSTs each chunk as
one INSERT — partitions load in parallel, retries are idempotent because
the provisioned tables dedup on their ORDER BY keys (K8).
"""

from __future__ import annotations

import urllib.parse
import urllib.request
from decimal import Decimal
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DataType,
    DecimalType,
    LongType,
    StringType,
    StructType,
)

from chainhouse_spark.schemas import DEDUP_KEYS, TABLES
from chainhouse_spark.sinks.clickhouse import FIXED_WIDTHS


def varint(n: int) -> bytes:
    """Unsigned LEB128 (RowBinary length prefix)."""
    if n < 0:
        raise ValueError(f"varint of negative {n}")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _enc_u64(v: Any) -> bytes:
    return int(v).to_bytes(8, "little")


def _enc_u256(v: Any) -> bytes:
    i = int(v) if not isinstance(v, Decimal) else int(v)
    if i < 0 or i >= 1 << 256:
        raise ValueError(f"u256 out of range: {i}")
    return i.to_bytes(32, "little")


def _enc_bool(v: Any) -> bytes:
    return b"\x01" if v else b"\x00"


def _enc_string(v: Any) -> bytes:
    raw = v if isinstance(v, (bytes, bytearray)) else str(v).encode()
    return varint(len(raw)) + bytes(raw)


def _enc_fixed(width: int) -> Callable[[Any], bytes]:
    def enc(v: Any) -> bytes:
        raw = bytes(v)
        if len(raw) != width:
            raise ValueError(f"FixedString({width}) got {len(raw)} bytes")
        return raw

    return enc


def _encoder(name: str, dtype: DataType) -> Callable[[Any], bytes]:
    """Value encoder for one column, mirroring sinks/clickhouse._ch_type —
    the DDL and the wire bytes must agree on every column's type."""
    if isinstance(dtype, BinaryType):
        if name in FIXED_WIDTHS:
            return _enc_fixed(FIXED_WIDTHS[name])
        return _enc_string
    if isinstance(dtype, DecimalType):
        return _enc_u256
    if isinstance(dtype, LongType):
        return _enc_u64
    if isinstance(dtype, BooleanType):
        return _enc_bool
    if isinstance(dtype, StringType):
        return _enc_string
    if isinstance(dtype, ArrayType):
        elem = _encoder(name, dtype.elementType)

        def enc_array(v: Any) -> bytes:
            items = list(v)
            return varint(len(items)) + b"".join(elem(x) for x in items)

        return enc_array
    raise ValueError(f"no RowBinary encoding for {name}: {dtype}")


def row_encoder(
    schema: StructType, order_by: list[str]
) -> Callable[[Any], bytes]:
    """Whole-row encoder. Nullability matches table_ddl: a column is
    Nullable on the wire iff it is nullable in the schema, not a key
    column, and not an Array (ClickHouse cannot nest Array in Nullable)."""
    encs = []
    for f in schema.fields:
        enc = _encoder(f.name, f.dataType)
        is_array = isinstance(f.dataType, ArrayType)
        nullable = f.nullable and f.name not in order_by and not is_array
        encs.append((f.name, enc, nullable, is_array))

    def encode_row(row: Any) -> bytes:
        out = bytearray()
        for name, enc, nullable, is_array in encs:
            v = row[name]
            if nullable:
                if v is None:
                    out += b"\x01"
                    continue
                out += b"\x00"
            elif v is None:
                if is_array:
                    v = []  # Array can't be Nullable in ClickHouse: NULL -> []
                else:
                    raise ValueError(f"NULL in non-nullable column {name}")
            out += enc(v)
        return bytes(out)

    return encode_row


def encode_rows(
    rows: list[Any], name: str, schema: StructType | None = None
) -> bytes:
    """RowBinary bytes for a list of Rows of one of the four chain tables
    (or any schema + DEDUP_KEYS-style key via row_encoder directly)."""
    schema = schema if schema is not None else TABLES[name]
    enc = row_encoder(schema, DEDUP_KEYS.get(name, []))
    return b"".join(enc(r) for r in rows)


def insert_url(endpoint: str, name: str, schema: StructType, database: str = "ethereum") -> str:
    """HTTP-interface INSERT URL: the query names every column explicitly
    (RowBinary is positional; server matches by the column list — same
    name-keyed safety the reference gets from klickhouse, SURVEY §0)."""
    cols = ", ".join(f"`{f.name}`" for f in schema.fields)
    q = f"INSERT INTO {database}.{name} ({cols}) FORMAT RowBinary"
    return f"http://{endpoint}/?query={urllib.parse.quote(q)}"


def write_rowbinary_http(
    df: DataFrame,
    name: str,
    endpoint: str,
    database: str = "ethereum",
    batch_size: int = 100_000,
    timeout: float = 60.0,
) -> None:
    """Executor-side bulk insert: each partition encodes and POSTs its rows
    in `batch_size`-row chunks (K4 flush batching; partitions are the K5
    parallelism). At-least-once per chunk; the ReplacingMergeTree keys (K8)
    make re-runs idempotent, same contract as the reference."""
    schema = df.schema
    keys = DEDUP_KEYS.get(name, [])
    url = insert_url(endpoint, name, schema, database)

    def send_partition(rows) -> None:
        enc = row_encoder(schema, keys)
        buf = bytearray()
        n = 0

        def flush() -> None:
            nonlocal buf, n
            if not n:
                return
            req = urllib.request.Request(
                url,
                data=bytes(buf),
                headers={"Content-Type": "application/octet-stream"},
            )
            with urllib.request.urlopen(req, timeout=timeout) as resp:
                resp.read()
            buf = bytearray()
            n = 0

        for row in rows:
            buf += enc(row)
            n += 1
            if n >= batch_size:
                flush()
        flush()

    df.foreachPartition(send_partition)
