"""ClickHouse native TCP protocol: golden packet bytes, block round-trips,
and a scripted fake-server insert exercising the full client state machine.

The fake server implements the server half of the documented handshake
(Hello / sample-block / Progress / EndOfStream) over a real socket, so the
client's framing, revision negotiation, and insert loop run end-to-end
without a ClickHouse install. A live-server smoke is env-gated behind
CHAINHOUSE_CLICKHOUSE_TCP=host:port.
"""

from __future__ import annotations

import io
import os
import socket
import struct
import threading

import pytest
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from chainhouse_spark.sinks.native_tcp import (
    CLIENT_REVISION,
    ClickHouseError,
    NativeTCPClient,
    encode_block,
    read_block,
    read_str,
    read_varint,
    write_varint_str,
)
from chainhouse_spark.sinks.rowbinary import varint

# ---------------------------------------------------------------------------
# block encoding


SCHEMA = StructType(
    [
        StructField("number", LongType(), False),
        StructField("miner", StringType(), True),
        StructField("flags", ArrayType(LongType()), True),
        StructField("ok", BooleanType(), True),
    ]
)


def _rows(*tuples):
    return [dict(zip([f.name for f in SCHEMA.fields], t)) for t in tuples]


def test_block_golden_bytes():
    """Byte-level pin of one tiny block: BlockInfo, counts, column layout."""
    schema = StructType([StructField("number", LongType(), False)])
    block = encode_block(schema, [{"number": 7}])
    expected = (
        # BlockInfo: field 1, is_overflows=0; field 2, bucket_num=-1; end.
        varint(1) + b"\x00" + varint(2) + struct.pack("<i", -1) + varint(0)
        + varint(1)  # n_columns
        + varint(1)  # n_rows
        + write_varint_str("number")
        + write_varint_str("UInt64")
        + (7).to_bytes(8, "little")
    )
    assert block == expected


def test_block_roundtrip_all_types():
    rows = _rows(
        (1, "alice", [1, 2, 3], True),
        (2, None, [], False),
        (3, "bob", None, None),  # NULL array -> [], NULL bool -> Nullable
    )
    block = encode_block(SCHEMA, rows, order_by=["number"])
    cols, data = read_block(io.BytesIO(block))
    assert cols == [
        ("number", "UInt64"),
        ("miner", "Nullable(String)"),
        ("flags", "Array(UInt64)"),
        ("ok", "Nullable(Boolean)"),
    ]
    assert data[0] == [1, 2, 3]
    assert data[1] == [b"alice", None, b"bob"]
    assert data[2] == [[1, 2, 3], [], []]
    assert data[3] == [True, False, None]


def test_block_rejects_null_in_key_column():
    with pytest.raises(ValueError, match="non-nullable"):
        encode_block(SCHEMA, [{"number": None, "miner": None, "flags": [], "ok": None}],
                     order_by=["number"])


def test_array_offsets_are_cumulative():
    schema = StructType([StructField("flags", ArrayType(LongType()), True)])
    block = encode_block(schema, [{"flags": [10, 20]}, {"flags": [30]}])
    f = io.BytesIO(block)
    cols, data = read_block(f)
    assert data[0] == [[10, 20], [30]]
    # offsets live right after the header: find them by re-encoding
    idx = block.find(b"Array(UInt64)") + len(b"Array(UInt64)")
    offs = block[idx : idx + 16]
    assert offs == (2).to_bytes(8, "little") + (3).to_bytes(8, "little")


# ---------------------------------------------------------------------------
# fake server


class FakeServer:
    """Scripted server half of the native protocol, enough for hello +
    one DDL and/or one INSERT. Records everything the client sent."""

    def __init__(
        self, revision: int = 54460, fail_queries: bool = False, select_handler=None
    ):
        self.revision = revision
        self.fail_queries = fail_queries
        # select_handler(query) -> (StructType, rows) | None; when set,
        # non-INSERT queries answer with a header block + one data block.
        self.select_handler = select_handler
        self.received_blocks: list = []
        self.queries: list[str] = []
        self.errors: list[str] = []
        self._sock = socket.socket()
        self._sock.bind(("127.0.0.1", 0))
        self._sock.listen(8)
        self.port = self._sock.getsockname()[1]
        self._thread = threading.Thread(target=self._serve, daemon=True)
        self._thread.start()

    def _serve(self) -> None:
        while True:
            try:
                conn, _ = self._sock.accept()
            except OSError:  # listener closed
                return
            threading.Thread(
                target=self._serve_conn, args=(conn,), daemon=True
            ).start()

    def _serve_conn(self, conn) -> None:
        try:
            f = conn.makefile("rwb")
            self._handshake(f)
            while True:
                try:
                    packet = read_varint(f)
                except (ConnectionError, OSError):
                    return
                if packet == 1:  # Query
                    self._handle_query(f)
                else:
                    self.errors.append(f"unexpected client packet {packet}")
                    return
        except Exception as exc:  # surfaced via self.errors in asserts
            self.errors.append(repr(exc))

    def _handshake(self, f) -> None:
        assert read_varint(f) == 0  # client Hello
        read_str(f)  # client name
        read_varint(f)
        read_varint(f)
        client_rev = read_varint(f)
        read_str(f)  # database
        read_str(f)  # user
        read_str(f)  # password
        rev = min(client_rev, self.revision)
        out = bytearray(varint(0))
        out += write_varint_str("FakeHouse")
        out += varint(21) + varint(8)
        out += varint(self.revision)
        if rev >= 54058:
            out += write_varint_str("UTC")
        if rev >= 54372:
            out += write_varint_str("fakehouse")
        if rev >= 54401:
            out += varint(3)
        f.write(out)
        f.flush()

    def _read_client_data_packet(self, f):
        assert read_varint(f) == 2  # client Data
        read_str(f)  # temp table name
        return read_block(f)

    def _handle_query(self, f) -> None:
        read_str(f)  # query id
        # ClientInfo (client speaks min(CLIENT_REVISION, self.revision))
        rev = min(CLIENT_REVISION, self.revision)
        assert f.read(1) == b"\x01"  # query kind
        read_str(f)
        read_str(f)
        read_str(f)  # initial user/query id/address
        assert f.read(1) == b"\x01"  # interface TCP
        read_str(f)
        read_str(f)
        read_str(f)  # os user, hostname, client name
        read_varint(f)
        read_varint(f)
        read_varint(f)  # version, revision
        if rev >= 54060:
            read_str(f)  # quota key
        if rev >= 54401:
            read_varint(f)  # patch
        assert read_str(f) == b""  # settings terminator
        read_varint(f)  # stage
        read_varint(f)  # compression
        query = read_str(f).decode()
        self.queries.append(query)
        self._read_client_data_packet(f)  # external-tables terminator

        if self.fail_queries:
            exc = bytearray(varint(2))
            exc += struct.pack("<i", 60)
            exc += write_varint_str("DB::Exception")
            exc += write_varint_str("Table does not exist")
            exc += write_varint_str("")  # stack trace
            exc += b"\x00"  # no nested exception
            f.write(exc)
            f.flush()
            return

        if query.lstrip().upper().startswith("INSERT"):
            # sample block: empty, echoing no columns (structure not
            # validated by the client beyond "a Data packet arrived")
            out = bytearray(varint(1)) + write_varint_str("")
            out += encode_block(StructType([]), [])
            f.write(out)
            f.flush()
            while True:
                cols, data = self._read_client_data_packet(f)
                n_rows = len(data[0]) if data else 0
                if n_rows == 0:
                    break
                self.received_blocks.append((cols, data))
            # Progress + EndOfStream
            prog = bytearray(varint(3))
            rev = min(CLIENT_REVISION, self.revision)
            prog += varint(0) + varint(0)
            if rev >= 51554:
                prog += varint(0)
            if rev >= 54372:
                prog += varint(sum(len(d[0]) for _, d in self.received_blocks))
                prog += varint(0)
            f.write(prog)
            f.write(varint(5))
            f.flush()
        else:
            handled = None
            if self.select_handler is not None:
                handled = self.select_handler(query)
            if handled is not None:
                schema, rows = handled
                # header block (0 rows, full structure) then the data block
                for chunk in ([], rows):
                    out = bytearray(varint(1)) + write_varint_str("")
                    out += encode_block(schema, chunk)
                    f.write(out)
            f.write(varint(5))  # EndOfStream
            f.flush()

    def close(self) -> None:
        self._sock.close()


def test_fake_server_ddl_and_insert():
    srv = FakeServer()
    client = NativeTCPClient("127.0.0.1", srv.port, database="ethereum")
    assert client.revision == min(CLIENT_REVISION, 54460) == CLIENT_REVISION
    client.execute("CREATE DATABASE IF NOT EXISTS ethereum")
    rows = _rows((1, "alice", [1], True), (2, None, [2, 3], False))
    client.insert("blocks", SCHEMA, rows, order_by=["number"])
    client.close()
    srv.close()
    assert srv.errors == []
    assert srv.queries[0].startswith("CREATE DATABASE")
    assert srv.queries[1] == (
        "INSERT INTO ethereum.blocks (`number`, `miner`, `flags`, `ok`) VALUES"
    )
    assert len(srv.received_blocks) == 1
    cols, data = srv.received_blocks[0]
    assert [c for c, _ in cols] == ["number", "miner", "flags", "ok"]
    assert data[0] == [1, 2]
    assert data[1] == [b"alice", None]
    assert data[2] == [[1], [2, 3]]


def test_fake_server_negotiates_down_old_server():
    """An old server (rev 54058: no display name/patch in hello) must still
    handshake — the client reads hello fields gated on min(client, server)."""
    srv = FakeServer(revision=54058)
    client = NativeTCPClient("127.0.0.1", srv.port)
    assert client.revision == 54058
    client.execute("SELECT 1")  # scripted server just EndOfStreams it
    client.close()
    srv.close()
    assert srv.errors == []


def test_chain_table_block_u256_and_fixedstring():
    """The four chain tables' trickiest columns survive a block round-trip:
    UInt256 (32-byte LE from Decimal) and FixedString(32) hashes."""
    from decimal import Decimal

    from chainhouse_spark.schemas import TABLES

    from chainhouse_spark.schemas import DEDUP_KEYS

    schema = TABLES["transactions"]
    row = {f.name: None for f in schema.fields}
    row.update(
        {
            "hash": b"\x22" * 32,  # dedup key: non-nullable on the wire
            "blockHash": b"\x11" * 32,
            "blockNumber": 17_000_000,
            "transactionIndex": 0,
            "value": Decimal(2**255 - 1),
            "gas": 21000,
            "from": b"\x33" * 20,
        }
    )
    block = encode_block(schema, [row], order_by=DEDUP_KEYS["transactions"])
    cols, data = read_block(io.BytesIO(block))
    by_name = {c[0]: (c[1], d) for c, d in zip(cols, data)}
    assert by_name["hash"][0] == "FixedString(32)"
    assert by_name["hash"][1][0] == b"\x22" * 32
    assert by_name["value"][0] in ("UInt256", "Nullable(UInt256)")
    assert by_name["value"][1][0] == 2**255 - 1
    assert by_name["from"][1][0] == b"\x33" * 20


def test_spark_write_native_tcp(spark):
    """End-to-end executor path: a 3-partition DataFrame streams columnar
    blocks into the fake server over per-partition connections."""
    from chainhouse_spark.sinks.native_tcp import write_native_tcp

    srv = FakeServer()
    df = (
        spark.range(0, 97)
        .selectExpr(
            "id AS number",
            "CAST(concat('m', id % 5) AS STRING) AS miner",
            "array(id, id + 1) AS flags",
            "id % 2 = 0 AS ok",
        )
        .repartition(3)
    )
    write_native_tcp(df, "blocks", f"127.0.0.1:{srv.port}", batch_size=40)
    srv.close()
    assert srv.errors == []
    got = sorted(
        n for _, data in srv.received_blocks for n in data[0]
    )  # column 0 = number
    assert got == list(range(97))
    # every INSERT named the columns explicitly against ethereum.blocks
    inserts = [q for q in srv.queries if q.startswith("INSERT")]
    assert all("ethereum.blocks (`number`, `miner`, `flags`, `ok`)" in q for q in inserts)


@pytest.mark.skipif(
    "CHAINHOUSE_CLICKHOUSE_TCP" not in os.environ,
    reason="live ClickHouse smoke: set CHAINHOUSE_CLICKHOUSE_TCP=host:port",
)
def test_live_server_smoke():
    endpoint = os.environ["CHAINHOUSE_CLICKHOUSE_TCP"]
    host, _, port = endpoint.partition(":")
    client = NativeTCPClient(host, int(port or 9000))
    try:
        assert client.execute("SELECT 1") == [[1]]
    finally:
        client.close()


def test_exception_packet_raises():
    """A server Exception packet must surface as ClickHouseError."""
    srv = FakeServer(fail_queries=True)
    client = NativeTCPClient("127.0.0.1", srv.port)
    with pytest.raises(ClickHouseError, match="does not exist"):
        client.execute("SELECT * FROM ethereum.nope")
    client.close()
    srv.close()


# ---------------------------------------------------------------------------
# read path (sources/clickhouse_read.py)


def test_client_select_header_and_rows():
    """select() returns column metadata from the header block plus all data
    rows, concatenated across blocks."""

    def handler(q):
        if "LIMIT 0" in q:
            return SCHEMA, []
        return SCHEMA, _rows(
            (7, b"\xaa", [1, 2], True), (8, None, [], False)
        )

    srv = FakeServer(select_handler=handler)
    try:
        cli = NativeTCPClient("127.0.0.1", srv.port)
        cols, data = cli.select("SELECT * FROM t")
        cli.close()
    finally:
        srv.close()
    assert srv.errors == []
    assert [n for n, _ in cols] == ["number", "miner", "flags", "ok"]
    assert cols[0][1] == "UInt64" and cols[1][1].startswith("Nullable(")
    assert data[0] == [7, 8]
    assert data[1] == [b"\xaa", None]
    assert data[2] == [[1, 2], []]
    assert data[3] == [True, False]


def test_spark_read_native_tcp_partitioned(spark):
    """read_native_tcp: LIMIT 0 schema probe on the driver, then one
    modulo-slice query per partition on executors; rows and Spark types
    round-trip (UInt64->long, String->binary, Array->array, Bool->bool)."""
    from chainhouse_spark.sources.clickhouse_read import read_native_tcp

    all_rows = _rows(
        (0, b"\x01", [1], True),
        (1, b"\x02", [2, 3], False),
        (2, None, [], True),
        (3, b"\x04", [4], False),
    )

    def handler(q):
        if "LIMIT 0" in q:
            return SCHEMA, []
        # emulate the WHERE ((number % 2) + 2) % 2 = i slice
        for pid in (0, 1):
            if f"= {pid}" in q:
                return SCHEMA, [r for r in all_rows if r["number"] % 2 == pid]
        return SCHEMA, all_rows

    srv = FakeServer(select_handler=handler)
    try:
        df = read_native_tcp(
            spark,
            f"127.0.0.1:{srv.port}",
            "SELECT * FROM blocks",
            partition_column="number",
            num_partitions=2,
        )
        got = sorted(df.collect(), key=lambda r: r.number)
    finally:
        srv.close()
    assert srv.errors == []
    assert [r.number for r in got] == [0, 1, 2, 3]
    assert got[0].miner == bytearray(b"\x01") or got[0].miner == b"\x01"
    assert got[2].miner is None
    assert list(got[1].flags) == [2, 3]
    assert got[3].ok is False
    # both slice queries actually hit the server
    slice_queries = [q for q in srv.queries if "WHERE" in q]
    assert len(slice_queries) == 2
    # driver probe used LIMIT 0
    assert any("LIMIT 0" in q for q in srv.queries)


def test_read_native_tcp_uint64_overflow_raises():
    """A UInt64 above 2^63-1 must fail loudly, not wrap into a negative."""
    from chainhouse_spark.sources.clickhouse_read import _convert

    import pytest as _pytest

    with _pytest.raises(OverflowError):
        _convert("UInt64", 1 << 63)
    assert _convert("UInt64", (1 << 63) - 1) == (1 << 63) - 1
    from decimal import Decimal

    assert _convert("UInt256", 10**38 - 1) == Decimal(10**38 - 1)
