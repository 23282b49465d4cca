"""Tests for the RPC source (fake transport — no network), the parquet sink
layout, the ClickHouse DDL emitter, and the CLI surface.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chainhouse_spark.cli import build_parser
from chainhouse_spark.schemas import RAW_BLOCK, TABLES
from chainhouse_spark.sinks import clickhouse as ch
from chainhouse_spark.sinks.parquet import read_table, write_all
from chainhouse_spark.sources.fixtures import raw_blocks_df
from chainhouse_spark.sources.rpc import fetch_heights, parse_block, raw_blocks_from_rpc
from chainhouse_spark.transforms import all_tables_from_raw


def _hx(b: bytes) -> str:
    return "0x" + b.hex()


def make_rpc_payloads(n: int) -> tuple[dict, list[dict]]:
    """Canned eth_getBlockByNumber / eth_getBlockReceipts JSON for height n,
    covering post-1559 + type-2 + logs + withdrawals when n is odd."""
    tx = {
        "hash": _hx(bytes([n]) * 32),
        "transactionIndex": "0x0",
        "chainId": "0x1",
        "type": "0x2",
        "from": _hx(bytes([n + 1]) * 20),
        "to": None if n % 3 == 0 else _hx(bytes([n + 2]) * 20),
        "value": hex(10**18 + n),
        "nonce": "0x5",
        "input": "0xdeadbeef",
        "gas": "0x5208",
        "gasPrice": "0x3b9aca00",
        "maxFeePerGas": "0x77359400",
        "maxPriorityFeePerGas": "0x3b9aca00",
        "r": _hx(bytes([7]) * 32),
        "s": _hx(bytes([8]) * 32),
        "v": "0x1b",
        "accessList": [{"address": _hx(bytes([9]) * 20), "storageKeys": []}],
    }
    receipt = {
        "transactionHash": tx["hash"],
        "contractAddress": _hx(bytes([n + 3]) * 20) if n % 3 == 0 else None,
        "cumulativeGasUsed": "0x5208",
        "effectiveGasPrice": "0x3b9aca01",
        "gasUsed": "0x5208",
        "logsBloom": "0x" + "00" * 256,
        "root": None,
        "status": "0x1",
        "logs": [
            {
                "address": _hx(bytes([n + 4]) * 20),
                "logIndex": "0x0",
                "removed": False,
                "topics": [_hx(bytes([n + 5]) * 32)],
                "data": "0xabcdef",
            }
        ],
    }
    block = {
        "hash": _hx(bytes([n + 10]) * 32),
        "number": hex(n),
        "parentHash": _hx(bytes([n + 9]) * 32),
        "uncles": [],
        "sha3Uncles": _hx(bytes([1]) * 32),
        "totalDifficulty": "0xff",
        "miner": _hx(bytes([2]) * 20),
        "difficulty": "0x0",
        "nonce": _hx(bytes([3]) * 8),
        "mixHash": _hx(bytes([4]) * 32),
        "baseFeePerGas": "0x3b9aca00",
        "gasLimit": "0x1c9c380",
        "gasUsed": "0x5208",
        "stateRoot": _hx(bytes([5]) * 32),
        "transactionsRoot": _hx(bytes([6]) * 32),
        "receiptsRoot": _hx(bytes([7]) * 32),
        "logsBloom": "0x" + "00" * 256,
        "withdrawalsRoot": _hx(bytes([8]) * 32) if n % 2 else None,
        "extraData": "0x00",
        "timestamp": hex(1_700_000_000 + n * 12),
        "size": "0x220",
        "transactions": [tx],
        "withdrawals": [
            {
                "index": hex(n * 16),
                "validatorIndex": "0x64",
                "address": _hx(bytes([11]) * 20),
                "amount": "0x3b9aca00",
            }
        ]
        if n % 2
        else None,
    }
    return block, [receipt]


def fake_transport(method: str, params: list):
    n = int(params[0], 16)
    block, receipts = make_rpc_payloads(n)
    if method == "eth_getBlockByNumber":
        return block
    if method == "eth_getBlockReceipts":
        return receipts
    raise ValueError(method)


def test_parse_block_types():
    block, receipts = make_rpc_payloads(5)
    row = parse_block(block, receipts)
    assert row["number"] == 5
    assert isinstance(row["hash"], bytes) and len(row["hash"]) == 32
    assert int(row["timestamp"]) == 1_700_000_060
    assert row["transactions"][0]["to"] is not None
    assert row["receipts"][0]["status"] == 1
    assert row["withdrawals"] is not None  # odd height
    assert row["transactions"][0]["accessList"].startswith("[")
    even = parse_block(*make_rpc_payloads(6))
    assert even["withdrawals"] is None
    assert even["transactions"][0]["to"] is None  # n%3==0 -> creation
    assert even["receipts"][0]["contractAddress"] is not None


def test_fetch_heights_retries():
    calls = {"n": 0}

    def flaky(method, params):
        calls["n"] += 1
        if calls["n"] <= 2:
            raise ConnectionError("transient")
        return fake_transport(method, params)

    rows = list(fetch_heights([4], flaky, max_retries=3, backoff_sec=0.0))
    assert len(rows) == 1 and rows[0]["number"] == 4

    def dead(method, params):
        raise ConnectionError("down")

    with pytest.raises(ConnectionError):
        list(fetch_heights([4], dead, max_retries=1, backoff_sec=0.0))


def test_rpc_source_end_to_end(spark):
    """Distributed fetch through mapPartitions with an injected transport,
    then the full transform stack."""
    raw = raw_blocks_from_rpc(
        spark, "unused://", 1, 6, parallelism=3,
        transport_factory=lambda: fake_transport,
    )
    assert raw.schema == RAW_BLOCK
    tables = all_tables_from_raw(raw)
    assert tables["blocks"].count() == 6
    assert tables["transactions"].count() == 6
    assert tables["withdraws"].count() == 3  # odd heights only
    got = {r.number for r in tables["blocks"].select("number").collect()}
    assert got == set(range(1, 7))


def test_parquet_sink_layout(spark, tmp_path):
    tables = all_tables_from_raw(raw_blocks_df(spark, 6, seed=42))
    write_all(tables, str(tmp_path), bucket_size=2)
    back = read_table(spark, "transactions", str(tmp_path))
    assert back.count() == tables["transactions"].count()
    # partition column materialized from the layout
    assert "block_bucket" in back.columns
    buckets = {r.block_bucket for r in back.select("block_bucket").distinct().collect()}
    assert buckets == {0, 1, 2}
    # partition pruning: filtering one bucket must scan fewer files
    pruned = back.filter(F.col("block_bucket") == 1)
    plan = pruned.queryExecution if False else pruned._jdf.queryExecution().executedPlan().toString()
    assert "block_bucket" in plan


def test_clickhouse_ddl():
    stmts = ch.all_ddl()
    assert stmts[0] == "CREATE DATABASE IF NOT EXISTS ethereum"
    assert len(stmts) == 5  # database + 4 tables (reference src/main.rs:53-161)
    blocks_ddl = stmts[1]
    assert "ENGINE = ReplacingMergeTree" in blocks_ddl
    assert "ORDER BY (`hash`, `number`)" in blocks_ddl
    assert "`withdrawlsRoot` Nullable(FixedString(32))" in blocks_ddl  # ref spelling
    assert "`number` UInt64" in blocks_ddl
    tx_ddl = stmts[2]
    assert "ORDER BY (`hash`)" in tx_ddl
    assert "`value` Nullable(UInt256)" in tx_ddl
    assert "`from` Nullable(FixedString(20))" in tx_ddl
    ev_ddl = stmts[3]
    assert "ORDER BY (`transactionHash`, `logIndex`)" in ev_ddl
    assert "Array(FixedString(32))" in ev_ddl  # topics
    # every declared column appears
    for name, ddl in zip(["blocks", "transactions", "events", "withdraws"], stmts[1:]):
        for f in TABLES[name].fields:
            assert f"`{f.name}`" in ddl, (name, f.name)


def test_cli_surface(capsys):
    p = build_parser()
    ns = p.parse_args(
        ["--ethereum", "http://node:8545", "--from", "100", "--to", "200",
         "--clickhouse", "ch:9000", "--schema", "--batch", "50"]
    )
    assert ns.from_block == 100 and ns.to_block == 200
    assert ns.clickhouse == "ch:9000" and ns.batch == 50 and ns.schema
    from chainhouse_spark.cli import main

    assert main(["--schema"]) == 0
    out = capsys.readouterr().out
    assert "CREATE DATABASE IF NOT EXISTS ethereum" in out
    assert out.count("CREATE TABLE") == 4


def test_jsonl_source_quarantines_corrupt_lines(spark, tmp_path):
    """Schema-enforced JSONL: clean rows parse, malformed lines are captured
    whole in _corrupt_record instead of failing the job."""
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    from chainhouse_spark.sources.files import read_jsonl, split_quarantine

    p = tmp_path / "landing.jsonl"
    p.write_text(
        '{"number": 1, "miner": "0xabc"}\n'
        '{"number": 2, "miner": "0xdef"}\n'
        "THIS IS NOT JSON\n"
        '{"number": 3, "miner": "0x123"}\n'
    )
    schema = StructType(
        [StructField("number", LongType()), StructField("miner", StringType())]
    )
    df = read_jsonl(spark, str(p), schema)
    clean, bad = split_quarantine(df)
    assert {r.number for r in clean.collect()} == {1, 2, 3}
    assert bad.count() == 1
    assert "NOT JSON" in bad.collect()[0][0]


def test_csv_source_schema_and_quarantine(spark, tmp_path):
    from pyspark.sql.types import DoubleType, LongType, StructField, StructType

    from chainhouse_spark.sources.files import read_csv, split_quarantine

    p = tmp_path / "t.csv"
    p.write_text("a,b\n1,2.5\n2,3.5\nnot_a_number,oops\n")
    schema = StructType([StructField("a", LongType()), StructField("b", DoubleType())])
    clean, bad = split_quarantine(read_csv(spark, str(p), schema))
    assert {(r.a, r.b) for r in clean.collect()} == {(1, 2.5), (2, 3.5)}
    assert bad.count() == 1


def test_compaction_heals_duplicate_slices(spark, tmp_path):
    """Append the same slice twice (at-least-once ingest), compact, and the
    at-rest table is exactly-once again without read-side dedup."""
    from chainhouse_spark.sinks.parquet import (
        compact_table,
        read_table,
        write_all,
    )
    from chainhouse_spark.sources.fixtures import raw_blocks_df
    from chainhouse_spark.transforms import all_tables_from_raw

    base = str(tmp_path / "warehouse")
    tables = all_tables_from_raw(raw_blocks_df(spark, n_blocks=6, seed=42))
    write_all(tables, base, mode="overwrite")
    write_all(tables, base, mode="append")  # duplicate slice

    n_expected = tables["transactions"].count()
    assert read_table(spark, "transactions", base).count() == 2 * n_expected

    compact_table(spark, "transactions", base)
    after = read_table(spark, "transactions", base)
    assert after.count() == n_expected
    hashes = [r.hash for r in after.select("hash").collect()]
    assert len(hashes) == len(set(hashes))


def test_orc_roundtrip_preserves_schema(spark, tmp_path):
    """ORC as an alternative columnar at-rest format: binary/decimal/array
    chain types round-trip exactly (both formats are fine at 100 TB; parquet
    is the default for its wider ecosystem and the same pruning applies)."""
    from chainhouse_spark.sources.fixtures import raw_blocks_df
    from chainhouse_spark.transforms import transactions_from_raw

    tx = transactions_from_raw(raw_blocks_df(spark, n_blocks=4, seed=42))
    path = str(tmp_path / "tx_orc")
    tx.write.mode("overwrite").orc(path)
    back = spark.read.orc(path)
    assert back.schema == tx.schema
    assert back.count() == tx.count()
    a = {r.hash for r in tx.select("hash").collect()}
    b = {r.hash for r in back.select("hash").collect()}
    assert a == b


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Column-add evolution: old slices lack the new column; mergeSchema
    reads both generations with NULLs backfilled — the at-rest contract for
    a chain that adds fields at a fork (e.g. blobGasUsed at Cancun)."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "id long, v string").write.mode(
        "overwrite"
    ).parquet(p)
    spark.createDataFrame(
        [(2, "b", 99)], "id long, v string, blob_gas long"
    ).write.mode("append").parquet(p)
    df = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(df.columns) == {"id", "v", "blob_gas"}
    rows = {r.id: r.blob_gas for r in df.collect()}
    assert rows == {1: None, 2: 99}


def test_xml_roundtrip_flat_projection(spark, tmp_path):
    """Spark-4 native XML source/sink: a flat (scalar-typed) projection of
    the blocks table round-trips through XML exactly. Binary columns are
    hex-encoded at the boundary (XML has no binary type); XML is the
    interchange-format edge of the source matrix — parquet/ORC stay the
    at-rest formats."""
    from chainhouse_spark.sources.fixtures import raw_blocks_df
    from chainhouse_spark.transforms import blocks_from_raw

    b = blocks_from_raw(raw_blocks_df(spark, n_blocks=4, seed=42)).select(
        F.hex("hash").alias("hash_hex"),
        F.col("number").cast("long").alias("number"),
        F.col("gasUsed").cast("long").alias("gas_used"),
        F.col("timestamp").cast("long").alias("ts"),
    )
    path = str(tmp_path / "blocks_xml")
    b.write.format("xml").option("rootTag", "blocks").option(
        "rowTag", "block"
    ).mode("overwrite").save(path)
    back = (
        spark.read.format("xml")
        .option("rowTag", "block")
        .schema("hash_hex string, number long, gas_used long, ts long")
        .load(path)
    )
    assert back.count() == b.count()
    a = {tuple(r) for r in b.collect()}
    c = {tuple(r) for r in back.collect()}
    assert a == c


def test_jdbc_write_path_roundtrip_derby(spark, tmp_path):
    """Execute the actual JDBC write path (K5/K6) — not just DDL strings —
    against Spark's bundled embedded Derby: all four chain tables write
    through write_jdbc and read back value-identical (arrays as JSON,
    u256 decimals as digit strings, binary as-is — the jdbc_projection
    wire contract)."""
    from chainhouse_spark.queries.ethereum import _tables
    from chainhouse_spark.sinks.clickhouse import jdbc_projection, write_jdbc
    from tests.compare import canon_rows

    url = f"jdbc:derby:{tmp_path}/chaindb;create=true"
    tables = _tables(spark)
    for name, df in tables.items():
        write_jdbc(
            df,
            name,
            endpoint="unused",
            url=url,
            driver="org.apache.derby.jdbc.EmbeddedDriver",
        )
        back = (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", name)
            .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
            .load()
        )
        expect = jdbc_projection(df).toPandas()
        got = back.toPandas()
        assert len(got) == len(expect) and len(got) > 0 or name == "withdraws"
        assert sorted(c.lower() for c in got.columns) == sorted(
            c.lower() for c in expect.columns
        )
        got.columns = [c.lower() for c in got.columns]
        expect.columns = [c.lower() for c in expect.columns]
        assert canon_rows(got) == canon_rows(expect), name

    # Idempotent re-ingest contract (K8): append twice, dedup keys collapse
    # duplicates exactly like ReplacingMergeTree FINAL would.
    from chainhouse_spark.schemas import DEDUP_KEYS

    write_jdbc(
        tables["blocks"],
        "blocks",
        endpoint="unused",
        url=url,
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    back = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "blocks")
        .option("driver", "org.apache.derby.jdbc.EmbeddedDriver")
        .load()
    )
    n_blocks = tables["blocks"].count()
    assert back.count() == 2 * n_blocks
    assert back.dropDuplicates(
        [c for c in back.columns if c.lower() in ("hash", "number")]
    ).count() == n_blocks


# ---------------------------------------------------------------------------
# RowBinary native-format insert path (sinks/rowbinary.py)
# ---------------------------------------------------------------------------


def test_rowbinary_byte_golden():
    """Exact wire bytes for a crafted row, assembled independently with
    struct.pack so an encoder bug can't cancel out."""
    import struct

    from pyspark.sql import Row
    from pyspark.sql.types import (
        ArrayType, BinaryType, BooleanType, DecimalType, LongType,
        StringType, StructField, StructType,
    )
    from decimal import Decimal

    from chainhouse_spark.sinks.rowbinary import row_encoder

    schema = StructType([
        StructField("number", LongType(), False),
        StructField("hash", BinaryType(), False),        # FixedString(32)
        StructField("value", DecimalType(38, 0), True),  # Nullable(UInt256)
        StructField("removed", BooleanType(), False),
        StructField("note", StringType(), True),         # Nullable(String)
        StructField("topics", ArrayType(BinaryType()), True),  # Array(FS32)
    ])
    h = bytes(range(32))
    t0, t1 = bytes(range(32, 64)), bytes(range(64, 96))
    row = Row(number=7, hash=h, value=Decimal(2**200 + 5), removed=True,
              note=None, topics=[t0, t1])
    got = row_encoder(schema, ["hash"])(row)

    expect = struct.pack("<Q", 7)                     # UInt64 LE
    expect += h                                       # FixedString(32)
    expect += b"\x00" + (2**200 + 5).to_bytes(32, "little")  # Nullable u256
    expect += b"\x01"                                 # Boolean true
    expect += b"\x01"                                 # note NULL
    expect += b"\x02" + t0 + t1                       # Array: varint(2) + items
    assert got == expect


def test_rowbinary_varint_boundaries():
    from chainhouse_spark.sinks.rowbinary import varint

    assert varint(0) == b"\x00"
    assert varint(127) == b"\x7f"
    assert varint(128) == b"\x80\x01"
    assert varint(300) == b"\xac\x02"
    assert varint(1 << 21) == b"\x80\x80\x80\x01"


def _rb_decode(buf, schema, order_by):
    """Independent minimal RowBinary decoder (test-side only)."""
    from decimal import Decimal

    from pyspark.sql.types import (
        ArrayType, BinaryType, BooleanType, DecimalType, LongType, StringType,
    )

    from chainhouse_spark.sinks.clickhouse import FIXED_WIDTHS

    pos = 0

    def rd(n):
        nonlocal pos
        out = buf[pos:pos + n]
        assert len(out) == n
        pos += n
        return out

    def rvarint():
        nonlocal pos
        shift = v = 0
        while True:
            b = buf[pos]; pos += 1
            v |= (b & 0x7F) << shift
            if not b & 0x80:
                return v
            shift += 7

    def rval(name, dtype):
        if isinstance(dtype, BinaryType):
            if name in FIXED_WIDTHS:
                return rd(FIXED_WIDTHS[name])
            return rd(rvarint())
        if isinstance(dtype, DecimalType):
            return Decimal(int.from_bytes(rd(32), "little"))
        if isinstance(dtype, LongType):
            return int.from_bytes(rd(8), "little")
        if isinstance(dtype, BooleanType):
            return rd(1) != b"\x00"
        if isinstance(dtype, StringType):
            return rd(rvarint()).decode()
        if isinstance(dtype, ArrayType):
            return [rval(name, dtype.elementType) for _ in range(rvarint())]
        raise AssertionError(f"decoder gap: {dtype}")

    rows = []
    while pos < len(buf):
        rec = {}
        for f in schema.fields:
            nullable = (f.nullable and f.name not in order_by
                        and not isinstance(f.dataType, ArrayType))
            if nullable:
                if rd(1) == b"\x01":
                    rec[f.name] = None
                    continue
            rec[f.name] = rval(f.name, f.dataType)
        rows.append(rec)
    assert pos == len(buf)
    return rows


def test_rowbinary_roundtrip_all_four_tables(spark):
    """Encode every row of the fixture pipeline's four tables; an
    independent decoder must reproduce the rows exactly (u256 decimals,
    fixed widths, arrays, era-dependent NULLs)."""
    from decimal import Decimal

    from chainhouse_spark.queries.ethereum import _tables
    from chainhouse_spark.schemas import DEDUP_KEYS, TABLES
    from chainhouse_spark.sinks.rowbinary import encode_rows

    tables = _tables(spark)
    checked = 0
    for name, df in tables.items():
        rows = df.collect()
        buf = encode_rows(rows, name)
        back = _rb_decode(buf, TABLES[name], DEDUP_KEYS[name])
        assert len(back) == len(rows)
        for orig, dec in zip((r.asDict() for r in rows), back):
            for k, v in orig.items():
                got = dec[k]
                if isinstance(v, (bytes, bytearray)):
                    assert bytes(v) == got, (name, k)
                elif isinstance(v, list) and v and isinstance(v[0], (bytes, bytearray)):
                    assert [bytes(x) for x in v] == got, (name, k)
                elif v is None and isinstance(got, list):
                    assert got == []  # Array NULL -> [] on the wire
                else:
                    assert v == got or (isinstance(v, Decimal) and Decimal(got) == v), (
                        name, k, v, got)
                checked += 1
    assert checked > 1000


def test_rowbinary_http_insert_path(spark):
    """Drive write_rowbinary_http against a fake ClickHouse HTTP endpoint:
    the INSERT query must name the table + every column + FORMAT RowBinary,
    and the POsted bytes must decode to the dataframe's rows."""
    import threading
    import urllib.parse
    from http.server import BaseHTTPRequestHandler, HTTPServer

    from chainhouse_spark.queries.ethereum import _tables
    from chainhouse_spark.schemas import DEDUP_KEYS, TABLES
    from chainhouse_spark.sinks.rowbinary import write_rowbinary_http

    received = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.append((urllib.parse.unquote(
                urllib.parse.urlparse(self.path).query), self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        blocks = _tables(spark)["blocks"]
        write_rowbinary_http(
            blocks, "blocks", f"127.0.0.1:{srv.server_port}", batch_size=3
        )
        assert received, "no INSERT arrived"
        q0 = received[0][0]
        assert q0.startswith("query=INSERT INTO ethereum.blocks (`hash`, `number`")
        assert q0.endswith("FORMAT RowBinary")
        all_bytes = b"".join(body for _, body in received)
        back = _rb_decode(all_bytes, TABLES["blocks"], DEDUP_KEYS["blocks"])
        assert len(back) == blocks.count()
        nums = sorted(r["number"] for r in back)
        assert nums == sorted(r.number for r in blocks.collect())
    finally:
        srv.shutdown()


def test_cli_warehouse_sql(spark, tmp_path, capsys):
    """--warehouse registers the four ingested tables as views; --sql runs
    ad-hoc analytics over them — the analyst path after ingest."""
    from chainhouse_spark.cli import main
    from chainhouse_spark.queries.ethereum import _tables
    from chainhouse_spark.sinks.parquet import write_all

    write_all(_tables(spark), str(tmp_path), mode="append")
    rc = main([
        "--warehouse", str(tmp_path),
        "--sql",
        "SELECT count(*) AS n_tx, count(DISTINCT blockNumber) AS n_blocks "
        "FROM transactions",
        "--show", "5",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "n_tx" in out and "n_blocks" in out
    # fixture pipeline: 35 transactions across 7 non-empty blocks
    assert "35" in out and "7" in out


def test_cli_warehouse_sql_clickhouse_dialect(spark, tmp_path, capsys):
    """--dialect clickhouse: the query a reference user ran against their
    ClickHouse executes unchanged over the ingested warehouse."""
    from chainhouse_spark.cli import main
    from chainhouse_spark.queries.ethereum import _tables
    from chainhouse_spark.sinks.parquet import write_all

    write_all(_tables(spark), str(tmp_path), mode="append")
    rc = main([
        "--warehouse", str(tmp_path),
        "--dialect", "clickhouse",
        "--sql",
        "SELECT toUInt64(count()) AS n_tx, uniqExact(blockNumber) AS n_blocks "
        "FROM transactions FORMAT TabSeparated",
        "--show", "5",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    assert "n_tx" in out and "n_blocks" in out
    assert "35" in out and "7" in out
