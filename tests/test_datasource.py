"""Custom `ethereum` DataSource: partition slicing, fixture-transport reads,
equivalence with the fixture DataFrame, and downstream transform compat."""

from __future__ import annotations

from chainhouse_spark.sources.datasource import (
    EthereumReader,
    register_ethereum_source,
)


def _read(spark, **opts):
    register_ethereum_source(spark)
    r = spark.read.format("ethereum")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_partition_slicing():
    r = EthereumReader({"from": "0", "to": "9", "parallelism": "4", "transport": "fixture"})
    parts = r.partitions()
    covered = [h for p in parts for h in range(p.start, p.end + 1)]
    assert covered == list(range(10))
    assert len(parts) == 4
    # never more partitions than heights
    r1 = EthereumReader({"from": "5", "to": "6", "parallelism": "32", "transport": "fixture"})
    assert len(r1.partitions()) == 2


def test_fixture_read_matches_fixture_df(spark):
    from chainhouse_spark.sources.fixtures import raw_blocks_df

    got = _read(spark, **{"from": 0, "to": 7, "transport": "fixture", "seed": 42,
                          "parallelism": 3})
    exp = raw_blocks_df(spark, n_blocks=8, seed=42)
    assert got.schema == exp.schema
    g = {bytes(r.hash).hex() for r in got.select("hash").collect()}
    e = {bytes(r.hash).hex() for r in exp.select("hash").collect()}
    assert g == e and len(g) == 8


def test_transforms_run_on_datasource(spark):
    from chainhouse_spark.transforms import all_tables_from_raw

    raw = _read(spark, **{"from": 0, "to": 4, "transport": "fixture"})
    tables = all_tables_from_raw(raw)
    assert tables["blocks"].count() == 5
    assert tables["transactions"].count() > 0
    # parent denormalization survived the source swap
    row = tables["transactions"].select("blockNumber").first()
    assert row.blockNumber is not None


def test_http_requires_endpoint():
    import pytest

    with pytest.raises(ValueError):
        EthereumReader({"from": "0", "to": "1"})


# ---------------------------------------------------------------------------
# WebSocket transport (sources/ws.py): fake RFC 6455 server with its own
# independent framing code (so symmetric client bugs can't cancel out).
# ---------------------------------------------------------------------------


def _ws_fake_server(handler, ready, record):
    """One-connection RFC 6455 server: handshake, then per text message call
    `handler(dict) -> dict`, interleaving a ping before each response."""
    import base64
    import hashlib
    import json
    import socket
    import struct

    srv = socket.socket()
    srv.bind(("127.0.0.1", 0))
    srv.listen(1)
    ready["port"] = srv.getsockname()[1]
    ready["event"].set()
    conn, _ = srv.accept()
    conn.settimeout(10)
    buf = b""
    while b"\r\n\r\n" not in buf:
        buf += conn.recv(65536)
    head, buf = buf.split(b"\r\n\r\n", 1)
    key = next(
        line.split(b":", 1)[1].strip()
        for line in head.split(b"\r\n")
        if line.lower().startswith(b"sec-websocket-key")
    )
    accept = base64.b64encode(
        hashlib.sha1(key + b"258EAFA5-E914-47DA-95CA-C5AB0DC85B11").digest()
    ).decode()
    conn.sendall(
        (
            "HTTP/1.1 101 Switching Protocols\r\nUpgrade: websocket\r\n"
            f"Connection: Upgrade\r\nSec-WebSocket-Accept: {accept}\r\n\r\n"
        ).encode()
    )

    def read_exact(n):
        nonlocal buf
        while len(buf) < n:
            chunk = conn.recv(65536)
            if not chunk:
                raise ConnectionError("client hung up")
            buf += chunk
        out, rest = buf[:n], buf[n:]
        buf = rest
        return out

    def read_frame():
        b1, b2 = read_exact(2)
        opcode, masked, n = b1 & 0x0F, bool(b2 & 0x80), b2 & 0x7F
        if n == 126:
            (n,) = struct.unpack(">H", read_exact(2))
        elif n == 127:
            (n,) = struct.unpack(">Q", read_exact(8))
        mask = read_exact(4) if masked else b""
        payload = read_exact(n)
        if masked:
            payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        return opcode, payload

    def send_frame(opcode, payload):  # server frames unmasked
        hdr = bytes([0x80 | opcode])
        if len(payload) < 126:
            hdr += bytes([len(payload)])
        else:
            hdr += bytes([126]) + struct.pack(">H", len(payload))
        conn.sendall(hdr + payload)

    try:
        while True:
            opcode, payload = read_frame()
            if opcode == 0x8:  # close
                send_frame(0x8, payload[:2])
                return
            if opcode == 0xA:  # pong
                record["pongs"] += 1
                continue
            if opcode != 0x1:
                continue
            req = json.loads(payload)
            record["frames"].append(req["method"])
            send_frame(0x9, b"hb")  # ping the client mid-conversation
            resp = handler(req)
            send_frame(0x1, json.dumps(resp).encode())
    except ConnectionError:
        pass
    finally:
        conn.close()
        srv.close()


def test_ws_transport_end_to_end():
    """ws_transport against an independent fake RFC 6455 server: handshake
    validates, requests arrive unmasked-correctly, pings are ponged, and
    out-of-band notifications are skipped while matching by id."""
    import json
    import threading

    from chainhouse_spark.sources.rpc import transport_for
    from tests.test_sources_sinks import make_rpc_payloads

    blk, receipts = make_rpc_payloads(2)

    def handler(req):
        if req["method"] == "eth_getBlockByNumber":
            return {"jsonrpc": "2.0", "id": req["id"], "result": blk}
        return {"jsonrpc": "2.0", "id": req["id"], "result": receipts}

    ready = {"event": threading.Event()}
    record = {"frames": [], "pongs": 0}
    t = threading.Thread(
        target=_ws_fake_server, args=(handler, ready, record), daemon=True
    )
    t.start()
    assert ready["event"].wait(5)

    transport = transport_for(f"ws://127.0.0.1:{ready['port']}")
    got_blk = transport("eth_getBlockByNumber", ["0x1", True])
    got_rc = transport("eth_getBlockReceipts", ["0x1"])
    assert got_blk == json.loads(json.dumps(blk))
    assert got_rc == json.loads(json.dumps(receipts))
    assert record["frames"] == ["eth_getBlockByNumber", "eth_getBlockReceipts"]
    assert record["pongs"] >= 1  # client answered the server pings


def test_ws_transport_feeds_fetch_heights():
    """The WS transport slots into the same fetch_heights pipeline as HTTP
    (S2-S5 parity: one client, two RPCs per height)."""
    import threading

    from chainhouse_spark.sources.rpc import fetch_heights, transport_for
    from tests.test_sources_sinks import make_rpc_payloads

    blk, receipts = make_rpc_payloads(3)

    def handler(req):
        if req["method"] == "eth_getBlockByNumber":
            return {"jsonrpc": "2.0", "id": req["id"], "result": blk}
        return {"jsonrpc": "2.0", "id": req["id"], "result": receipts}

    ready = {"event": threading.Event()}
    record = {"frames": [], "pongs": 0}
    threading.Thread(
        target=_ws_fake_server, args=(handler, ready, record), daemon=True
    ).start()
    assert ready["event"].wait(5)

    rows = list(
        fetch_heights([7], transport_for(f"ws://127.0.0.1:{ready['port']}"))
    )
    assert len(rows) == 1
    assert rows[0]["number"] is not None
    assert len(rows[0]["transactions"]) == len(blk["transactions"])


# ---------------------------------------------------------------------------
# Streaming reader: chain-head follower with checkpointable height offsets
# ---------------------------------------------------------------------------


def _run_stream_until(spark, ck, query_name, n_blocks, max_per_batch, want, timeout=90):
    """Start the fixture head-follower, poll the memory sink until `want`
    rows (or timeout), stop. Python streaming sources don't support
    Trigger.AvailableNow, so catch-up happens across real micro-batches."""
    import time

    from chainhouse_spark.sources.datasource import register_ethereum_source

    register_ethereum_source(spark)
    stream = (
        spark.readStream.format("ethereum")
        .option("transport", "fixture")
        .option("n_blocks", n_blocks)
        .option("max_per_batch", max_per_batch)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName(query_name)
        .option("checkpointLocation", ck)
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        deadline = time.time() + timeout
        while time.time() < deadline:
            if spark.sql(f"SELECT count(*) AS n FROM {query_name}").collect()[0].n >= want:
                break
            time.sleep(0.5)
        # one extra beat so the last batch commits its offset
        time.sleep(1.5)
    finally:
        q.stop()
        q.awaitTermination(30)


def test_stream_reader_follows_head_and_catches_up(spark, tmp_path):
    """readStream over the fixture chain: micro-batches advance the height
    offset to the head (8 blocks via batches of <= 3); every block arrives
    exactly once."""
    _run_stream_until(spark, str(tmp_path / "ck"), "eth_stream_catchup",
                      n_blocks=8, max_per_batch=3, want=8)
    got = spark.sql(
        "SELECT number, count(*) AS n FROM eth_stream_catchup GROUP BY number"
    ).collect()
    assert sorted(r.number for r in got) == list(range(8))
    assert all(r.n == 1 for r in got)


def test_stream_reader_resumes_from_checkpoint(spark, tmp_path):
    """Restarting the query with the same checkpoint must resume AFTER the
    last committed height (the memory sink can't recover checkpoints, so
    this drives the real file-sink path): run 1 lands blocks 0..4, the
    chain advances while the query is down, run 2 appends exactly 5..7 —
    every height exactly once across restarts."""
    import time

    from chainhouse_spark.sources.datasource import register_ethereum_source

    register_ethereum_source(spark)
    ck = str(tmp_path / "ck2")
    out = str(tmp_path / "out")

    def run(n_blocks, want):
        stream = (
            spark.readStream.format("ethereum")
            .option("transport", "fixture")
            .option("n_blocks", n_blocks)
            .option("max_per_batch", 2)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + 90
            while time.time() < deadline:
                try:
                    n = spark.read.parquet(out).count()
                except Exception:
                    n = 0
                if n >= want:
                    break
                time.sleep(0.5)
            time.sleep(1.5)  # let the last batch's offset commit
        finally:
            q.stop()
            q.awaitTermination(30)

    run(5, want=5)
    first = spark.read.parquet(out).select("number").collect()
    assert sorted(r.number for r in first) == list(range(5))
    run(8, want=8)  # chain advanced by 3 blocks while the query was down
    rows = spark.read.parquet(out).groupBy("number").count().collect()
    assert sorted(r.number for r in rows) == list(range(8))
    assert all(r["count"] == 1 for r in rows)  # no replays across restart


def _ws_client_over_socketpair():
    """WebSocketClient wired to a raw socketpair, skipping the HTTP
    handshake — unit-tests the framing layer in isolation."""
    import socket

    from chainhouse_spark.sources.ws import WebSocketClient

    a, b = socket.socketpair()
    client = WebSocketClient.__new__(WebSocketClient)
    client._sock = a
    client._buf = b""
    return client, b


def _server_frame(opcode, payload, fin=True, length_mode="auto"):
    import struct

    hdr = bytes([(0x80 if fin else 0x00) | opcode])
    n = len(payload)
    if length_mode == "force64":
        hdr += bytes([127]) + struct.pack(">Q", n)
    elif n < 126 and length_mode == "auto":
        hdr += bytes([n])
    else:
        hdr += bytes([126]) + struct.pack(">H", n)
    return hdr + payload


def test_ws_client_reassembles_fragmented_and_extended_frames():
    """TEXT+CONT fragmentation, 16-bit and 64-bit payload lengths, and an
    interleaved ping must all reassemble into the right messages."""
    client, srv = _ws_client_over_socketpair()
    big16 = b"x" * 300          # 16-bit extended length
    big64 = b"y" * 200          # artificially 64-bit-encoded length
    srv.sendall(
        _server_frame(0x1, b"hel", fin=False)
        + _server_frame(0x9, b"hb")              # ping inside a fragment run
        + _server_frame(0x0, b"lo ", fin=False)
        + _server_frame(0x0, b"world", fin=True)
        + _server_frame(0x1, big16)
        + _server_frame(0x1, big64, length_mode="force64")
    )
    assert client.recv_text() == "hello world"
    assert client.recv_text() == big16.decode()
    assert client.recv_text() == big64.decode()
    # the ping was answered with a masked pong carrying the same payload
    hdr = srv.recv(2)
    assert hdr[0] & 0x0F == 0xA and hdr[1] & 0x80  # pong, masked
    n = hdr[1] & 0x7F
    mask = srv.recv(4)
    body = bytes(c ^ mask[i % 4] for i, c in enumerate(srv.recv(n)))
    assert body == b"hb"


def test_ws_client_surfaces_server_close():
    import struct

    import pytest

    from chainhouse_spark.sources.ws import WebSocketClosed

    client, srv = _ws_client_over_socketpair()
    srv.sendall(_server_frame(0x8, struct.pack(">H", 1000)))
    with pytest.raises(WebSocketClosed):
        client.recv_text()
