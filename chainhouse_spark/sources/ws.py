"""Minimal RFC 6455 WebSocket JSON-RPC transport — stdlib only.

Reference parity: the reference connects to the Ethereum node over a
WebSocket provider (`Provider::<Ws>::connect`, src/main.rs:50); the HTTP
transport in rpc.py speaks the same JSON-RPC payloads but cannot reach a
`ws://`/`wss://`-only node. This client implements the subset of RFC 6455 a
request/response JSON-RPC session needs:

- opening handshake with Sec-WebSocket-Accept validation,
- masked client text frames (7/16/64-bit payload lengths),
- server frame parsing incl. fragmentation (continuation frames),
- control frames: ping answered with pong, close answered and surfaced.

One client per Spark partition (created executor-side by the transport
factory, same lifecycle as http_transport) — connections never cross the
driver/executor serialization boundary. Responses are matched by JSON-RPC
id, so unsolicited server pushes (eth_subscribe notifications) are skipped
rather than mis-delivered.
"""

from __future__ import annotations

import base64
import hashlib
import json
import os
import socket
import ssl
import struct
from typing import Any
from urllib.parse import urlparse

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT = 0x0
OP_TEXT = 0x1
OP_CLOSE = 0x8
OP_PING = 0x9
OP_PONG = 0xA


class WebSocketClosed(ConnectionError):
    """Server sent a close frame (or the socket died)."""


class WebSocketClient:
    """Blocking WebSocket client for a single JSON-RPC session."""

    def __init__(self, url: str, timeout: float = 30.0):
        u = urlparse(url)
        if u.scheme not in ("ws", "wss"):
            raise ValueError(f"not a websocket url: {url!r}")
        host = u.hostname or "localhost"
        port = u.port or (443 if u.scheme == "wss" else 80)
        self._sock = socket.create_connection((host, port), timeout)
        self._sock.settimeout(timeout)
        if u.scheme == "wss":
            ctx = ssl.create_default_context()
            self._sock = ctx.wrap_socket(self._sock, server_hostname=host)
        self._buf = b""
        self._handshake(host, port, u)

    def _handshake(self, host: str, port: int, u) -> None:
        key = base64.b64encode(os.urandom(16)).decode()
        path = u.path or "/"
        if u.query:
            path += "?" + u.query
        self._sock.sendall(
            (
                f"GET {path} HTTP/1.1\r\n"
                f"Host: {host}:{port}\r\n"
                "Upgrade: websocket\r\n"
                "Connection: Upgrade\r\n"
                f"Sec-WebSocket-Key: {key}\r\n"
                "Sec-WebSocket-Version: 13\r\n\r\n"
            ).encode()
        )
        head = self._read_until(b"\r\n\r\n")
        status = head.split(b"\r\n", 1)[0]
        if b" 101 " not in status + b" ":
            raise ConnectionError(f"websocket handshake rejected: {status!r}")
        expect = base64.b64encode(
            hashlib.sha1((key + _GUID).encode()).digest()
        ).decode()
        accept = None
        for line in head.split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            if k.strip().lower() == b"sec-websocket-accept":
                accept = v.strip().decode()
        if accept != expect:
            raise ConnectionError(
                f"bad Sec-WebSocket-Accept: got {accept!r}, want {expect!r}"
            )

    # -- socket plumbing ---------------------------------------------------
    def _read_until(self, marker: bytes) -> bytes:
        while marker not in self._buf:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise WebSocketClosed("socket closed during read")
            self._buf += chunk
        head, self._buf = self._buf.split(marker, 1)
        return head

    def _read_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self._sock.recv(65536)
            if not chunk:
                raise WebSocketClosed("socket closed during read")
            self._buf += chunk
        out, self._buf = self._buf[:n], self._buf[n:]
        return out

    # -- framing -----------------------------------------------------------
    def _send_frame(self, opcode: int, payload: bytes) -> None:
        # client frames MUST be masked (RFC 6455 §5.3)
        mask = os.urandom(4)
        header = bytes([0x80 | opcode])
        n = len(payload)
        if n < 126:
            header += bytes([0x80 | n])
        elif n < 1 << 16:
            header += bytes([0x80 | 126]) + struct.pack(">H", n)
        else:
            header += bytes([0x80 | 127]) + struct.pack(">Q", n)
        masked = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        self._sock.sendall(header + mask + masked)

    def _recv_frame(self) -> tuple[bool, int, bytes]:
        b1, b2 = self._read_exact(2)
        fin = bool(b1 & 0x80)
        opcode = b1 & 0x0F
        masked = bool(b2 & 0x80)
        n = b2 & 0x7F
        if n == 126:
            (n,) = struct.unpack(">H", self._read_exact(2))
        elif n == 127:
            (n,) = struct.unpack(">Q", self._read_exact(8))
        mask = self._read_exact(4) if masked else b""
        payload = self._read_exact(n)
        if masked:
            payload = bytes(b ^ mask[i % 4] for i, b in enumerate(payload))
        return fin, opcode, payload

    # -- messages ----------------------------------------------------------
    def send_text(self, text: str) -> None:
        self._send_frame(OP_TEXT, text.encode())

    def recv_text(self) -> str:
        """Next complete text message; control frames handled in-line."""
        parts: list[bytes] = []
        while True:
            fin, opcode, payload = self._recv_frame()
            if opcode == OP_PING:
                self._send_frame(OP_PONG, payload)
                continue
            if opcode == OP_PONG:
                continue
            if opcode == OP_CLOSE:
                try:
                    self._send_frame(OP_CLOSE, payload[:2])
                finally:
                    self._sock.close()
                raise WebSocketClosed("server closed the websocket")
            if opcode in (OP_TEXT, OP_CONT):
                parts.append(payload)
                if fin:
                    return b"".join(parts).decode()
                continue
            raise ConnectionError(f"unexpected websocket opcode {opcode:#x}")

    def close(self) -> None:
        try:
            self._send_frame(OP_CLOSE, struct.pack(">H", 1000))
        except OSError:
            pass
        finally:
            self._sock.close()


def ws_transport(endpoint: str, timeout: float = 30.0):
    """JSON-RPC Transport over one WebSocket connection (the ws/wss
    counterpart of rpc.http_transport; same signature, same per-partition
    lifecycle). Responses match on JSON-RPC id; unsolicited notifications
    are skipped.

    Transport errors (closed socket, OS error, timeout) tear the connection
    down before re-raising: a timeout mid-frame leaves the byte stream
    desynchronized, so the same client must never be reused — the caller's
    retry (sources/rpc.py fetch bounded retries, else Spark task retry) gets
    a freshly-connected client with clean framing state."""
    state: dict[str, Any] = {"client": None, "id": 0}

    def call(method: str, params: list[Any]) -> Any:
        if state["client"] is None:
            state["client"] = WebSocketClient(endpoint, timeout=timeout)
        client = state["client"]
        state["id"] += 1
        rid = state["id"]
        try:
            client.send_text(
                json.dumps(
                    {"jsonrpc": "2.0", "id": rid, "method": method, "params": params}
                )
            )
            while True:
                body = json.loads(client.recv_text())
                if body.get("id") != rid:  # subscription push etc.
                    continue
                if "error" in body:
                    raise RuntimeError(f"RPC error for {method}: {body['error']}")
                return body["result"]
        except (WebSocketClosed, OSError):
            state["client"] = None
            try:
                client.close()
            except OSError:
                pass
            raise

    return call
