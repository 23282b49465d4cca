"""Minimal pure-stdlib PNG codec (zlib + numpy) for the real-decode path.

Supports the common still-image surface: 8-bit depth, color types 0
(grayscale), 2 (RGB), 4 (gray+alpha), 6 (RGBA), no interlace. That covers
what fixture generators and most ML-corpus thumbnails emit; palette
(type 3), 16-bit, and Adam7 raise with a pointer at full codec libraries.

The decoder implements the five scanline filters (None/Sub/Up/Average/
Paeth) per the PNG spec §9; the encoder can emit any filter per row, which
the round-trip tests use to exercise every unfilter branch.

This is operator plumbing, not a performance path: payloads are decoded
inside Arrow-batched `mapInPandas` workers (multimodal/ops.py), so decode
cost scales out with partitions; per-pixel work here is numpy-vectorized
along each row with only the inherently sequential filters (Sub/Average/
Paeth carry a left-neighbor dependency) looping per pixel.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes → (H, W) or (H, W, C) uint8 array."""
    if payload[:8] != _SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    pos = 8
    width = height = None
    channels = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise NotImplementedError(
                    f"PNG bit depth {depth}: only 8-bit supported — use a "
                    "full codec library for 16-bit/packed images"
                )
            if color not in _CHANNELS:
                raise NotImplementedError(
                    f"PNG color type {color}: palette images need a full "
                    "codec library"
                )
            if interlace:
                raise NotImplementedError("Adam7 interlace not supported")
            channels = _CHANNELS[color]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("not a PNG: missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"PNG data is {len(raw)} bytes; expected {height * (stride + 1)}"
        )
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # bytes per pixel at 8-bit depth
    for y in range(height):
        filt = int(rows[y, 0])
        line = rows[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if filt == 0:  # None
            cur = line
        elif filt == 2:  # Up
            cur = (line + prev) & 0xFF
        elif filt == 1:  # Sub — sequential left-neighbor recurrence
            cur = line.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif filt == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif filt == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(left, int(prev[x]), ul)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {filt} is invalid")
        out[y] = cur.astype(np.uint8)
    img = out.reshape(height, width, channels)
    return img[:, :, 0] if channels == 1 else img


def _chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def encode_png(arr: np.ndarray, filter_strategy: str = "none") -> bytes:
    """(H, W[, C]) uint8 array → PNG bytes.

    filter_strategy: 'none' emits filter 0 everywhere (fast, deterministic);
    'cycle' rotates filters 0-4 by row — exists to exercise every decoder
    unfilter branch in round-trip tests.
    """
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    height, width, channels = arr.shape
    if channels not in _COLOR_TYPE:
        raise ValueError(f"{channels} channels unsupported (1/2/3/4)")
    color = _COLOR_TYPE[channels]
    flat = arr.reshape(height, width * channels).astype(np.int32)
    stride = width * channels
    bpp = channels
    lines = bytearray()
    for y in range(height):
        filt = (y % 5) if filter_strategy == "cycle" else 0
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(stride, np.int32)
        if filt == 0:
            enc = cur
        elif filt == 1:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - left) & 0xFF
        elif filt == 2:
            enc = (cur - prev) & 0xFF
        elif filt == 3:
            left = np.concatenate([np.zeros(bpp, np.int32), cur[:-bpp]])
            enc = (cur - ((left + prev) >> 1)) & 0xFF
        else:  # Paeth
            enc = cur.copy()
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                enc[x] = (cur[x] - _paeth(left, int(prev[x]), ul)) & 0xFF
        lines.append(filt)
        lines += enc.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _chunk(b"IEND", b"")
    )
