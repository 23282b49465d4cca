"""Decode layer for multimodal payloads.

The fake codecs are deterministic reinterpretations of the payload bytes
(numpy views, zero-copy) — they make the Spark-side plumbing (schema, batch
shape, partitioning) real and testable without image/audio libraries.

Real decode is STUBBED: the container ships no PIL/libsndfile/ffmpeg, so
``decode_real`` gates on import and raises NotImplementedError with a clear
marker. Swapping it in changes nothing about the operators' Spark plumbing —
same mapInPandas signature, same output schema.
"""

from __future__ import annotations

import numpy as np


def decode_image(payload: bytes, height: int, width: int, channels: int = 3) -> np.ndarray:
    """payload → (H, W, C) uint8 array. Deterministic fake 'decode'."""
    arr = np.frombuffer(payload, dtype=np.uint8)
    expected = height * width * channels
    if arr.size != expected:
        raise ValueError(f"payload is {arr.size} bytes, meta says {expected}")
    return arr.reshape(height, width, channels)


def decode_audio(payload: bytes) -> np.ndarray:
    """payload → int16 PCM mono samples (little-endian)."""
    return np.frombuffer(payload, dtype="<i2")


def decode_video(payload: bytes, n_frames: int, height: int, width: int, channels: int = 3) -> np.ndarray:
    """payload → (F, H, W, C) uint8 frames."""
    return np.frombuffer(payload, dtype=np.uint8).reshape(n_frames, height, width, channels)


def encode_image(arr: np.ndarray) -> bytes:
    """(H, W, C) uint8 → payload bytes (inverse of decode_image)."""
    return np.ascontiguousarray(arr, dtype=np.uint8).tobytes()


def decode_real(payload: bytes, mime: str):
    """Real codec path — NOT IMPLEMENTED in this environment (no PIL /
    soundfile / av in the container). The operators only call this for
    non-'*/fake' mime types, so the fake pipeline never hits it."""
    try:
        if mime.startswith("image/"):
            import io

            from PIL import Image  # noqa: F401

            return np.asarray(Image.open(io.BytesIO(payload)))
        if mime.startswith("audio/"):
            import io

            import soundfile  # noqa: F401

            return soundfile.read(io.BytesIO(payload))[0]
    except ImportError as e:
        raise NotImplementedError(
            f"real decode for {mime!r} requires codec libraries not present "
            "in this environment (PIL/soundfile/av); use the deterministic "
            "fake codecs or install the libraries"
        ) from e
    raise NotImplementedError(f"no codec registered for mime {mime!r}")
