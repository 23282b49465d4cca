"""Decode layer for multimodal payloads.

The fake codecs are deterministic reinterpretations of the payload bytes
(numpy views, zero-copy) — they make the Spark-side plumbing (schema, batch
shape, partitioning) real and testable without image/audio libraries.

Real decode: PNG (pure-stdlib codec, multimodal/png.py) and 16-bit RIFF/WAV
(stdlib `wave`) decode natively — no external libraries. Other formats
(JPEG, FLAC, video containers) gate on optional imports (PIL/soundfile) and
raise NotImplementedError with a clear marker when absent. Either path
changes nothing about the operators' Spark plumbing — same mapInPandas
signature, same output schema.
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


def decode_wav(payload: bytes) -> np.ndarray:
    """RIFF/WAV PCM bytes → int16 samples, shape (n,) mono or (n, ch).
    Pure stdlib (`wave` module); 16-bit PCM only."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise NotImplementedError(
                f"WAV sample width {w.getsampwidth()}: only 16-bit PCM "
                "supported — use a full codec library for other widths"
            )
        n_ch = w.getnchannels()
        frames = w.readframes(w.getnframes())
    samples = np.frombuffer(frames, dtype="<i2")
    return samples if n_ch == 1 else samples.reshape(-1, n_ch)


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """int16 samples (mono (n,) or (n, ch)) → RIFF/WAV PCM bytes."""
    import io
    import wave

    samples = np.ascontiguousarray(samples, dtype="<i2")
    n_ch = 1 if samples.ndim == 1 else samples.shape[1]
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_real(payload: bytes, mime: str):
    """Real codec path. PNG and WAV decode here with pure-stdlib codecs
    (multimodal/png.py, the `wave` module) — the two formats fixture
    generators and ML-corpus thumbnails actually emit. Other formats
    (JPEG/FLAC/video) gate on optional libraries the container does not
    ship and raise NotImplementedError with a clear marker. The operators
    only call this for non-'*/fake' mime types."""
    if mime == "image/png" or payload[:8] == b"\x89PNG\r\n\x1a\n":
        from chainhouse_spark.multimodal.png import decode_png

        return decode_png(payload)
    # RIFF is a container family (WAV but also WEBP/AVI): sniff requires
    # the 'WAVE' form tag at bytes 8-12, else webp/avi payloads would die
    # in the WAV decoder instead of the optional-library path (ADVICE r04).
    if mime in ("audio/wav", "audio/x-wav", "audio/wave") or (
        payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    ):
        return decode_wav(payload)
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
            "in this environment (PIL/soundfile/av); PNG and 16-bit WAV "
            "decode natively — re-encode, use the deterministic fake "
            "codecs, or install the libraries"
        ) from e
    raise NotImplementedError(f"no codec registered for mime {mime!r}")
