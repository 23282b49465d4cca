"""Multimodal plumbing tests: deterministic asset construction, payload size
== typed metadata, fake-codec round trips, mapInPandas operator outputs
recomputed locally with numpy, and the real-codec stub."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from chainhouse_spark.multimodal.assets import FRAME_BYTES, synth_assets
from chainhouse_spark.multimodal.codec import (
    decode_audio,
    decode_image,
    decode_video,
    decode_real,
)
from chainhouse_spark.multimodal.ops import (
    audio_features,
    frame_sample,
    image_features,
    image_resize,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def assets(spark):
    from chainhouse_spark.tables import load_table

    return synth_assets(load_table(spark, SF, "documents")).cache()


def test_payload_size_matches_meta(assets):
    bad = assets.selectExpr(
        "asset_id", "nbytes", "octet_length(payload) AS got"
    ).filter("nbytes != got")
    assert bad.count() == 0


def test_assets_deterministic(assets):
    row = assets.filter("asset_id = 3").collect()[0]
    # asset 3: 3 % 3 == 0 -> image, width 16+(3%8)*4=28, height 16+(3%5)*4=28
    assert row.modality == "image" and row.width == 28 and row.height == 28
    # payload = md5 keystream of 'asset-3'
    ks = b""
    while len(ks) < row.nbytes:
        ks += bytes.fromhex(hashlib.md5(b"asset-3").hexdigest())
    assert bytes(row.payload) == ks[: row.nbytes]


def test_image_features_match_numpy(assets):
    feats = {r.asset_id: r for r in image_features(assets).collect()}
    raw = {r.asset_id: r for r in assets.filter("modality='image'").collect()}
    assert set(feats) == set(raw) and len(feats) > 0
    for aid, r in list(feats.items())[:5]:
        a = decode_image(bytes(raw[aid].payload), raw[aid].height, raw[aid].width).astype(float)
        assert r.brightness == pytest.approx(a.mean())
        assert r.mean_r == pytest.approx(a[:, :, 0].mean())
        assert r.std_all == pytest.approx(a.std())


def test_audio_features_match_numpy(assets):
    feats = {r.asset_id: r for r in audio_features(assets).collect()}
    raw = {r.asset_id: r for r in assets.filter("modality='audio'").collect()}
    assert set(feats) == set(raw) and len(feats) > 0
    for aid, r in list(feats.items())[:5]:
        s = decode_audio(bytes(raw[aid].payload)).astype(float)
        assert r.rms == pytest.approx(np.sqrt((s**2).mean()))
        assert r.peak == int(np.abs(s).max())
        assert r.duration_s == pytest.approx(len(s) / 8000)


def test_resize_shapes_and_determinism(assets):
    out = image_resize(assets, 8, 8).collect()
    raw = {r.asset_id: r for r in assets.filter("modality='image'").collect()}
    assert {r.asset_id for r in out} == set(raw)
    for r in out:
        assert (r.width, r.height, r.channels) == (8, 8, 3)
        assert len(bytes(r.payload)) == 8 * 8 * 3
    # recompute one block-average locally
    r0 = min(out, key=lambda r: r.asset_id)
    src = raw[r0.asset_id]
    a = decode_image(bytes(src.payload), src.height, src.width).astype(float)
    bh, bw = src.height // 8, src.width // 8
    exp = np.floor(
        a[: bh * 8, : bw * 8, :].reshape(8, bh, 8, bw, 3).mean(axis=(1, 3)) + 0.5
    ).astype(np.uint8)
    assert bytes(r0.payload) == exp.tobytes()


def test_frame_sample_counts_and_hashes(assets):
    got = frame_sample(assets, every_n=2).collect()
    vids = {r.asset_id: r for r in assets.filter("modality='video'").collect()}
    by_asset = {}
    for r in got:
        by_asset.setdefault(r.asset_id, []).append(r)
    assert set(by_asset) == set(vids)
    for aid, rows in by_asset.items():
        v = vids[aid]
        assert len(rows) == (v.n_frames + 1) // 2
        frames = decode_video(bytes(v.payload), v.n_frames, v.height, v.width)
        for r in rows:
            assert r.frame_bytes == FRAME_BYTES
            exp = hashlib.md5(frames[r.frame_idx].tobytes().hex().encode()).hexdigest()
            assert r.frame_md5 == exp


def test_real_decode_gates():
    # Formats with no stdlib codec still gate with a clear marker…
    with pytest.raises(NotImplementedError):
        decode_real(b"\x00", "image/jpeg")
    with pytest.raises(NotImplementedError):
        decode_real(b"\x00", "video/mp4")
    # …while garbage claiming a natively-decoded format fails loudly.
    with pytest.raises(ValueError, match="signature"):
        decode_real(b"\x00", "image/png")
    # RIFF-container non-WAV payloads (webp: 'RIFF....WEBP') must reach the
    # optional-library gate, not die inside the WAV decoder (ADVICE r04).
    webp = b"RIFF\x10\x00\x00\x00WEBPVP8 "
    with pytest.raises(NotImplementedError):
        decode_real(webp, "image/webp")
    with pytest.raises(NotImplementedError):
        decode_real(b"RIFF\x10\x00\x00\x00AVI LIST", "video/x-msvideo")


def _rng_img(h, w, c, seed=0):
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, size=(h, w, c), dtype=np.uint8)
    return a[:, :, 0] if c == 1 else a


def test_png_roundtrip_all_filters():
    from chainhouse_spark.multimodal.png import decode_png, encode_png

    for c in (1, 2, 3, 4):
        img = _rng_img(13, 7, c, seed=c)
        for strategy in ("none", "cycle"):  # cycle hits filters 0..4
            assert np.array_equal(
                decode_png(encode_png(img, filter_strategy=strategy)), img
            )
    # degenerate sizes
    one = _rng_img(1, 1, 3, seed=9)
    assert np.array_equal(decode_png(encode_png(one, "cycle")), one)


def test_png_unsupported_raises():
    from chainhouse_spark.multimodal.png import decode_png, encode_png
    import struct
    import zlib

    # 16-bit depth IHDR
    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0)
    crc = struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    png16 = (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + crc
    )
    with pytest.raises(NotImplementedError, match="bit depth"):
        decode_png(png16)
    with pytest.raises(ValueError):
        encode_png(np.zeros((2, 2, 5), np.uint8))


def test_wav_roundtrip_and_real_dispatch():
    from chainhouse_spark.multimodal.codec import decode_wav, encode_wav

    mono = (np.arange(-500, 500, dtype=np.int16) * 31).astype(np.int16)
    assert np.array_equal(decode_wav(encode_wav(mono)), mono)
    stereo = np.stack([mono, -mono], axis=1)
    assert np.array_equal(decode_wav(encode_wav(stereo)), stereo)
    # decode_real dispatches by mime AND by magic bytes
    assert np.array_equal(decode_real(encode_wav(mono), "audio/wav"), mono)
    from chainhouse_spark.multimodal.png import encode_png

    img = _rng_img(5, 4, 3, seed=3)
    assert np.array_equal(decode_real(encode_png(img), "image/png"), img)
    assert np.array_equal(decode_real(encode_png(img), "image/unknown"), img)


def test_normalize_assets_bridges_encoded_to_raw(spark):
    """PNG/WAV payloads normalize to the raw at-rest format and then flow
    through the standard feature operators; fake payloads pass through."""
    from chainhouse_spark.multimodal.codec import encode_wav
    from chainhouse_spark.multimodal.ops import normalize_assets
    from chainhouse_spark.multimodal.png import encode_png

    img_a = _rng_img(6, 5, 3, seed=11)
    img_gray = _rng_img(4, 4, 1, seed=12)
    img_rgba = _rng_img(3, 3, 4, seed=13)
    pcm = (np.arange(400, dtype=np.int16) * 7 - 1000).astype(np.int16)
    stereo = np.stack([pcm, pcm + 4], axis=1).astype(np.int16)
    raw = b"\x01\x02\x03" * 8  # 2x4 RGB fake passthrough (metadata kept)
    rows = [
        (1, "image", "image/png", bytearray(encode_png(img_a, "cycle")), 0, 0, 0, 0),
        (2, "image", "image/png", bytearray(encode_png(img_gray)), 0, 0, 0, 0),
        (3, "image", "image/png", bytearray(encode_png(img_rgba)), 0, 0, 0, 0),
        (4, "audio", "audio/wav", bytearray(encode_wav(pcm)), 0, 0, 0, 0),
        (5, "audio", "audio/wav", bytearray(encode_wav(stereo)), 0, 0, 0, 0),
        (6, "image", "image/fake", bytearray(raw), 4, 2, 3, 0),
    ]
    df = spark.createDataFrame(
        rows,
        "asset_id long, modality string, mime string, payload binary, "
        "width int, height int, channels int, n_samples int",
    )
    out = {r.asset_id: r for r in normalize_assets(df).collect()}
    assert (out[1].width, out[1].height, out[1].channels) == (5, 6, 3)
    assert bytes(out[1].payload) == img_a.tobytes()
    # grayscale expanded to 3 channels; RGBA alpha dropped
    assert bytes(out[2].payload) == np.repeat(
        img_gray[:, :, None], 3, axis=2
    ).tobytes()
    assert bytes(out[3].payload) == img_rgba[:, :, :3].tobytes()
    assert out[4].n_samples == 400
    assert bytes(out[4].payload) == pcm.tobytes()
    # stereo downmixed by floor-average
    mixed = (stereo.astype(np.int32).sum(axis=1) // 2).astype(np.int16)
    assert bytes(out[5].payload) == mixed.tobytes()
    # passthrough keeps payload and upstream metadata
    assert bytes(out[6].payload) == raw
    assert (out[6].width, out[6].height) == (4, 2)

    # normalized output feeds the standard feature op unchanged
    feats = {
        r.asset_id: r
        for r in image_features(
            normalize_assets(df).filter("modality = 'image' AND width IS NOT NULL")
        ).collect()
    }
    px = img_a.reshape(-1, 3).astype(np.float64)
    assert feats[1].mean_r == pytest.approx(px[:, 0].mean())
    assert feats[1].brightness == pytest.approx(px.mean())


def test_image_ahash_matches_numpy(assets):
    from chainhouse_spark.multimodal.ops import image_ahash

    got = {r.asset_id: r for r in image_ahash(assets).collect()}
    raw = {r.asset_id: r for r in assets.filter("modality='image'").collect()}
    assert set(got) == set(raw) and len(got) > 0
    for aid, r in list(got.items())[:5]:
        a = decode_image(
            bytes(raw[aid].payload), raw[aid].height, raw[aid].width
        ).astype(np.int64)
        bh, bw = raw[aid].height // 8, raw[aid].width // 8
        gray = a[: bh * 8, : bw * 8, :].sum(axis=2)
        blocks = gray.reshape(8, bh, 8, bw).sum(axis=(1, 3)).reshape(-1)
        bits = (blocks * 64 > blocks.sum()).astype(np.int64)
        for i in range(4):
            exp = int((bits[i * 16 : (i + 1) * 16] << np.arange(16)).sum())
            assert getattr(r, f"band{i}") == exp
        assert r.nbits == int(bits.sum())
        # a constant image has no above-average block: all bands zero
    # bit order is pinned: band0 bit 0 is block (oy=0, ox=0)
