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


def test_real_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        decode_real(b"\x00", "image/png")
    with pytest.raises(NotImplementedError):
        decode_real(b"\x00", "video/mp4")
