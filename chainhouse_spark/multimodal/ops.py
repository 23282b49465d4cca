"""mapInPandas operators over multimodal assets.

Decode is inherently per-row Python work, so these are the sanctioned slow
path: Arrow-batched mapInPandas (never row-at-a-time UDFs). Each operator

  - filters to its modality FIRST (filter + column pruning push into the
    parquet scan before any Python runs),
  - selects only the columns it needs (payload bytes cross to Python once),
  - declares an explicit output schema (stable driver-facing contract).

Scale behavior: work is embarrassingly parallel per asset — throughput scales
linearly with partitions, and spread() widens under-partitioned (small-file)
inputs to cluster parallelism before the Python stage (identity at real
scale, where scans already carry enough partitions). For 100 TB of payloads the
operator cost is dominated by Arrow transfer of the binary column, which is
unavoidable for Python codecs; real deployments would swap the fake codec for
a native one behind the same signature.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from chainhouse_spark.operators.partitioning import spread
from chainhouse_spark.multimodal.codec import (
    decode_audio,
    decode_image,
    decode_video,
    encode_image,
)

IMAGE_FEATURES_SCHEMA = (
    "asset_id long, width int, height int, mean_r double, mean_g double, "
    "mean_b double, std_all double, brightness double"
)


def image_features(assets: DataFrame) -> DataFrame:
    """Per-image channel means / std / brightness from the decoded array."""
    img = spread(assets.filter("modality = 'image'"), "asset_id").select(
        "asset_id", "width", "height", "payload"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("asset_id", "width", "height", "mean_r",
                                   "mean_g", "mean_b", "std_all", "brightness")}
            for aid, w, h, payload in zip(
                pdf["asset_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                a = decode_image(payload, int(h), int(w)).astype(np.float64)
                out["asset_id"].append(aid)
                out["width"].append(w)
                out["height"].append(h)
                out["mean_r"].append(a[:, :, 0].mean())
                out["mean_g"].append(a[:, :, 1].mean())
                out["mean_b"].append(a[:, :, 2].mean())
                out["std_all"].append(a.std())
                out["brightness"].append(a.mean())
            yield pd.DataFrame(out)

    return img.mapInPandas(gen, schema=IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = "asset_id long, width int, height int, channels int, payload binary"


def image_resize(assets: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Block-average resize of every image to (out_h, out_w): crop to the
    largest block multiple, then mean over blocks — deterministic, no
    interpolation library needed. Re-encodes to a payload binary with updated
    metadata, so the output is itself a valid asset table."""
    img = spread(assets.filter("modality = 'image'"), "asset_id").select(
        "asset_id", "width", "height", "payload"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, w, h, payload in zip(
                pdf["asset_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                a = decode_image(payload, int(h), int(w)).astype(np.float64)
                bh, bw = int(h) // out_h, int(w) // out_w
                if bh < 1 or bw < 1:
                    raise ValueError(f"asset {aid}: cannot upscale {h}x{w} to {out_h}x{out_w}")
                cropped = a[: bh * out_h, : bw * out_w, :]
                blocks = cropped.reshape(out_h, bh, out_w, bw, cropped.shape[2])
                small = blocks.mean(axis=(1, 3)).round().astype(np.uint8)
                rows.append((aid, out_w, out_h, small.shape[2], encode_image(small)))
            yield pd.DataFrame(
                rows, columns=["asset_id", "width", "height", "channels", "payload"]
            )

    return img.mapInPandas(gen, schema=RESIZE_SCHEMA)


AUDIO_FEATURES_SCHEMA = (
    "asset_id long, n_samples int, duration_s double, rms double, "
    "peak int, zero_crossings int"
)


def audio_features(assets: DataFrame) -> DataFrame:
    """Per-clip PCM16 stats: RMS, peak amplitude, zero crossings, duration."""
    aud = spread(assets.filter("modality = 'audio'"), "asset_id").select(
        "asset_id", "sample_rate", "n_samples", "payload"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, sr, n, payload in zip(
                pdf["asset_id"], pdf["sample_rate"], pdf["n_samples"], pdf["payload"]
            ):
                s = decode_audio(payload).astype(np.float64)
                rows.append(
                    (
                        aid,
                        int(n),
                        int(n) / int(sr),
                        float(np.sqrt((s**2).mean())),
                        int(np.abs(s).max()),
                        int(((s[:-1] * s[1:]) < 0).sum()),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "n_samples", "duration_s", "rms", "peak", "zero_crossings"],
            )

    return aud.mapInPandas(gen, schema=AUDIO_FEATURES_SCHEMA)


FRAME_SAMPLE_SCHEMA = (
    "asset_id long, frame_idx int, frame_bytes int, frame_md5 string"
)


def frame_sample(assets: DataFrame, every_n: int = 2) -> DataFrame:
    """Sample every Nth frame of each video; emit the frame's byte count and
    the md5 of its lowercase-hex rendering (hex domain so a SQL oracle can
    recompute it by slicing the payload hex string — see queries/multimodal).
    One input row fans out to ceil(n_frames / every_n) output rows, all
    produced inside the same partition (no shuffle)."""
    import hashlib

    vid = spread(assets.filter("modality = 'video'"), "asset_id").select(
        "asset_id", "n_frames", "height", "width", "channels", "payload"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, nf, h, w, c, payload in zip(
                pdf["asset_id"], pdf["n_frames"], pdf["height"], pdf["width"],
                pdf["channels"], pdf["payload"],
            ):
                frames = decode_video(payload, int(nf), int(h), int(w), int(c))
                for idx in range(0, int(nf), every_n):
                    raw = frames[idx].tobytes()
                    rows.append(
                        (aid, idx, len(raw), hashlib.md5(raw.hex().encode()).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "frame_bytes", "frame_md5"]
            )

    return vid.mapInPandas(gen, schema=FRAME_SAMPLE_SCHEMA)
