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
    decode_real,
    decode_video,
    encode_image,
)

NORMALIZED_SCHEMA = (
    "asset_id long, modality string, width int, height int, channels int, "
    "n_samples int, payload binary"
)


def normalize_assets(assets: DataFrame) -> DataFrame:
    """Ingest bridge: decode ENCODED payloads (image/png via the pure-stdlib
    codec, audio/wav via the stdlib wave module, '*/fake' raw passthrough)
    into the raw at-rest format every downstream operator consumes — images
    as H*W*C uint8 RGB bytes with metadata taken from the decoded array,
    audio as little-endian PCM16 mono with n_samples recomputed.

    Same slow-path contract as the feature ops: Arrow-batched mapInPandas,
    modality/mime dispatch per row (decode is per-row Python work by
    nature), explicit output schema. Grayscale images are expanded to 3
    channels and RGBA alpha is dropped so the output always satisfies the
    payload == 3*width*height invariant `image_features` enforces."""
    from pyspark.sql import functions as F

    # Raw ('*/fake') rows pass through with their upstream metadata; an
    # encoded-only ingest table may lack those columns entirely, so default
    # the optional ones to NULL rather than requiring them.
    meta_cols = ["width", "height", "channels", "n_samples"]
    have = set(assets.columns)
    src = spread(assets, "asset_id").select(
        "asset_id", "modality", "mime", "payload",
        *[
            (F.col(c) if c in have else F.lit(None)).cast("int").alias(f"_{c}")
            for c in meta_cols
        ],
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, modality, mime, payload, mw, mh, mc, mn in zip(
                pdf["asset_id"], pdf["modality"], pdf["mime"], pdf["payload"],
                pdf["_width"], pdf["_height"], pdf["_channels"],
                pdf["_n_samples"],
            ):
                payload = bytes(payload)
                if mime.endswith("/fake"):
                    rows.append((aid, modality, mw, mh, mc, mn, payload))
                    continue
                arr = decode_real(payload, mime)
                if modality == "image":
                    if arr.ndim == 2:
                        arr = np.repeat(arr[:, :, None], 3, axis=2)
                    elif arr.shape[2] == 2:  # gray+alpha
                        arr = np.repeat(arr[:, :, :1], 3, axis=2)
                    elif arr.shape[2] == 4:  # RGBA
                        arr = arr[:, :, :3]
                    h, w, c = arr.shape
                    rows.append((aid, modality, w, h, c, None, encode_image(arr)))
                elif modality == "audio":
                    samples = np.asarray(arr)
                    if samples.ndim == 2:  # downmix: average channels
                        samples = (
                            samples.astype(np.int32).sum(axis=1)
                            // samples.shape[1]
                        ).astype(np.int16)
                    rows.append(
                        (aid, modality, None, None, None, int(samples.size),
                         samples.astype("<i2").tobytes())
                    )
                else:
                    raise NotImplementedError(
                        f"normalize_assets: no encoded-payload path for "
                        f"modality {modality!r} (mime {mime!r})"
                    )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "modality", "width", "height",
                         "channels", "n_samples", "payload"],
            )

    return src.mapInPandas(gen, schema=NORMALIZED_SCHEMA)

IMAGE_FEATURES_SCHEMA = (
    "asset_id long, width int, height int, mean_r double, mean_g double, "
    "mean_b double, std_all double, brightness double"
)


def image_features(assets: DataFrame) -> DataFrame:
    """Per-image channel means / std / brightness from the decoded array.

    Whole-batch vectorized: every payload in the Arrow batch is concatenated
    into ONE uint8 buffer viewed as (n_pixels_total, 3); per-image integer
    sums (channel sums, total, sum-of-squares) come from a single
    `np.add.reduceat` over pixel-boundary offsets — no per-image Python
    loop, so batch cost is BLAS-ish memory bandwidth. The float finish is
    integer-exact arithmetic followed by one correctly-rounded IEEE
    division/multiply/sqrt chain, which a SQL engine reproduces
    bit-for-bit — that is what makes this decode op fully DuckDB-oracle-able
    (queries/multimodal.py) instead of rows-only:

        mean_c     = s_c / n_pix
        brightness = s_all / N            (N = 3 * n_pix)
        std_all    = sqrt(s2_all/N - (s_all/N) * (s_all/N))

    (all sums are exact in float64: s2_all <= 6144 * 255^2 < 2^53).
    """
    img = spread(assets.filter("modality = 'image'"), "asset_id").select(
        "asset_id", "width", "height", "payload"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = [bytes(p) for p in pdf["payload"]]
            sizes = np.fromiter((len(p) for p in payloads), dtype=np.int64)
            expected = (
                3
                * pdf["width"].to_numpy(dtype=np.int64)
                * pdf["height"].to_numpy(dtype=np.int64)
            )
            if not np.array_equal(sizes, expected):
                bad = pdf["asset_id"].to_numpy()[sizes != expected]
                raise ValueError(
                    f"payload size != 3*width*height for asset_ids {bad.tolist()[:5]}"
                    " — a mismatched payload would shift every subsequent"
                    " image's reduceat offsets"
                )
            buf = np.frombuffer(b"".join(payloads), dtype=np.uint8)
            px = buf.reshape(-1, 3).astype(np.int64)
            # pixel-row offset where each image starts
            offsets = np.concatenate(([0], np.cumsum(sizes // 3)[:-1]))
            s_rgb = np.add.reduceat(px, offsets, axis=0)  # (n_img, 3)
            s2_all = np.add.reduceat(px * px, offsets, axis=0).sum(axis=1)
            s_all = s_rgb.sum(axis=1)
            n_pix = (sizes // 3).astype(np.float64)
            n_all = n_pix * 3.0
            mean_all = s_all / n_all
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "width": pdf["width"].to_numpy(),
                    "height": pdf["height"].to_numpy(),
                    "mean_r": s_rgb[:, 0] / n_pix,
                    "mean_g": s_rgb[:, 1] / n_pix,
                    "mean_b": s_rgb[:, 2] / n_pix,
                    "std_all": np.sqrt(s2_all / n_all - mean_all * mean_all),
                    "brightness": mean_all,
                }
            )

    return img.mapInPandas(gen, schema=IMAGE_FEATURES_SCHEMA)


RESIZE_SCHEMA = "asset_id long, width int, height int, channels int, payload binary"


def image_resize(assets: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Block-average resize of every image to (out_h, out_w): crop to the
    largest block multiple, then mean over blocks — deterministic, no
    interpolation library needed. Re-encodes to a payload binary with updated
    metadata, so the output is itself a valid asset table.

    Rounding is half-UP (floor(mean + 0.5)), not numpy's default
    half-to-even: block means are integer sums divided by the exact block
    size, so floor(x + 0.5) is reproducible by any SQL engine with the
    identical correctly-rounded IEEE ops — that makes the resized payload
    byte-for-byte oracle-able (queries/multimodal.py hashes it in the hex
    domain against a DuckDB reconstruction)."""
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
                small = np.floor(blocks.mean(axis=(1, 3)) + 0.5).astype(np.uint8)
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
    """Per-clip PCM16 stats: RMS, peak amplitude, zero crossings, duration.

    Whole-batch vectorized like `image_features`: all clips concatenate
    into one little-endian int16 buffer; per-clip sum-of-squares /
    peak / zero-crossing counts come from `np.*.reduceat` over clip
    offsets (sign-change products at clip boundaries are masked out).
    Integer sums are exact (sum(v^2) <= 1500 * 2^30 < 2^53), and the only
    float ops — rms = sqrt(s2/n), duration = n/sr — are single
    correctly-rounded IEEE operations, so a SQL engine reproduces every
    output bit-for-bit (full DuckDB oracle in queries/multimodal.py)."""
    aud = spread(assets.filter("modality = 'audio'"), "asset_id").select(
        "asset_id", "sample_rate", "n_samples", "payload"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            payloads = [bytes(p) for p in pdf["payload"]]
            n = np.fromiter((len(p) // 2 for p in payloads), dtype=np.int64)
            s = np.frombuffer(b"".join(payloads), dtype="<i2").astype(np.int64)
            offsets = np.concatenate(([0], np.cumsum(n)[:-1]))
            s2 = np.add.reduceat(s * s, offsets)
            peak = np.maximum.reduceat(np.abs(s), offsets)
            # adjacent-sample sign changes; products straddling clip
            # boundaries are zeroed so they never count
            prod = s[:-1] * s[1:]
            crossing = (prod < 0).astype(np.int64)
            crossing[offsets[1:] - 1] = 0
            # clip lengths are >= 2 everywhere, so every offset < crossing.size
            zc = np.add.reduceat(crossing, offsets)
            sr = pdf["sample_rate"].to_numpy(dtype=np.float64)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"].to_numpy(),
                    "n_samples": n.astype(np.int32),
                    "duration_s": n.astype(np.float64) / sr,
                    "rms": np.sqrt(s2 / n.astype(np.float64)),
                    "peak": peak.astype(np.int32),
                    "zero_crossings": zc.astype(np.int32),
                }
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


AHASH_SCHEMA = (
    "asset_id long, band0 int, band1 int, band2 int, band3 int, nbits int"
)


def image_ahash(assets: DataFrame) -> DataFrame:
    """Perceptual average-hash per image, emitted as four 16-bit bands
    (the simhash-banding trick: near-duplicate images agree on at least
    one band with high probability, so band equality is the LSH bucket
    key for a dedup join — no all-pairs comparison).

    Bit k (block row-major, k = oy*8 + ox) is set when block k's summed
    intensity exceeds the image mean. ENTIRELY integer arithmetic
    (S_block * 64 > S_total over the 8x8-cropped region): no float
    rounding exists to diverge between engines, so the hash is exactly
    SQL-reproducible from the payload hex."""
    img = spread(assets.filter("modality = 'image'"), "asset_id").select(
        "asset_id", "width", "height", "payload"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        weights = 1 << np.arange(16, dtype=np.int64)
        for pdf in batches:
            rows = []
            for aid, w, h, payload in zip(
                pdf["asset_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                a = decode_image(payload, int(h), int(w)).astype(np.int64)
                bh, bw = int(h) // 8, int(w) // 8
                if bh < 1 or bw < 1:
                    raise ValueError(f"asset {aid}: {h}x{w} smaller than 8x8")
                gray = a[: bh * 8, : bw * 8, :].sum(axis=2)
                blocks = gray.reshape(8, bh, 8, bw).sum(axis=(1, 3))
                tot = int(blocks.sum())
                bits = (blocks.reshape(-1) * 64 > tot).astype(np.int64)
                bands = [
                    int((bits[i * 16 : (i + 1) * 16] * weights).sum())
                    for i in range(4)
                ]
                rows.append((aid, *bands, int(bits.sum())))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "band0", "band1", "band2", "band3", "nbits"],
            )

    return img.mapInPandas(gen, schema=AHASH_SCHEMA)


# Fixed-point DCT-II basis for the perceptual hash: B[u][x] =
# round(cos(pi*(2x+1)*u/32) * 4096) for u in 0..7 (kept frequencies), x in
# 0..15 (pooled grid). Computed ONCE here and shared verbatim by the Spark
# op below and the DuckDB oracle's literal VALUES table
# (queries/multimodal.py), so the transform is pure integer arithmetic —
# no libm cosine runs in either engine at query time and the hash is
# bit-for-bit reproducible.
import math as _math

PHASH_N = 16  # pooled grid side
PHASH_K = 8  # kept low-frequency coefficients per axis
PHASH_SCALE = 4096
PHASH_BASIS = [
    [
        int(round(_math.cos(_math.pi * (2 * x + 1) * u / (2 * PHASH_N)) * PHASH_SCALE))
        for x in range(PHASH_N)
    ]
    for u in range(PHASH_K)
]

PHASH_SCHEMA = (
    "asset_id long, band0 int, band1 int, band2 int, band3 int, nbits int"
)


def image_phash(assets: DataFrame) -> DataFrame:
    """Perceptual DCT hash per image (pHash family), emitted as four 16-bit
    LSH bands like `image_ahash`. Pipeline per image: channel-sum to gray,
    block-pool to a 16x16 integer grid (crop to the largest block multiple,
    block SUMS not means — the DCT is linear so a constant block-size factor
    scales every coefficient equally within an image and cancels in the
    median threshold), then a separable fixed-point DCT-II
    C = B @ P @ B^T keeping the 8x8 low-frequency block. Bit k (row-major
    over the 8x8) is set when C_k exceeds the exact median of the 63 AC
    coefficients (the 32nd smallest, rank-based — integer compare, no float
    anywhere: |C| <= 16*4096 * 16*4096*3060 ~ 1.3e13 < 2^53).

    aHash thresholds on local mean intensity; the DCT hash thresholds on
    low-frequency STRUCTURE, so it survives brightness shifts that flip
    aHash bits. Same banding contract: near-duplicates meet on band
    equality (equi-join), never all-pairs."""
    img = spread(assets.filter("modality = 'image'"), "asset_id").select(
        "asset_id", "width", "height", "payload"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        basis = np.asarray(PHASH_BASIS, dtype=np.int64)  # (8, 16)
        weights = 1 << np.arange(16, dtype=np.int64)
        n = PHASH_N
        for pdf in batches:
            rows = []
            for aid, w, h, payload in zip(
                pdf["asset_id"], pdf["width"], pdf["height"], pdf["payload"]
            ):
                a = decode_image(payload, int(h), int(w)).astype(np.int64)
                bh, bw = int(h) // n, int(w) // n
                if bh < 1 or bw < 1:
                    raise ValueError(f"asset {aid}: {h}x{w} smaller than {n}x{n}")
                gray = a[: bh * n, : bw * n, :].sum(axis=2)
                pooled = gray.reshape(n, bh, n, bw).sum(axis=(1, 3))
                coeff = basis @ pooled @ basis.T  # (8, 8) int64, exact
                flat = coeff.reshape(-1)
                med = int(np.partition(flat[1:], 31)[31])  # 32nd-smallest AC
                bits = (flat > med).astype(np.int64)
                bands = [
                    int((bits[i * 16 : (i + 1) * 16] * weights).sum())
                    for i in range(4)
                ]
                rows.append((aid, *bands, int(bits.sum())))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "band0", "band1", "band2", "band3", "nbits"],
            )

    return img.mapInPandas(gen, schema=PHASH_SCHEMA)


SCENE_CUTS_SCHEMA = (
    "asset_id long, n_frames int, n_cuts int, total_diff long, "
    "max_diff long, max_diff_frame int"
)


def video_scene_cuts(assets: DataFrame) -> DataFrame:
    """Scene-change detection per video: the L1 distance between consecutive
    frames (sum of absolute per-byte differences — pure integer), a cut
    wherever a frame's diff STRICTLY exceeds the video's mean diff,
    compared as the integer cross-product d_i * n_pairs > total (no float
    division anywhere, so the oracle replays it exactly from payload hex).
    Emits per-video cut count, total/max diff energy, and the first frame
    index attaining the max — the summary a frame-sampling pipeline uses to
    pick representative frames per scene instead of blind every-Nth."""
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
                frames = decode_video(
                    payload, int(nf), int(h), int(w), int(c)
                ).astype(np.int64)
                d = np.abs(frames[1:] - frames[:-1]).sum(axis=(1, 2, 3))
                n_pairs = int(nf) - 1
                total = int(d.sum())
                cuts = int((d * n_pairs > total).sum())
                mx = int(d.max())
                # first frame index attaining the max (diff i is between
                # frames i and i+1; report the later frame, where the new
                # scene starts)
                mx_frame = int(np.argmax(d)) + 1
                rows.append((aid, int(nf), cuts, total, mx, mx_frame))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "n_frames", "n_cuts", "total_diff",
                         "max_diff", "max_diff_frame"],
            )

    return vid.mapInPandas(gen, schema=SCENE_CUTS_SCHEMA)


AUDIO_QUALITY_SCHEMA = (
    "asset_id long, n_samples int, n_clipped int, clipped_frac double, "
    "n_silence_runs int, longest_silence_run int, silence_frac double"
)

# Integer thresholds shared with the oracle: a sample is CLIPPED at
# |v| >= 30000 (near full-scale PCM16), SILENT at |v| < 8000; a silence
# RUN is >= 3 consecutive silent samples.
AUDIO_CLIP_T = 30000
AUDIO_SILENCE_T = 8000
AUDIO_RUN_LEN = 3


def audio_quality(assets: DataFrame) -> DataFrame:
    """Per-clip audio QA: clipping rate (samples at |v| >= 30000) and
    silence-run structure (runs of >= 3 consecutive samples under |v| <
    8000 — count, longest, total fraction). The gate an audio-corpus
    pipeline applies before paying for transcription: clipped or
    mostly-silent clips are dropped. All integer compares and run lengths
    (gaps-and-islands over sample positions), so the oracle replays every
    number from the PCM16 payload hex; the two fractions are single
    divisions of exact ints."""
    aud = spread(assets.filter("modality = 'audio'"), "asset_id").select(
        "asset_id", "n_samples", "payload"
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, payload in zip(pdf["asset_id"], pdf["payload"]):
                s = np.frombuffer(bytes(payload), dtype="<i2").astype(np.int64)
                n = s.size
                clipped = int((np.abs(s) >= AUDIO_CLIP_T).sum())
                silent = np.abs(s) < AUDIO_SILENCE_T
                # run-length encode the silent mask
                changes = np.flatnonzero(np.diff(silent.astype(np.int8)))
                bounds = np.concatenate(([0], changes + 1, [n]))
                lens = np.diff(bounds)
                vals = silent[bounds[:-1]]
                run_lens = lens[vals & (lens >= AUDIO_RUN_LEN)]
                rows.append(
                    (
                        aid,
                        n,
                        clipped,
                        clipped / n,
                        int(run_lens.size),
                        int(run_lens.max()) if run_lens.size else 0,
                        int(run_lens.sum()) / n,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "n_samples", "n_clipped", "clipped_frac",
                         "n_silence_runs", "longest_silence_run",
                         "silence_frac"],
            )

    return aud.mapInPandas(gen, schema=AUDIO_QUALITY_SCHEMA)
