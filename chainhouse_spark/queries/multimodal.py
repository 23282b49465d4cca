"""Multimodal queries: binary-payload plumbing over the documents table.

The asset construction is a shared Spark/DuckDB SQL fragment
(multimodal/assets.py), so even the BINARY column contents are
oracle-checkable: metadata stats compare octet_length aggregates, and
frame sampling compares per-frame md5s computed from raw bytes (Spark,
mapInPandas) vs hex-string slices (DuckDB).

The numpy decode ops (image/audio features, resize) are fully oracled too:
their float outputs are defined as integer-exact sums finished by a fixed
chain of correctly-rounded IEEE-754 ops (see multimodal/ops.py), so DuckDB
reproduces them bit-for-bit by re-expanding the payload hex string into
byte values (`_HEXVAL`) and running the identical arithmetic. This is
slow-by-construction oracle SQL (one row per byte) — affordable only at
oracle scale, which is the point.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.multimodal.assets import (
    FRAME_BYTES,
    assets_oracle_sql,
    synth_assets,
)
from chainhouse_spark.multimodal.ops import (
    audio_features,
    frame_sample,
    image_ahash,
    image_features,
    image_resize,
)
from chainhouse_spark.functions.rounding import round9
from chainhouse_spark.queries.registry import exempt_round9, register
from chainhouse_spark.tables import load_table


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synth_assets(load_table(spark, sf_dir, "documents"))


def _hexval(char_expr: str) -> str:
    """DuckDB SQL: one lowercase hex char -> 0..15."""
    return f"(strpos('0123456789abcdef', {char_expr}) - 1)"


def _byte_at(pos_expr: str) -> str:
    """DuckDB SQL: byte value at 0-based byte offset `pos_expr` of
    payload_hex."""
    return (
        f"({_hexval(f'substr(payload_hex, CAST({pos_expr} AS INT) * 2 + 1, 1)')} * 16"
        f" + {_hexval(f'substr(payload_hex, CAST({pos_expr} AS INT) * 2 + 2, 1)')})"
    )


# Every image byte as (asset_id, width, height, bh, bw, pos, v) — the shared
# head of the image-features and resize oracles. bh/bw are the 8x8 resize
# block dims (unused by the features oracle).
def _image_bytes_cte() -> str:
    return f"""
    assets AS ({assets_oracle_sql(with_hex=True)}),
    img AS (
        SELECT asset_id, width, height, nbytes, payload_hex
        FROM assets WHERE modality = 'image'
    ),
    b AS (
        SELECT asset_id, width, height,
               (height // 8) AS bh, (width // 8) AS bw,
               CAST(p AS BIGINT) AS pos,
               {_byte_at("p")} AS v
        FROM img, UNNEST(range(0, nbytes)) AS t(p)
    )
    """


@register(
    "mm_metadata_stats",
    oracle=f"""
    WITH assets AS ({assets_oracle_sql()})
    SELECT modality,
           count(*) AS n_assets,
           CAST(sum(octet_length(payload)) AS BIGINT) AS total_bytes,
           min(octet_length(payload)) AS min_bytes,
           max(octet_length(payload)) AS max_bytes,
           CAST(sum(octet_length(payload)) AS DOUBLE) / count(*) AS avg_bytes
    FROM assets
    GROUP BY modality
    """,
)
def mm_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage profile per modality — the planning query a 100 TB multimodal
    lake runs constantly. Payload bytes never leave the JVM; one shuffle on
    the 3-value modality key."""
    sz = F.expr("octet_length(payload)")
    return (
        _assets(spark, sf_dir)
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_assets"),
            F.sum(sz).alias("total_bytes"),
            F.min(sz).alias("min_bytes"),
            F.max(sz).alias("max_bytes"),
            (F.sum(sz).cast("double") / F.count(F.lit(1))).alias("avg_bytes"),
        )
    )


@register(
    "mm_frame_sample",
    oracle=f"""
    WITH assets AS ({assets_oracle_sql(with_hex=True)})
    SELECT asset_id,
           CAST(f AS INT) AS frame_idx,
           {FRAME_BYTES} AS frame_bytes,
           md5(substr(payload_hex, CAST(f AS INT) * {FRAME_BYTES * 2} + 1, {FRAME_BYTES * 2})) AS frame_md5
    FROM assets, UNNEST(range(0, n_frames, 2)) AS t(f)
    WHERE modality = 'video'
    """,
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every-2nd-frame sample of each fake video; per-frame md5 proves the
    decoded byte ranges match the oracle's hex-string slices exactly."""
    return frame_sample(_assets(spark, sf_dir), every_n=2)


@register(
    "mm_image_features",
    oracle=f"""
    WITH {_image_bytes_cte()},
    s AS (
        SELECT asset_id, width, height,
               SUM(CASE WHEN pos % 3 = 0 THEN v ELSE 0 END) AS s_r,
               SUM(CASE WHEN pos % 3 = 1 THEN v ELSE 0 END) AS s_g,
               SUM(CASE WHEN pos % 3 = 2 THEN v ELSE 0 END) AS s_b,
               SUM(v) AS s_all,
               SUM(v * v) AS s2_all
        FROM b GROUP BY asset_id, width, height
    )
    SELECT asset_id,
           CAST(width AS INT) AS width,
           CAST(height AS INT) AS height,
           CAST(s_r AS DOUBLE) / CAST(width * height AS DOUBLE) AS mean_r,
           CAST(s_g AS DOUBLE) / CAST(width * height AS DOUBLE) AS mean_g,
           CAST(s_b AS DOUBLE) / CAST(width * height AS DOUBLE) AS mean_b,
           (ROUND((sqrt(CAST(s2_all AS DOUBLE) / CAST(width * height * 3 AS DOUBLE)
                - (CAST(s_all AS DOUBLE) / CAST(width * height * 3 AS DOUBLE))
                  * (CAST(s_all AS DOUBLE) / CAST(width * height * 3 AS DOUBLE)))
             ) * 1e9) / 1e9 + 0.0) AS std_all,
           CAST(s_all AS DOUBLE) / CAST(width * height * 3 AS DOUBLE) AS brightness
    FROM s
    """,
)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode → channel means/std/brightness. Batch-vectorized numpy
    with an integer-exact float finish, so the oracle reproduces every
    double bit-for-bit from the payload hex (see multimodal/ops.py)."""
    return image_features(_assets(spark, sf_dir)).withColumn(
        "std_all", round9("std_all")
    )


@register(
    "mm_audio_features",
    oracle=f"""
    WITH assets AS ({assets_oracle_sql(with_hex=True)}),
    aud AS (
        SELECT asset_id, sample_rate, n_samples, payload_hex
        FROM assets WHERE modality = 'audio'
    ),
    sm AS (
        SELECT asset_id, sample_rate, n_samples, CAST(i AS BIGINT) AS idx,
               {_byte_at("i * 2")} + {_byte_at("i * 2 + 1")} * 256 AS u
        FROM aud, UNNEST(range(0, n_samples)) AS t(i)
    ),
    sv AS (
        SELECT asset_id, sample_rate, n_samples, idx,
               CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS v
        FROM sm
    ),
    sl AS (
        SELECT asset_id, sample_rate, n_samples, v,
               LAG(v) OVER (PARTITION BY asset_id ORDER BY idx) AS pv
        FROM sv
    )
    SELECT asset_id,
           CAST(n_samples AS INT) AS n_samples,
           CAST(n_samples AS DOUBLE) / CAST(sample_rate AS DOUBLE) AS duration_s,
           sqrt(CAST(SUM(v * v) AS DOUBLE) / CAST(n_samples AS DOUBLE)) AS rms,
           CAST(MAX(ABS(v)) AS INT) AS peak,
           CAST(COUNT(*) FILTER (WHERE pv IS NOT NULL AND pv * v < 0) AS INT)
             AS zero_crossings
    FROM sl
    GROUP BY asset_id, n_samples, sample_rate
    """,
)
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM16 decode → rms/peak/zero-crossings. Batch-vectorized numpy; the
    oracle re-decodes little-endian int16 from the payload hex and runs
    the identical integer-exact arithmetic (see multimodal/ops.py)."""
    return audio_features(_assets(spark, sf_dir))


@register(
    "mm_image_resize",
    oracle=f"""
    WITH {_image_bytes_cte()},
    px AS (
        SELECT asset_id, bh, bw,
               (pos // 3) // width AS y,
               (pos // 3) % width AS x,
               pos % 3 AS c,
               v
        FROM b
    ),
    blk AS (
        SELECT asset_id, (y // bh) AS oy, (x // bw) AS ox, c,
               CAST(floor(CAST(SUM(v) AS DOUBLE) / CAST(bh * bw AS DOUBLE) + 0.5)
                    AS INT) AS ov
        FROM px
        WHERE y < bh * 8 AND x < bw * 8
        GROUP BY asset_id, bh, bw, oy, ox, c
    ),
    enc AS (
        SELECT asset_id,
               string_agg(printf('%02x', ov), '' ORDER BY oy, ox, c) AS hexpayload
        FROM blk GROUP BY asset_id
    )
    SELECT asset_id,
           CAST(8 AS INT) AS width,
           CAST(8 AS INT) AS height,
           CAST(3 AS INT) AS channels,
           CAST(192 AS INT) AS payload_bytes,
           md5(hexpayload) AS payload_md5
    FROM enc
    """,
)
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-average resize to 8×8; returns the re-encoded asset rows with a
    checksum column. Half-up rounding makes the resized bytes
    SQL-reproducible, so the md5 is computed in the hex domain on both
    sides (the mm_frame_sample pattern) and the oracle rebuilds the payload
    from per-block byte sums."""
    out = image_resize(_assets(spark, sf_dir), out_h=8, out_w=8)
    return out.select(
        "asset_id",
        "width",
        "height",
        "channels",
        F.expr("octet_length(payload)").alias("payload_bytes"),
        F.md5(F.lower(F.hex("payload"))).alias("payload_md5"),
    )


@register(
    "mm_image_ahash_dedup",
    oracle=f"""
    WITH {_image_bytes_cte()},
    px AS (
        SELECT asset_id, bh, bw,
               (pos // 3) // width AS y,
               (pos // 3) % width AS x,
               v
        FROM b
    ),
    blk AS (
        SELECT asset_id, ((y // bh) * 8 + (x // bw)) AS k, SUM(v) AS s
        FROM px WHERE y < bh * 8 AND x < bw * 8
        GROUP BY asset_id, k
    ),
    tot AS (SELECT asset_id, SUM(s) AS t FROM blk GROUP BY asset_id),
    bits AS (
        SELECT blk.asset_id, k,
               CASE WHEN s * 64 > t THEN 1 ELSE 0 END AS bit
        FROM blk JOIN tot ON blk.asset_id = tot.asset_id
    ),
    bands AS (
        SELECT asset_id, k // 16 AS bi,
               CAST(SUM(bit * (1 << (k % 16))) AS INT) AS bv
        FROM bits GROUP BY asset_id, bi
    ),
    cnt AS (SELECT bi, bv, COUNT(*) AS c FROM bands GROUP BY bi, bv),
    coll AS (
        SELECT bands.asset_id, CAST(SUM(cnt.c - 1) AS BIGINT) AS n_band_collisions
        FROM bands JOIN cnt ON bands.bi = cnt.bi AND bands.bv = cnt.bv
        GROUP BY bands.asset_id
    ),
    wide AS (
        SELECT asset_id,
               CAST(MAX(CASE WHEN bi = 0 THEN bv END) AS INT) AS band0,
               CAST(MAX(CASE WHEN bi = 1 THEN bv END) AS INT) AS band1,
               CAST(MAX(CASE WHEN bi = 2 THEN bv END) AS INT) AS band2,
               CAST(MAX(CASE WHEN bi = 3 THEN bv END) AS INT) AS band3
        FROM bands GROUP BY asset_id
    ),
    nb AS (
        SELECT asset_id, CAST(SUM(bit) AS INT) AS nbits FROM bits
        GROUP BY asset_id
    )
    SELECT wide.asset_id, band0, band1, band2, band3, nb.nbits,
           coll.n_band_collisions
    FROM wide
    JOIN nb ON wide.asset_id = nb.asset_id
    JOIN coll ON wide.asset_id = coll.asset_id
    """,
)
def mm_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection by perceptual average-hash: 64
    integer-exact bits per image banded into four 16-bit LSH keys
    (multimodal/ops.py::image_ahash), plus each image's band-collision
    count — the candidate-pair fan-in a dedup join would process. The
    banding is the dedup_simhash recipe applied to pixels instead of
    tokens: candidates meet on band equality (equi-join), never all-pairs.
    The oracle rebuilds every hash from the payload hex bytes, so the
    decode -> block-sum -> threshold -> band pipeline is checked
    bit-for-bit."""
    from pyspark.sql import Window

    ah = image_ahash(_assets(spark, sf_dir))
    # Single lineage: melt carries the band columns through, collision
    # counts come from a window over (band index, band value), and the
    # final group folds back to one row per asset. A groupBy+join shape
    # here would branch the DataFrame and re-run the Python decode stage
    # once per branch (observed: 3 scans, 3 mapInPandas in the plan).
    melted = ah.select(
        "asset_id",
        "band0",
        "band1",
        "band2",
        "band3",
        "nbits",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"), F.col(f"band{i}").alias("bv")
                    )
                    for i in range(4)
                ]
            )
        ).alias("m"),
    ).select("asset_id", "band0", "band1", "band2", "band3", "nbits", "m.bi", "m.bv")
    c = F.count(F.lit(1)).over(Window.partitionBy("bi", "bv"))
    return (
        melted.withColumn("c", c)
        .groupBy("asset_id")
        .agg(
            F.min("band0").alias("band0"),
            F.min("band1").alias("band1"),
            F.min("band2").alias("band2"),
            F.min("band3").alias("band3"),
            F.min("nbits").alias("nbits"),
            F.sum(F.col("c") - 1).cast("bigint").alias("n_band_collisions"),
        )
    )


def _phash_basis_values() -> str:
    """The fixed-point DCT basis as a DuckDB VALUES literal (u, x, w) —
    the same integers multimodal/ops.py::PHASH_BASIS computed once at
    import, so neither engine evaluates a cosine at query time."""
    from chainhouse_spark.multimodal.ops import PHASH_BASIS

    rows = ", ".join(
        f"({u}, {x}, {w})"
        for u, row in enumerate(PHASH_BASIS)
        for x, w in enumerate(row)
    )
    return f"(VALUES {rows}) AS basis(u, x, w)"


@register(
    "mm_image_phash_dedup",
    oracle=f"""
    WITH assets AS ({{assets_sql}}),
    img AS (
        SELECT asset_id, width, height, nbytes, payload_hex,
               (height // 16) AS bh, (width // 16) AS bw
        FROM assets WHERE modality = 'image'
    ),
    b AS (
        SELECT asset_id, width, bh, bw,
               CAST(p AS BIGINT) AS pos,
               {{byte_at}} AS v
        FROM img, UNNEST(range(0, nbytes)) AS t(p)
    ),
    pooled AS (
        SELECT asset_id,
               ((pos // 3) // width) // bh AS r,
               ((pos // 3) % width) // bw AS c,
               CAST(SUM(v) AS BIGINT) AS s
        FROM b
        WHERE (pos // 3) // width < bh * 16 AND (pos // 3) % width < bw * 16
        GROUP BY asset_id, r, c
    ),
    pass1 AS (
        SELECT pooled.asset_id, basis.u AS u, pooled.c AS c,
               CAST(SUM(CAST(basis.w AS BIGINT) * pooled.s) AS BIGINT) AS t
        FROM pooled JOIN {_phash_basis_values()} ON basis.x = pooled.r
        GROUP BY pooled.asset_id, basis.u, pooled.c
    ),
    cmat AS (
        SELECT pass1.asset_id, pass1.u AS u, basis.u AS v,
               CAST(SUM(CAST(basis.w AS BIGINT) * pass1.t) AS BIGINT) AS cv
        FROM pass1 JOIN {_phash_basis_values()} ON basis.x = pass1.c
        GROUP BY pass1.asset_id, pass1.u, basis.u
    ),
    med AS (
        SELECT asset_id, cv AS med FROM (
            SELECT asset_id, cv,
                   ROW_NUMBER() OVER (PARTITION BY asset_id
                                      ORDER BY cv, u * 8 + v) AS rn
            FROM cmat WHERE NOT (u = 0 AND v = 0)
        ) WHERE rn = 32
    ),
    bits AS (
        SELECT cmat.asset_id, u * 8 + v AS k,
               CASE WHEN cv > med THEN 1 ELSE 0 END AS bit
        FROM cmat JOIN med ON cmat.asset_id = med.asset_id
    ),
    bands AS (
        SELECT asset_id, k // 16 AS bi,
               CAST(SUM(bit * (1 << (k % 16))) AS INT) AS bv
        FROM bits GROUP BY asset_id, bi
    ),
    cnt AS (SELECT bi, bv, COUNT(*) AS c FROM bands GROUP BY bi, bv),
    coll AS (
        SELECT bands.asset_id, CAST(SUM(cnt.c - 1) AS BIGINT) AS n_band_collisions
        FROM bands JOIN cnt ON bands.bi = cnt.bi AND bands.bv = cnt.bv
        GROUP BY bands.asset_id
    ),
    wide AS (
        SELECT asset_id,
               CAST(MAX(CASE WHEN bi = 0 THEN bv END) AS INT) AS band0,
               CAST(MAX(CASE WHEN bi = 1 THEN bv END) AS INT) AS band1,
               CAST(MAX(CASE WHEN bi = 2 THEN bv END) AS INT) AS band2,
               CAST(MAX(CASE WHEN bi = 3 THEN bv END) AS INT) AS band3
        FROM bands GROUP BY asset_id
    ),
    nb AS (
        SELECT asset_id, CAST(SUM(bit) AS INT) AS nbits FROM bits
        GROUP BY asset_id
    )
    SELECT wide.asset_id, band0, band1, band2, band3, nb.nbits,
           coll.n_band_collisions
    FROM wide
    JOIN nb ON wide.asset_id = nb.asset_id
    JOIN coll ON wide.asset_id = coll.asset_id
    """.format(assets_sql=assets_oracle_sql(with_hex=True), byte_at=_byte_at("p")),
)
def mm_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection by perceptual DCT hash: pool to a
    16x16 integer grid, separable fixed-point DCT-II, threshold the 8x8
    low-frequency block on the exact AC median (multimodal/ops.py::
    image_phash — all-integer, so the oracle replays the full
    decode -> pool -> DCT -> median -> band pipeline from payload hex).
    Complements mm_image_ahash_dedup: aHash bits flip under global
    brightness shifts, DCT bits don't. Same banded-LSH dedup contract and
    the same single-lineage melt (a groupBy+join here would re-run the
    Python decode stage per branch)."""
    from pyspark.sql import Window

    from chainhouse_spark.multimodal.ops import image_phash

    ph = image_phash(_assets(spark, sf_dir))
    melted = ph.select(
        "asset_id",
        "band0",
        "band1",
        "band2",
        "band3",
        "nbits",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("bi"), F.col(f"band{i}").alias("bv")
                    )
                    for i in range(4)
                ]
            )
        ).alias("m"),
    ).select("asset_id", "band0", "band1", "band2", "band3", "nbits", "m.bi", "m.bv")
    c = F.count(F.lit(1)).over(Window.partitionBy("bi", "bv"))
    return (
        melted.withColumn("c", c)
        .groupBy("asset_id")
        .agg(
            F.min("band0").alias("band0"),
            F.min("band1").alias("band1"),
            F.min("band2").alias("band2"),
            F.min("band3").alias("band3"),
            F.min("nbits").alias("nbits"),
            F.sum(F.col("c") - 1).cast("bigint").alias("n_band_collisions"),
        )
    )


@register(
    "mm_video_scene_cuts",
    oracle=f"""
    WITH assets AS ({assets_oracle_sql(with_hex=True)}),
    vid AS (
        SELECT asset_id, n_frames, nbytes, payload_hex
        FROM assets WHERE modality = 'video'
    ),
    b AS (
        SELECT asset_id, n_frames,
               CAST(p AS BIGINT) AS pos,
               {_byte_at("p")} AS v
        FROM vid, UNNEST(range(0, nbytes)) AS t(p)
    ),
    d AS (
        SELECT cur.asset_id,
               CAST(cur.pos // {FRAME_BYTES} AS INT) AS frame_idx,
               MIN(cur.n_frames) AS n_frames,
               CAST(SUM(ABS(cur.v - prev.v)) AS BIGINT) AS diff
        FROM b cur
        JOIN b prev
          ON cur.asset_id = prev.asset_id AND prev.pos = cur.pos - {FRAME_BYTES}
        WHERE cur.pos >= {FRAME_BYTES}
        GROUP BY cur.asset_id, frame_idx
    ),
    tot AS (
        SELECT asset_id, frame_idx, n_frames, diff,
               SUM(diff) OVER (PARTITION BY asset_id) AS total,
               ROW_NUMBER() OVER (PARTITION BY asset_id
                                  ORDER BY diff DESC, frame_idx ASC) AS rk
        FROM d
    )
    SELECT asset_id,
           CAST(MIN(n_frames) AS INT) AS n_frames,
           CAST(SUM(CASE WHEN diff * (n_frames - 1) > total
                         THEN 1 ELSE 0 END) AS INT) AS n_cuts,
           CAST(MIN(total) AS BIGINT) AS total_diff,
           CAST(MAX(CASE WHEN rk = 1 THEN diff END) AS BIGINT) AS max_diff,
           CAST(MIN(CASE WHEN rk = 1 THEN frame_idx END) AS INT) AS max_diff_frame
    FROM tot
    GROUP BY asset_id
    """,
)
def mm_video_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scene-cut detection over fake-codec videos: integer L1 frame diffs,
    cuts where a diff strictly exceeds the per-video mean (compared as
    d * n_pairs > total — no float), plus max-diff frame selection
    (multimodal/ops.py::video_scene_cuts). The oracle rebuilds every frame
    diff from payload hex via a pos-192 self-join. One Python stage, no
    shuffle (per-video work is partition-local)."""
    from chainhouse_spark.multimodal.ops import video_scene_cuts

    return video_scene_cuts(_assets(spark, sf_dir))


@register(
    "mm_audio_quality",
    oracle=f"""
    WITH assets AS ({assets_oracle_sql(with_hex=True)}),
    aud AS (
        SELECT asset_id, n_samples, payload_hex
        FROM assets WHERE modality = 'audio'
    ),
    smp AS (
        SELECT asset_id, n_samples, CAST(i AS BIGINT) AS i,
               CASE WHEN ({_byte_at("i * 2")} + 256 * {_byte_at("i * 2 + 1")}) >= 32768
                    THEN ({_byte_at("i * 2")} + 256 * {_byte_at("i * 2 + 1")}) - 65536
                    ELSE ({_byte_at("i * 2")} + 256 * {_byte_at("i * 2 + 1")}) END AS v
        FROM aud, UNNEST(range(0, n_samples)) AS t(i)
    ),
    flagged AS (
        SELECT asset_id, n_samples, i,
               CASE WHEN ABS(v) >= 30000 THEN 1 ELSE 0 END AS clip,
               CASE WHEN ABS(v) < 8000 THEN 1 ELSE 0 END AS silent
        FROM smp
    ),
    islands AS (
        SELECT asset_id, n_samples, clip, silent,
               i - ROW_NUMBER() OVER (PARTITION BY asset_id, silent
                                      ORDER BY i) AS isl
        FROM flagged
    ),
    runs AS (
        SELECT asset_id, CAST(COUNT(*) AS BIGINT) AS run_len
        FROM islands WHERE silent = 1
        GROUP BY asset_id, isl
    ),
    run_agg AS (
        SELECT asset_id,
               CAST(COUNT(*) FILTER (WHERE run_len >= 3) AS INT) AS n_silence_runs,
               CAST(COALESCE(MAX(run_len) FILTER (WHERE run_len >= 3), 0) AS INT)
                   AS longest_silence_run,
               CAST(COALESCE(SUM(run_len) FILTER (WHERE run_len >= 3), 0) AS BIGINT)
                   AS silence_total
        FROM runs GROUP BY asset_id
    ),
    base_agg AS (
        SELECT asset_id, CAST(MIN(n_samples) AS INT) AS n_samples,
               CAST(SUM(clip) AS INT) AS n_clipped
        FROM flagged GROUP BY asset_id
    )
    SELECT b.asset_id, b.n_samples, b.n_clipped,
           (ROUND((CAST(b.n_clipped AS DOUBLE) / b.n_samples) * 1e9) / 1e9 + 0.0) AS clipped_frac,
           COALESCE(r.n_silence_runs, 0) AS n_silence_runs,
           COALESCE(r.longest_silence_run, 0) AS longest_silence_run,
           (ROUND((CAST(COALESCE(r.silence_total, 0) AS DOUBLE) / b.n_samples
               ) * 1e9) / 1e9 + 0.0) AS silence_frac
    FROM base_agg b LEFT JOIN run_agg r ON b.asset_id = r.asset_id
    """,
)
def mm_audio_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio QA gate: per-clip clipping rate and silence-run structure
    (multimodal/ops.py::audio_quality — integer thresholds, gaps-and-
    islands run detection). The oracle re-decodes PCM16 little-endian
    samples from payload hex byte pairs and replays every count; the two
    fractions are single divisions of exact integers. One Python stage,
    no shuffle."""
    from chainhouse_spark.multimodal.ops import audio_quality

    return audio_quality(_assets(spark, sf_dir)).withColumn(
        "clipped_frac", round9("clipped_frac")
    ).withColumn("silence_frac", round9("silence_frac"))


# Round-at-9 exemptions (registry.ROUND9_EXEMPT): magnitudes past the
# cross-engine ROUND agreement zone — protected instead by integer-exact
# decode sums finished with one shared IEEE formula.
exempt_round9("mm_audio_features", {
    "rms": "PCM16 amplitude scale (~2.5e4)",
})
exempt_round9("mm_metadata_stats", {
    "avg_bytes": "payload byte scale (~2.5e3)",
})
