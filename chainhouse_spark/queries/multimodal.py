"""Multimodal queries: binary-payload plumbing over the documents table.

The asset construction is a shared Spark/DuckDB SQL fragment
(multimodal/assets.py), so even the BINARY column contents are
oracle-checkable: metadata stats compare octet_length aggregates, and
frame sampling compares per-frame md5s computed from raw bytes (Spark,
mapInPandas) vs hex-string slices (DuckDB).

image/audio feature extraction and resize decode binary via numpy — genuinely
non-SQL — so those register rows-only (the driver records the weaker check).
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
    image_features,
    image_resize,
)
from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table


def _assets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return synth_assets(load_table(spark, sf_dir, "documents"))


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


@register("mm_image_features")
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode → channel means/std/brightness (numpy; rows-only check)."""
    return image_features(_assets(spark, sf_dir))


@register("mm_audio_features")
def mm_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PCM16 decode → rms/peak/zero-crossings (numpy; rows-only check)."""
    return audio_features(_assets(spark, sf_dir))


@register("mm_image_resize")
def mm_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block-average resize to 8×8; returns the re-encoded asset rows with
    a checksum column (rows-only check; resize math is non-SQL)."""
    out = image_resize(_assets(spark, sf_dir), out_h=8, out_w=8)
    return out.select(
        "asset_id",
        "width",
        "height",
        "channels",
        F.expr("octet_length(payload)").alias("payload_bytes"),
        F.md5("payload").alias("payload_md5"),
    )
