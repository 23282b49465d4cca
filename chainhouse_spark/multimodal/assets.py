"""Deterministic synthetic multimodal assets over the documents table.

The container has no image/audio codecs, so payloads are deterministic fake
binaries: md5-keystream bytes sized exactly to the typed metadata (width ×
height × channels for images, 2 bytes/sample PCM16 for audio, fixed 8×8×3
frames for video). Every expression below is written in the SQL dialect subset
shared by Spark and DuckDB, and reused verbatim on both sides — the Spark
DataFrame and the DuckDB oracle construct bit-identical payloads, so binary
plumbing (octet_length, byte slicing, per-frame hashing) is oracle-checkable.

At 100 TB the same pattern holds: `payload` is an opaque binary column carried
through scans/joins untouched (parquet stores it as a byte array; column
pruning drops it unless selected), and the typed `meta` columns are the
pushdown-able filter surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Frame geometry for fake video: 8×8 RGB → 192 bytes/frame, 384 hex chars.
FRAME_H = 8
FRAME_W = 8
FRAME_C = 3
FRAME_BYTES = FRAME_H * FRAME_W * FRAME_C

_MODALITY = (
    "CASE asset_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END"
)

# Typed metadata, all deterministic in asset_id. NULL where the field does not
# apply to the modality (CASE without ELSE).
_META_EXPRS = [
    f"CASE WHEN modality = 'image' THEN 16 + (asset_id % 8) * 4 WHEN modality = 'video' THEN {FRAME_W} END AS width",
    f"CASE WHEN modality = 'image' THEN 16 + (asset_id % 5) * 4 WHEN modality = 'video' THEN {FRAME_H} END AS height",
    f"CASE WHEN modality IN ('image', 'video') THEN {FRAME_C} END AS channels",
    "CASE WHEN modality = 'audio' THEN 8000 END AS sample_rate",
    "CASE WHEN modality = 'audio' THEN 1000 + (asset_id % 500) END AS n_samples",
    "CASE WHEN modality = 'video' THEN 4 END AS fps",
    "CASE WHEN modality = 'video' THEN 8 + (asset_id % 8) END AS n_frames",
    "CASE modality WHEN 'image' THEN 'image/fake' WHEN 'audio' THEN 'audio/fake' ELSE 'video/fake' END AS mime",
]

_NBYTES = (
    "CASE WHEN modality = 'image' THEN (16 + (asset_id % 8) * 4) * (16 + (asset_id % 5) * 4) * 3 "
    "WHEN modality = 'audio' THEN (1000 + (asset_id % 500)) * 2 "
    f"ELSE (8 + (asset_id % 8)) * {FRAME_BYTES} END AS nbytes"
)

# md5 keystream: each md5 contributes 32 hex chars (16 bytes); floor(n/8)+1
# repetitions always cover 2*n hex chars. floor() of an integral double is
# exact in both engines (no CAST-rounding divergence).
_PAYLOAD_HEX = (
    "substr(repeat(md5(concat('asset-', CAST(asset_id AS STRING))), "
    "CAST(floor(nbytes / 8.0) AS INT) + 1), 1, nbytes * 2)"
)


def synth_assets(docs: DataFrame) -> DataFrame:
    """documents → one multimodal asset per doc: typed metadata + exact-size
    binary payload. Map-only (no shuffle); payload built JVM-side (codegen)."""
    t = docs.selectExpr("doc_id AS asset_id").selectExpr(
        "asset_id", f"{_MODALITY} AS modality"
    )
    m = t.selectExpr("asset_id", "modality", *_META_EXPRS, _NBYTES)
    return m.selectExpr("*", f"unhex({_PAYLOAD_HEX}) AS payload")


def assets_oracle_sql(with_hex: bool = False) -> str:
    """The identical construction as a DuckDB subquery over `documents`.
    With ``with_hex`` the payload is also kept as a hex string so oracles can
    slice byte ranges without blob indexing."""
    hex_col = f", {_PAYLOAD_HEX} AS payload_hex" if with_hex else ""
    return f"""
    SELECT m.*, unhex({_PAYLOAD_HEX}) AS payload{hex_col}
    FROM (
      SELECT asset_id, modality, {", ".join(e for e in _META_EXPRS)}, {_NBYTES}
      FROM (
        SELECT doc_id AS asset_id, {_MODALITY.replace("asset_id", "doc_id")} AS modality
        FROM documents
      ) t
    ) m
    """
