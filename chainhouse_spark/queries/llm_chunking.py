"""Document chunking for RAG / context-window preparation.

Splits documents into fixed-size overlapping windows — by characters and by
tokens — the shape retrieval pipelines feed to embedders. Both variants are
pure per-row generators (sequence + explode): no shuffle at all, so at
100 TB they stream map-only and scale linearly with input bytes. The
chunk spine is `sequence(start, stop, stride)` (ClickHouse `numbers()` /
DuckDB `generate_series` parity), exploded per document.

Deterministic: chunk boundaries are integer arithmetic, chunk text is
substring/slice — exact string equality across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table

CHAR_CHUNK = 200
CHAR_STRIDE = 150
WORD_CHUNK = 50
WORD_STRIDE = 40


@register(
    "text_chunk_chars",
    oracle=f"""
    SELECT doc_id,
           CAST((start - 1) / {CHAR_STRIDE} AS INT) AS chunk_id,
           substr(text, start, {CHAR_CHUNK}) AS chunk,
           length(substr(text, start, {CHAR_CHUNK})) AS chunk_len
    FROM (
        SELECT doc_id, text,
               CAST(unnest(generate_series(1, GREATEST(length(text), 1), {CHAR_STRIDE}))
                    AS INT) AS start
        FROM documents
    )
    """,
)
def text_chunk_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding character windows: {CHAR_CHUNK}-char chunks every
    {CHAR_STRIDE} chars ({CHAR_CHUNK - CHAR_STRIDE}-char overlap)."""
    d = load_table(spark, sf_dir, "documents")
    starts = F.sequence(
        F.lit(1), F.greatest(F.length("text"), F.lit(1)), F.lit(CHAR_STRIDE)
    )
    return (
        d.select("doc_id", "text", F.explode(starts).alias("start"))
        .select(
            "doc_id",
            ((F.col("start") - 1) / CHAR_STRIDE).cast("int").alias("chunk_id"),
            F.expr(f"substr(text, start, {CHAR_CHUNK})").alias("chunk"),
            F.length(F.expr(f"substr(text, start, {CHAR_CHUNK})")).alias("chunk_len"),
        )
    )


@register(
    "text_chunk_words",
    oracle=f"""
    SELECT doc_id,
           CAST(start / {WORD_STRIDE} AS INT) AS chunk_id,
           array_to_string(toks[start + 1 : start + {WORD_CHUNK}], ' ') AS chunk,
           LEAST(len(toks) - start, {WORD_CHUNK}) AS n_words
    FROM (
        SELECT doc_id, string_split(text, ' ') AS toks,
               CAST(unnest(generate_series(0, GREATEST(len(string_split(text, ' ')) - 1, 0),
                                           {WORD_STRIDE})) AS INT) AS start
        FROM documents
    )
    """,
)
def text_chunk_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding word windows: {WORD_CHUNK}-token chunks every {WORD_STRIDE}
    tokens — the token-budgeted shape embedders consume. slice() is 1-based
    in both engines; the spine stops at the last token index so every word
    lands in at least one chunk."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    starts = F.sequence(
        F.lit(0), F.greatest(F.size(toks) - 1, F.lit(0)), F.lit(WORD_STRIDE)
    )
    return (
        d.select("doc_id", toks.alias("toks"), F.explode(starts).alias("start"))
        .select(
            "doc_id",
            (F.col("start") / WORD_STRIDE).cast("int").alias("chunk_id"),
            F.array_join(
                F.slice(F.col("toks"), F.col("start") + 1, F.lit(WORD_CHUNK)), " "
            ).alias("chunk"),
            F.least(F.size("toks") - F.col("start"), F.lit(WORD_CHUNK)).alias("n_words"),
        )
    )
