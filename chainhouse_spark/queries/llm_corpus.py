"""Corpus-assembly operators: the last mile between a cleaned document set
and a training run.

- pack_documents_greedy: contiguous token-budget sharding — documents are
  packed in a deterministic order (doc_id within source) into bins of
  ~TOKEN_BUDGET tokens (the sequence-packing shard assignment; a bin may
  overrun by the tail of its last document, which training-side truncation
  absorbs). Pure window arithmetic: one shuffle on source.
- decontaminate_against_testset: n-gram overlap between the training split
  and a held-out set — the decontamination pass every published model card
  describes. Shingles are md5-hashed before the join so the shuffle moves
  16-byte keys, never text (same discipline as operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chainhouse_spark.functions.text import word_shingles
from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table

TOKEN_BUDGET = 2048

# Shared shingle CTE (3-word shingles, distinct per doc), md5-keyed.
_DUCK_SH_MD5 = """
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, md5(array_to_string(t[i:i+2], ' ')) AS k
        FROM tok, LATERAL (SELECT UNNEST(range(1, GREATEST(len(t) - 1, 1))) AS i) ii
    )
"""


@register(
    "pack_documents_greedy",
    oracle=f"""
    SELECT doc_id, source, n_tokens,
           CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 0) // {TOKEN_BUDGET} AS BIGINT) AS bin_id
    FROM (
      SELECT doc_id, source, (LENGTH(text) + 3) // 4 AS n_tokens FROM documents
    ) t
    """,
)
def pack_documents_greedy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget packing: each document's bin is its exclusive running
    token total div the budget — contiguous, deterministic, one window
    shuffle on source. At 100 TB the per-source prefix sums are the only
    coordination; bins never cross sources, so shards stream independently."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        F.expr("(LENGTH(text) + 3) div 4").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return d.select(
        "doc_id",
        "source",
        "n_tokens",
        F.expr(
            f"CAST(COALESCE(SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) div {TOKEN_BUDGET} AS BIGINT)"
        ).alias("bin_id"),
    )


@register(
    "decontaminate_against_testset",
    oracle=f"""
    WITH {_DUCK_SH_MD5},
    test_sh AS (SELECT DISTINCT k FROM sh WHERE doc_id % 97 = 0)
    SELECT a.doc_id, CAST(COUNT(*) AS BIGINT) AS n_shared
    FROM sh a JOIN test_sh USING (k)
    WHERE a.doc_id % 97 <> 0
    GROUP BY a.doc_id
    """,
)
def decontaminate_against_testset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs that share >= 1 distinct 3-gram with the held-out set
    (doc_id % 97 == 0 stands in for the benchmark), with the overlap count —
    the rows a decontamination pass would drop or flag.

    Scale shape: both sides reduce to distinct (doc, md5(shingle)) rows
    before the join, the join key is the 16-byte hash, and the held-out side
    is orders of magnitude smaller than the corpus — Spark broadcasts it
    when it fits, else it is a well-distributed shuffle on hash keys.
    """
    d = load_table(spark, sf_dir, "documents")
    sh = (
        d.select("doc_id", F.explode(word_shingles("text", 3)).alias("s"))
        .select("doc_id", F.md5("s").alias("k"))
        .distinct()
    )
    test_sh = sh.filter(F.col("doc_id") % 97 == 0).select("k").distinct()
    return (
        sh.filter(F.col("doc_id") % 97 != 0)
        .join(test_sh, "k")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
