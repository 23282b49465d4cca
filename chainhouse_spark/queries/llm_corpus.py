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


@register(
    "corpus_ngram_novelty",
    oracle="""
    WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS t
                 FROM documents),
    sh AS (
        SELECT DISTINCT source, CAST(doc_id % 2 AS INT) AS snap,
               md5(array_to_string(t[i:i+2], ' ')) AS h
        FROM tok, LATERAL (SELECT UNNEST(range(1, GREATEST(len(t) - 1, 1))) AS i) ii
    ),
    a AS (SELECT DISTINCT source, h FROM sh WHERE snap = 0),
    b AS (SELECT DISTINCT source, h FROM sh WHERE snap = 1),
    new AS (
        SELECT b.source, CAST(COUNT(*) AS BIGINT) AS n_new
        FROM b ANTI JOIN a ON a.source = b.source AND a.h = b.h
        GROUP BY b.source
    ),
    tot AS (
        SELECT source,
               CAST(COUNT(*) FILTER (WHERE snap = 0) AS BIGINT)
                   AS n_base_shingles,
               CAST(COUNT(*) FILTER (WHERE snap = 1) AS BIGINT)
                   AS n_cur_shingles
        FROM (SELECT DISTINCT source, snap, h FROM sh)
        GROUP BY source
    )
    SELECT tot.source, n_base_shingles, n_cur_shingles,
           COALESCE(new.n_new, 0) AS n_new_shingles,
           CASE WHEN n_cur_shingles > 0
                THEN CAST(COALESCE(new.n_new, 0) AS DOUBLE) / n_cur_shingles
           END AS novelty_rate
    FROM tot LEFT JOIN new ON new.source = tot.source
    """,
)
def corpus_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-over-snapshot n-gram novelty per source: what fraction of
    the new snapshot's distinct 3-word shingles was never seen in the
    baseline (doc_id-parity split) — the freshness diagnostic that decides
    whether re-crawling a source buys new training data or re-downloads
    the same text. Shingles reduce to distinct (source, md5) 16-byte keys
    before the anti-join (the decontamination shuffle discipline: keys
    move, text never does); novelty is one division of exact counts."""
    from chainhouse_spark.functions.text import word_shingles

    d = load_table(spark, sf_dir, "documents")
    sh = (
        d.select(
            "source",
            (F.col("doc_id") % 2).cast("int").alias("snap"),
            F.explode(word_shingles("text", 3)).alias("s"),
        )
        .select("source", "snap", F.md5("s").alias("h"))
        .distinct()
    )
    a = sh.filter(F.col("snap") == 0).select("source", "h")
    b = sh.filter(F.col("snap") == 1).select("source", "h")
    new = (
        b.join(a, ["source", "h"], "left_anti")
        .groupBy("source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_new"))
    )
    tot = sh.groupBy("source").agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_base_shingles"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_cur_shingles"),
    )
    return tot.join(new, "source", "left").select(
        "source",
        "n_base_shingles",
        "n_cur_shingles",
        F.coalesce("n_new", F.lit(0)).alias("n_new_shingles"),
        F.when(
            F.col("n_cur_shingles") > 0,
            F.coalesce("n_new", F.lit(0)).cast("double") / F.col("n_cur_shingles"),
        ).alias("novelty_rate"),
    )
