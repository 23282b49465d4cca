"""The composed training-data cleaning pipeline, end to end, as ONE query:

    documents
      -> quality gate  (composite score >= 0.45; llm_text features)
      -> exact dedup   (keep min doc_id per md5(text), K8-style)
      -> near-dup gate (exact 3-gram Jaccard >= 0.8 pairs on the survivors,
                        connected components, keep each cluster's canonical)
      -> kept doc ids

Each stage is an operator proven individually elsewhere; this query proves
they COMPOSE — the property a real 100 TB pipeline depends on. The oracle
rebuilds the identical dataflow in SQL (quality expression, md5 group-min,
recursive-CTE components), so the whole pipeline is hash-checked.

Scale shape: quality gate is map-only; exact dedup shuffles 16-byte keys;
pair generation shuffles shingles of survivors only (the gates shrink the
corpus before the expensive stage — order matters and is preserved here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.functions.text import (
    LANG_STOPWORDS,
    n_tokens,
    punct_ratio,
    stopword_ratio,
    word_shingles,
)
from chainhouse_spark.operators.components import connected_components
from chainhouse_spark.operators.dedup import ngram_jaccard_pairs
from chainhouse_spark.queries.llm_dedup import _DUCK_SHINGLES
from chainhouse_spark.queries.llm_text import _DUCK_HITS
from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table

_QUALITY_THRESHOLD = 0.45

_DUCK_QUALITY = f"""
    LEAST(1.0, len(string_split(text, ' ')) / 100.0) * 0.5
      + (CAST({_DUCK_HITS["en"]} AS DOUBLE) / len(string_split(text, ' '))) * 0.3
      + (1.0 - CAST(LENGTH(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS DOUBLE) / LENGTH(text)) * 0.2
"""

# The shared shingle CTE reads from `documents`; re-point it at the
# quality+exact-dedup survivors.
_DUCK_SHINGLES_KEPT = _DUCK_SHINGLES.replace("FROM documents", "FROM kept")


@register(
    "pipeline_clean_corpus",
    oracle=f"""
    WITH RECURSIVE
    q AS (
        SELECT doc_id, text FROM documents
        WHERE {_DUCK_QUALITY} >= {_QUALITY_THRESHOLD}
    ),
    exact_keep AS (
        SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)
    ),
    kept AS (SELECT q.doc_id, q.text FROM q JOIN exact_keep USING (doc_id)),
    {_DUCK_SHINGLES_KEPT},
    sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM common
        JOIN sz sa ON sa.doc_id = doc_a
        JOIN sz sb ON sb.doc_id = doc_b
        WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.8
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach(a, b) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    clusters AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
    dropped AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id)
    SELECT k.doc_id FROM kept k
    WHERE k.doc_id NOT IN (SELECT doc_id FROM dropped)
    """,
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kept doc_ids after the full quality -> exact-dedup -> near-dup
    pipeline (see module docstring)."""
    d = load_table(spark, sf_dir, "documents")

    nt = n_tokens("text")
    quality = (
        F.least(F.lit(1.0), nt / 100.0) * 0.5
        + stopword_ratio("text", LANG_STOPWORDS["en"]) * 0.3
        + (F.lit(1.0) - punct_ratio("text")) * 0.2
    )
    q = d.filter(quality >= _QUALITY_THRESHOLD).select("doc_id", "text")

    exact_keep = q.groupBy(F.md5("text").alias("k")).agg(
        F.min("doc_id").alias("doc_id")
    )
    kept = q.join(exact_keep.select("doc_id"), "doc_id", "left_semi")

    pairs = ngram_jaccard_pairs(kept, shingle_words=3, threshold=0.8)
    clusters = connected_components(pairs, src="doc_a", dst="doc_b")
    dropped = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("doc_id")
    )
    return kept.join(dropped, "doc_id", "left_anti").select("doc_id")


@register(
    "pipeline_training_ready",
    oracle=f"""
    WITH RECURSIVE
    q AS (
        SELECT doc_id, text FROM documents
        WHERE {_DUCK_QUALITY} >= {_QUALITY_THRESHOLD}
    ),
    exact_keep AS (
        SELECT MIN(doc_id) AS doc_id FROM q GROUP BY md5(text)
    ),
    kept AS (SELECT q.doc_id, q.text FROM q JOIN exact_keep USING (doc_id)),
    {_DUCK_SHINGLES_KEPT},
    sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM common
        JOIN sz sa ON sa.doc_id = doc_a
        JOIN sz sb ON sb.doc_id = doc_b
        WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.8
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach(a, b) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    clusters AS (SELECT a AS doc_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
    dropped AS (SELECT doc_id FROM clusters WHERE doc_id <> cluster_id),
    clean AS (
        SELECT k.doc_id FROM kept k
        WHERE k.doc_id NOT IN (SELECT doc_id FROM dropped)
    ),
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    csh AS (
        SELECT DISTINCT doc_id, md5(array_to_string(t[i:i+2], ' ')) AS k
        FROM toks, LATERAL (SELECT UNNEST(range(1, GREATEST(len(t) - 1, 1))) AS i) ii
    ),
    test_sh AS (SELECT DISTINCT k FROM csh WHERE doc_id % 97 = 0),
    contaminated AS (
        SELECT DISTINCT a.doc_id FROM csh a JOIN test_sh USING (k)
        WHERE a.doc_id % 97 <> 0
    ),
    train AS (
        SELECT c.doc_id FROM clean c
        WHERE c.doc_id % 97 <> 0
          AND c.doc_id NOT IN (SELECT doc_id FROM contaminated)
          AND substr(md5(CAST(c.doc_id AS VARCHAR)), 1, 1) < 'd'
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens,
           md5(string_agg(CAST(d.doc_id AS VARCHAR), ',' ORDER BY d.doc_id))
               AS checksum
    FROM train t JOIN documents d USING (doc_id)
    GROUP BY d.source
    ORDER BY d.source
    """,
)
def pipeline_training_ready(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WHOLE training-data pipeline as one hash-checked query:

        quality gate -> exact dedup -> near-dup components   (clean)
        -> n-gram decontamination vs the held-out set
        -> hash-gate train split
        -> per-source manifest (n_docs, n_tokens, id checksum)

    Five stages, each proven individually elsewhere, composed in the
    order a 100 TB run uses (cheap map-only gates first, the expensive
    pair stage on survivors only, decontamination as a 16-byte-key
    semi-join, the split as a pure hash). The manifest checksum makes the
    gate total: moving ONE document across any stage boundary changes a
    per-source md5."""
    d = load_table(spark, sf_dir, "documents")
    clean = pipeline_clean_corpus(spark, sf_dir)  # doc_id survivors

    sh = d.select(
        "doc_id", F.explode(word_shingles("text", 3)).alias("s")
    ).select("doc_id", F.md5("s").alias("k")).distinct()
    test_sh = sh.filter("doc_id % 97 = 0").select("k").distinct()
    contaminated = (
        sh.filter("doc_id % 97 <> 0")
        .join(test_sh, "k", "left_semi")
        .select("doc_id")
        .distinct()
    )
    train = (
        clean.filter("doc_id % 97 <> 0")
        .join(contaminated, "doc_id", "left_anti")
        .filter("substr(md5(CAST(doc_id AS STRING)), 1, 1) < 'd'")
    )
    return (
        train.join(d, "doc_id")
        .select("doc_id", "source", F.size(F.split("text", " ")).alias("n_tok"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
            F.md5(
                F.expr(
                    "concat_ws(',', transform(array_sort(collect_list(doc_id)),"
                    " x -> CAST(x AS STRING)))"
                )
            ).alias("checksum"),
        )
        .orderBy("source")
    )
