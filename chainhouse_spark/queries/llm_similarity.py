"""Similarity-search queries over the embeddings table: exact brute-force
cosine top-k, LSH-bucketed approximate top-k, and blocked near-dup pairs.

Cosine values are bit-exact across engines (ordered double fold == DuckDB's
SUM(... ORDER BY i); verified empirically), so even ranks match exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.operators.similarity import (
    brute_force_topk,
    embedding_near_pairs,
    lsh_topk,
)
from chainhouse_spark.functions.rounding import round9
from chainhouse_spark.queries.registry import FRUGAL_ORACLE, register
from chainhouse_spark.tables import load_table

DIMS = 64

# DuckDB ordered-fold building blocks (1-based list indexing).
_DOT = "SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(c.embedding[i.i] AS DOUBLE) ORDER BY i.i)"
_QQ = "SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(q.embedding[i.i] AS DOUBLE) ORDER BY i.i)"
_CC = "SUM(CAST(c.embedding[i.i] AS DOUBLE) * CAST(c.embedding[i.i] AS DOUBLE) ORDER BY i.i)"
_IDX = f"(SELECT UNNEST(range(1, {DIMS + 1})) AS i) i"

# Unordered twins: constant-space aggregate state (DuckDB buffers every
# group's values to honor ORDER BY inside an aggregate; plain SUM doesn't).
# Only usable where no float reaches the oracled output — ranks are stable
# because neighbor margins (~1e-2 on random embeddings) are 14 orders above
# summation-order noise.
_DOT_U = "SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(c.embedding[i.i] AS DOUBLE))"
_QQ_U = "SUM(CAST(q.embedding[i.i] AS DOUBLE) * CAST(q.embedding[i.i] AS DOUBLE))"
_CC_U = "SUM(CAST(c.embedding[i.i] AS DOUBLE) * CAST(c.embedding[i.i] AS DOUBLE))"

_FRUGAL = FRUGAL_ORACLE

_DUCK_BUCKET_Q = " + ".join(
    f"(CASE WHEN q.embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(8)
)
_DUCK_BUCKET_C = " + ".join(
    f"(CASE WHEN c.embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)" for i in range(8)
)


@register(
    "ann_bruteforce_topk",
    oracle=f"""
    WITH dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               {_DOT} AS dot, {_QQ} AS qq, {_CC} AS cc
        FROM embeddings q, embeddings c, {_IDX}
        WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
        GROUP BY q.vec_id, c.vec_id
    ),
    ranked AS (
        SELECT query_id, cand_id,
               dot / (sqrt(qq) * sqrt(cc)) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, cand_id
               ) AS rank
        FROM dots
    )
    SELECT query_id, cand_id, (ROUND((cos_sim) * 1e9) / 1e9 + 0.0) AS cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 for query vectors vec_id < 5 vs the whole corpus."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = brute_force_topk(emb, emb.filter(F.col("vec_id") < 5), k=10)
    return res.withColumn("cos_sim", round9("cos_sim")).withColumn(
        "rank", F.col("rank").cast("int")
    )


@register(
    "ann_lsh_topk",
    oracle=f"""
    WITH dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               {_DOT} AS dot, {_QQ} AS qq, {_CC} AS cc
        FROM embeddings q, embeddings c, {_IDX}
        WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
          AND ({_DUCK_BUCKET_Q}) = ({_DUCK_BUCKET_C})
        GROUP BY q.vec_id, c.vec_id
    ),
    ranked AS (
        SELECT query_id, cand_id,
               dot / (sqrt(qq) * sqrt(cc)) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, cand_id
               ) AS rank
        FROM dots
    )
    SELECT query_id, cand_id, (ROUND((cos_sim) * 1e9) / 1e9 + 0.0) AS cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-10: candidates restricted to the query's 8-sign-bit
    LSH bucket (~corpus/256 per probe at scale)."""
    emb = load_table(spark, sf_dir, "embeddings")
    res = lsh_topk(emb, emb.filter(F.col("vec_id") < 5), k=10, nbits=8)
    return res.withColumn("cos_sim", round9("cos_sim")).withColumn(
        "rank", F.col("rank").cast("int")
    )


@register(
    "embedding_near_pairs",
    oracle=f"""
    SELECT q.label AS blk, q.vec_id AS vec_a, c.vec_id AS vec_b,
           (ROUND(({_DOT} / (sqrt({_QQ}) * sqrt({_CC}))) * 1e9) / 1e9 + 0.0) AS cos_sim
    FROM embeddings q, embeddings c, {_IDX}
    WHERE q.label = c.label AND q.vec_id < c.vec_id
    GROUP BY q.label, q.vec_id, c.vec_id
    HAVING {_DOT} / (sqrt({_QQ}) * sqrt({_CC})) >= 0.35
    """,
)
def embedding_near_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup pairs (cosine ≥ 0.35) blocked by label."""
    emb = load_table(spark, sf_dir, "embeddings")
    return embedding_near_pairs(emb, threshold=0.35).withColumn(
        "cos_sim", round9("cos_sim")
    )


@register(
    "embedding_norms",
    oracle=f"""
    SELECT c.vec_id, (ROUND((sqrt({_CC})) * 1e9) / 1e9 + 0.0) AS l2_norm,
           (ROUND(({_CC}) * 1e9) / 1e9 + 0.0) AS sq_sum
    FROM embeddings c, {_IDX}
    GROUP BY c.vec_id
    """,
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm — the normalization pass a real pipeline runs
    before indexing."""
    from chainhouse_spark.functions.vector import dot_sql

    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id",
        round9(
            F.expr(f"sqrt({dot_sql('embedding', 'embedding')})")).alias("l2_norm"),
        round9(F.expr(dot_sql("embedding", "embedding"))).alias("sq_sum"),
    )


@register(
    "semantic_dedup_kept",
    # FRUGAL (round 12): the recursive-CTE + ordered-fold combination is
    # the heaviest shared-connection oracle; after the round-12 rotation
    # reorder it OOM'd the 600MB-capped SHARED pytest connection (arena
    # accumulation from the oracles now preceding it — passes alone).
    # The frugal pragmas give it the fresh-connection + spill treatment
    # the driver sandbox class already uses; values are unchanged.
    oracle=f"""{_FRUGAL}
    WITH RECURSIVE
    pairs AS (
        SELECT q.vec_id AS vec_a, c.vec_id AS vec_b
        FROM embeddings q, embeddings c, {_IDX}
        WHERE q.label = c.label AND q.vec_id < c.vec_id
        GROUP BY q.label, q.vec_id, c.vec_id
        HAVING {_DOT} / (sqrt({_QQ}) * sqrt({_CC})) >= 0.35
    ),
    edges AS (
        SELECT vec_a AS a, vec_b AS b FROM pairs
        UNION ALL SELECT vec_b, vec_a FROM pairs
    ),
    reach(a, b) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    clusters AS (SELECT a AS vec_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
    dropped AS (SELECT vec_id FROM clusters WHERE vec_id <> cluster_id)
    SELECT vec_id FROM embeddings
    WHERE vec_id NOT IN (SELECT vec_id FROM dropped)
    """,
)
def semantic_dedup_kept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup: embedding near-pairs (cosine >= 0.35,
    label-blocked) -> connected components -> keep each cluster's min-id
    canonical; singletons survive untouched.

    Composes the blocked pair generator with the iterative min-label
    propagation operator (operators/components.py) — the embedding-space
    version of the text near-dup pipeline in llm_pipeline.py. At 100 TB the
    pair relation (not the corpus) drives cost, and blocking bounds it to
    within-label cross products.
    """
    from chainhouse_spark.operators.components import connected_components

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = embedding_near_pairs(emb, threshold=0.35).select("vec_a", "vec_b")
    clusters = connected_components(pairs, src="vec_a", dst="vec_b")
    dropped = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("vec_id")
    )
    return emb.join(dropped, "vec_id", "left_anti").select("vec_id")


# semantic_dedup_cells blocks by a 6-bit sign-LSH cell (64 cells) instead of
# the label column — the CELL is what a 100 TB deployment actually has
# (labels don't exist on raw corpora). DuckDB twin of the bucket expression:
_CELL_BITS = 6
_DUCK_CELL_Q = " + ".join(
    f"(CASE WHEN q.embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(_CELL_BITS)
)
_DUCK_CELL_C = " + ".join(
    f"(CASE WHEN c.embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(_CELL_BITS)
)


@register(
    "semantic_dedup_cells",
    oracle=f"""
    WITH RECURSIVE
    pairs AS (
        SELECT q.vec_id AS vec_a, c.vec_id AS vec_b
        FROM embeddings q, embeddings c, {_IDX}
        WHERE q.vec_id < c.vec_id AND ({_DUCK_CELL_Q}) = ({_DUCK_CELL_C})
        GROUP BY q.vec_id, c.vec_id
        HAVING {_DOT} / (sqrt({_QQ}) * sqrt({_CC})) >= 0.2
    ),
    edges AS (
        SELECT vec_a AS a, vec_b AS b FROM pairs
        UNION ALL SELECT vec_b, vec_a FROM pairs
    ),
    reach(a, b) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ),
    clusters AS (SELECT a AS vec_id, MIN(b) AS cluster_id FROM reach GROUP BY a),
    dropped AS (SELECT vec_id FROM clusters WHERE vec_id <> cluster_id)
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_vecs,
           CAST(SUM(CASE WHEN dr.vec_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept,
           CAST(SUM(CASE WHEN dr.vec_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_dropped,
           (ROUND((CAST(SUM(CASE WHEN dr.vec_id IS NULL THEN 0 ELSE 1 END)
                        AS DOUBLE) / COUNT(*)) * 1e9) / 1e9 + 0.0) AS drop_share
    FROM embeddings e
    JOIN documents d ON d.doc_id = e.vec_id
    LEFT JOIN dropped dr ON dr.vec_id = e.vec_id
    GROUP BY d.source
    """,
)
def semantic_dedup_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic dedup with CELL bucketing + per-source
    impact report: embeddings are assigned to sign-LSH cells (6 bits = 64
    cells — deterministic axis-aligned hyperplanes, so the oracle replays
    the assignment bit-for-bit, unlike iterative k-means), near-dup pairs
    are found by exact cosine >= 0.2 WITHIN a cell only, duplicate groups
    are closed by connected components, each group keeps its min-id
    canonical, and the readout is per-source kept/dropped counts + drop
    share — the go/no-go table for "what does semantic dedup do to my
    mixture" (same idiom as dedup_impact_on_mixture for exact dedup).

    This closes the dedup modality ladder: exact -> n-gram Jaccard ->
    MinHash -> SimHash -> SEMANTIC (embedding space). Reference
    c0mm4nd/chainhouse delegates all dedup to ClickHouse's
    ReplacingMergeTree (src/schema.rs); the semantic variant has no
    reference analog — it's the LLM-pipeline extension.

    Scale: candidate generation is never all-pairs — one shuffle on
    (cell, salt) with the small side replicated over the salt range
    (operators/similarity.py::embedding_near_pairs), components run the
    alternating large-star/small-star form on the PAIR relation
    (diameter-INDEPENDENT O(log^2 n) rounds — min-label propagation needs
    diameter rounds, and the round-11 100x smoke caught it grinding
    through chained within-cell clusters; both algorithms provably reach
    the identical clustering, `dedup_clusters_star`), then one id-equi
    join back to documents and one per-source aggregate. At 100 TB: raise
    the cell bits so cells stay bounded (the cell id is also the at-rest
    partition key — same layout note as operators/ivf.py), or swap the
    cell column for trained k-means cells via
    operators/ivf.py::assign_cells — the report pipeline is identical."""
    from chainhouse_spark.functions.vector import sign_bucket
    from chainhouse_spark.operators.components import connected_components_star

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    cells = emb.withColumn("cell", sign_bucket("embedding", nbits=_CELL_BITS))
    pairs = embedding_near_pairs(
        cells, block_col="cell", threshold=0.2
    ).select("vec_a", "vec_b")
    clusters = connected_components_star(pairs, src="vec_a", dst="vec_b")
    dropped = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("vec_id"), F.lit(1).alias("is_dropped")
    )
    return (
        emb.select("vec_id")
        .join(docs, "vec_id")
        .join(dropped, "vec_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(F.when(F.col("is_dropped").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.coalesce(F.col("is_dropped"), F.lit(0)))
            .cast("bigint")
            .alias("n_dropped"),
        )
        .withColumn(
            "drop_share",
            round9(F.col("n_dropped").cast("double") / F.col("n_vecs")),
        )
    )


@register(
    "ann_ivf_topk",
    oracle="""
    SELECT COUNT(*) AS n_queries, COUNT(*) * 10 AS n_results, TRUE AS recall_ok
    FROM embeddings WHERE vec_id < 5
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10: KMeans coarse cells, 8-of-16 probed per
    query. Iterative KMeans is not SQL-expressible, so the oracled surface
    is the invariant summary: query/result counts (cross-checked: exactly
    k rows per query) + a bool asserting aggregate recall@10 vs the exact
    brute-force baseline is >= 0.6 (measured 0.76 at sf0.001, 0.84 at
    sf0.01; per-query recall is too noisy at toy corpus sizes to pin).
    The raw top-k rows stay available via operators/ivf.py::ivf_topk."""
    from chainhouse_spark.operators.ivf import ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    approx = ivf_topk(emb, q, k=10, n_cells=16, n_probe=8)
    exact = brute_force_topk(emb, q, k=10)
    hits = approx.join(
        exact.select("query_id", "cand_id"), ["query_id", "cand_id"], "left_semi"
    )
    counts = approx.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_results"),
    )
    return counts.crossJoin(
        hits.agg(
            (
                F.count(F.lit(1)).cast("double")
                >= F.lit(0.6) * F.lit(10.0) * F.lit(5.0)
            ).alias("recall_ok")
        )
    )


@register(
    "ann_lsh_multiprobe_topk",
    oracle=f"""{_FRUGAL}
    WITH dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               {_DOT} AS dot, {_QQ} AS qq, {_CC} AS cc
        FROM embeddings q, embeddings c, {_IDX}
        WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
          AND bit_count(xor({_DUCK_BUCKET_Q}, {_DUCK_BUCKET_C})) <= 1
        GROUP BY q.vec_id, c.vec_id
    ),
    ranked AS (
        SELECT query_id, cand_id,
               dot / (sqrt(qq) * sqrt(cc)) AS cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, cand_id
               ) AS rank
        FROM dots
    )
    SELECT query_id, cand_id, (ROUND((cos_sim) * 1e9) / 1e9 + 0.0) AS cos_sim, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def ann_lsh_multiprobe_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe LSH: the query's bucket + every 1-bit-flip neighbor
    (membership == bucket Hamming distance <= 1, which is what the oracle
    states declaratively; the Spark side expands probes to keep the
    equality join)."""
    from chainhouse_spark.operators.similarity import lsh_multiprobe_topk

    emb = load_table(spark, sf_dir, "embeddings")
    res = lsh_multiprobe_topk(emb, emb.filter(F.col("vec_id") < 5), k=10, nbits=8)
    return res.withColumn("cos_sim", round9("cos_sim")).withColumn(
        "rank", F.col("rank").cast("int")
    )


@register(
    "ann_knn_classify",
    oracle=f"""{_FRUGAL}
    WITH dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id, c.label AS cand_label,
               {_DOT_U} AS dot, {_QQ_U} AS qq, {_CC_U} AS cc
        FROM embeddings q, embeddings c, {_IDX}
        WHERE q.vec_id % 10 = 1 AND q.vec_id < 300 AND c.vec_id % 10 = 0
        GROUP BY q.vec_id, c.vec_id, c.label
    ),
    ranked AS (
        SELECT query_id, cand_id, cand_label,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, cand_id
               ) AS rank
        FROM dots
    ),
    votes AS (
        SELECT query_id, cand_label, COUNT(*) AS n_votes
        FROM ranked WHERE rank <= 5
        GROUP BY query_id, cand_label
    ),
    winner AS (
        SELECT query_id, cand_label, n_votes,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY n_votes DESC, cand_label ASC) AS pick
        FROM votes
    )
    SELECT query_id, CAST(cand_label AS INT) AS predicted_label,
           CAST(n_votes AS BIGINT) AS n_votes
    FROM winner WHERE pick = 1
    """,
)
def ann_knn_classify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN classification (k=5, cosine): unlabeled queries take the
    majority label of their 5 nearest labeled reference vectors (ties →
    smaller label). Composition of the existing exact top-k (broadcast
    queries, map-only scoring, one rank shuffle) with a |queries x k|-row
    vote count — the label-propagation primitive for weakly-supervised
    corpus labeling. At 100 TB the reference set is the small side and the
    corpus streams through map-only scoring."""
    emb = load_table(spark, sf_dir, "embeddings")
    refs = emb.filter(F.col("vec_id") % 10 == 0)
    queries = emb.filter((F.col("vec_id") % 10 == 1) & (F.col("vec_id") < 300))
    top5 = brute_force_topk(refs, queries, k=5)
    labeled = top5.join(
        refs.select(F.col("vec_id").alias("cand_id"), F.col("label").alias("cand_label")),
        "cand_id",
    )
    votes = labeled.groupBy("query_id", "cand_label").agg(
        F.count(F.lit(1)).alias("n_votes")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("cand_label")
    )
    return (
        votes.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") == 1)
        .select(
            "query_id",
            F.col("cand_label").cast("int").alias("predicted_label"),
            F.col("n_votes").cast("bigint").alias("n_votes"),
        )
    )


@register(
    "ann_bruteforce_gemm",
    oracle=f"""{_FRUGAL}
    WITH dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               {_DOT_U} AS dot, {_QQ_U} AS qq, {_CC_U} AS cc
        FROM embeddings q, embeddings c, {_IDX}
        WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
        GROUP BY q.vec_id, c.vec_id
    ),
    ranked AS (
        SELECT query_id, cand_id,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, cand_id
               ) AS rank
        FROM dots
    )
    SELECT query_id, cand_id, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 10
    """,
)
def ann_bruteforce_gemm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BLAS-vectorized exact top-k (operators/similarity.py::
    brute_force_topk_gemm) — same queries as `ann_bruteforce_topk`. numpy's
    pairwise reduction and the SQL fold differ in the last float ulp, so
    the similarity column is dropped from the oracled surface and the
    id/rank output is checked against the exact SQL ranking (random
    embeddings put neighbor margins ~1e-2, 14 orders above ulp noise, so
    ranks are order-stable across the two summation orders; cosine
    agreement to 1e-9 is additionally pinned in tests/test_ivf.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    from chainhouse_spark.operators.similarity import brute_force_topk_gemm

    res = brute_force_topk_gemm(emb, emb.filter(F.col("vec_id") < 5), k=10)
    return res.select("query_id", "cand_id", F.col("rank").cast("int").alias("rank"))


@register(
    "ann_ivf_at_rest_topk",
    oracle="""
    SELECT COUNT(*) AS n_queries, COUNT(*) * 10 AS n_results,
           TRUE AS recall_ok, TRUE AS matches_memory
    FROM embeddings WHERE vec_id < 5
    """,
)
def ann_ivf_at_rest_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted-index flavor of ann_ivf_topk: ivf_write lays the
    corpus out as parquet PARTITIONED BY coarse-quantizer cell (centroids
    alongside), ivf_probe reads it back with a literal probed-cell IN-list
    the scan turns into PartitionFilters — unprobed cells' files never
    open. Invariant oracle (KMeans is not SQL-expressible): exact
    query/result counts, recall@10 >= 0.6 vs brute force, AND
    at-rest results == the in-memory ivf_topk at identical params (the
    persisted path must not change a single rank)."""
    from chainhouse_spark.scratch import scratch_dir
    from chainhouse_spark.operators.ivf import ivf_probe, ivf_topk, ivf_write

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    idx = scratch_dir(prefix="ivf_idx_")
    ivf_write(emb, idx, n_cells=16)
    at_rest = ivf_probe(spark, idx, q, k=10, n_probe=8)
    mem = ivf_topk(emb, q, k=10, n_cells=16, n_probe=8)

    exact = brute_force_topk(emb, q, k=10)
    hits = at_rest.join(
        exact.select("query_id", "cand_id"), ["query_id", "cand_id"], "left_semi"
    )
    sym_diff = at_rest.select("query_id", "cand_id", "rank").exceptAll(
        mem.select("query_id", "cand_id", "rank")
    ).unionAll(
        mem.select("query_id", "cand_id", "rank").exceptAll(
            at_rest.select("query_id", "cand_id", "rank")
        )
    )
    counts = at_rest.agg(
        F.countDistinct("query_id").alias("n_queries"),
        F.count(F.lit(1)).alias("n_results"),
    )
    return (
        counts.crossJoin(
            hits.agg(
                (
                    F.count(F.lit(1)).cast("double")
                    >= F.lit(0.6) * F.lit(10.0) * F.lit(5.0)
                ).alias("recall_ok")
            )
        ).crossJoin(
            sym_diff.agg((F.count(F.lit(1)) == 0).alias("matches_memory"))
        )
    )


@register(
    "embedding_class_separation",
    oracle="""
    WITH dims AS (
        SELECT label, CAST(i AS INT) AS dim,
               CAST(ROUND(embedding[CAST(i AS INT)], 6) AS DECIMAL(16,6)) AS v
        FROM embeddings, UNNEST(range(1, 65)) AS t(i)
    ),
    cent AS (
        SELECT label, dim,
               CAST(SUM(v) AS DOUBLE) / COUNT(*) AS c
        FROM dims GROUP BY label, dim
    ),
    pairs AS (
        SELECT a.label AS label_a, b.label AS label_b,
               CAST(ROUND((a.c - b.c) * (a.c - b.c), 9) AS DECIMAL(20,9)) AS t
        FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
    )
    SELECT label_a, label_b,
           (ROUND((SQRT(CAST(SUM(t) AS DOUBLE))) * 1e9) / 1e9 + 0.0) AS centroid_l2
    FROM pairs
    GROUP BY label_a, label_b
    """,
)
def embedding_class_separation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-separation diagnostic in embedding space: the pairwise L2
    distance between label centroids — collapsed classes (near-zero
    separation) predict poor k-NN/classifier behavior before any model
    runs. Per-dimension values round into DECIMAL(16,6) so centroid sums
    are exact and order-free; each squared centroid diff rounds into
    DECIMAL(20,9) before the cross-dimension sum (float adds are
    order-dependent, decimal adds are not); sqrt is the single final
    float op. Scale shape: one (label, dim) partial-agg shuffle collapses
    any corpus to |labels|*64 cells; everything after runs on cells."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label", F.posexplode("embedding").alias("dim0", "v0")
    ).select(
        "label",
        (F.col("dim0") + 1).cast("int").alias("dim"),
        F.round(F.col("v0"), 6).cast("decimal(16,6)").alias("v"),
    )
    cent = dims.groupBy("label", "dim").agg(
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("c")
    )
    a, b = cent.alias("a"), cent.alias("b")
    pairs = a.join(
        b,
        (F.col("a.dim") == F.col("b.dim")) & (F.col("a.label") < F.col("b.label")),
    ).select(
        F.col("a.label").alias("label_a"),
        F.col("b.label").alias("label_b"),
        F.round(
            (F.col("a.c") - F.col("b.c")) * (F.col("a.c") - F.col("b.c")), 9
        )
        .cast("decimal(20,9)")
        .alias("t"),
    )
    return pairs.groupBy("label_a", "label_b").agg(
        round9(F.sqrt(F.sum("t").cast("double"))).alias("centroid_l2")
    )


@register(
    "embedding_centroid_drift",
    oracle="""
    WITH dims AS (
        SELECT label, CAST(vec_id % 2 AS INT) AS snap, CAST(i AS INT) AS dim,
               CAST(ROUND(embedding[CAST(i AS INT)], 6) AS DECIMAL(16,6)) AS v
        FROM embeddings, UNNEST(range(1, 65)) AS t(i)
    ),
    cent AS (
        SELECT label, snap, dim,
               CAST(SUM(v) AS DOUBLE) / COUNT(*) AS c,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM dims GROUP BY label, snap, dim
    ),
    paired AS (
        SELECT a.label, a.dim, a.c AS ca, b.c AS cb, a.n AS n_a, b.n AS n_b
        FROM cent a JOIN cent b
          ON a.label = b.label AND a.dim = b.dim
         AND a.snap = 0 AND b.snap = 1
    )
    SELECT label,
           MIN(n_a) AS n_a, MIN(n_b) AS n_b,
           (ROUND((CAST(SUM(CAST(ROUND(ca * cb, 9) AS DECIMAL(20,9))) AS DOUBLE)
             / (SQRT(CAST(SUM(CAST(ROUND(ca * ca, 9) AS DECIMAL(20,9))) AS DOUBLE))
                * SQRT(CAST(SUM(CAST(ROUND(cb * cb, 9) AS DECIMAL(20,9))) AS DOUBLE)))
             ) * 1e9) / 1e9 + 0.0) AS centroid_cosine,
           (ROUND((SQRT(CAST(SUM(CAST(ROUND((ca - cb) * (ca - cb), 9)
                              AS DECIMAL(20,9))) AS DOUBLE))) * 1e9) / 1e9 + 0.0) AS centroid_l2_drift
    FROM paired
    GROUP BY label
    """,
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid drift between two embedding snapshots (vec_id
    parity as the snapshot split): cosine and L2 between each label's
    snapshot centroids — the re-embedding regression check (a model or
    preprocessing change that rotates/collapses a class shows up here
    before any downstream eval). Same exactness recipe as
    `embedding_class_separation`: per-dim values round into DECIMAL(16,6)
    so centroid sums are exact; every cross-dimension product term rounds
    into DECIMAL(20,9) before summing; sqrt/divisions are the only float
    ops. Scale: one (label, snap, dim) partial-agg shuffle collapses any
    corpus to |labels|*2*64 cells."""
    emb = load_table(spark, sf_dir, "embeddings")
    dims = emb.select(
        "label",
        (F.col("vec_id") % 2).cast("int").alias("snap"),
        F.posexplode("embedding").alias("dim0", "v0"),
    ).select(
        "label",
        "snap",
        (F.col("dim0") + 1).cast("int").alias("dim"),
        F.round(F.col("v0"), 6).cast("decimal(16,6)").alias("v"),
    )
    cent = dims.groupBy("label", "snap", "dim").agg(
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("c"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    a = cent.filter(F.col("snap") == 0).select(
        "label", "dim", F.col("c").alias("ca"), F.col("n").alias("n_a")
    )
    b = cent.filter(F.col("snap") == 1).select(
        "label", "dim", F.col("c").alias("cb"), F.col("n").alias("n_b")
    )
    paired = a.join(b, ["label", "dim"])
    dec = "CAST(ROUND({x}, 9) AS DECIMAL(20,9))"
    return paired.groupBy("label").agg(
        F.min("n_a").alias("n_a"),
        F.min("n_b").alias("n_b"),
        F.expr(
            f"(ROUND((CAST(SUM({dec.format(x='ca * cb')}) AS DOUBLE)"
            f" / (SQRT(CAST(SUM({dec.format(x='ca * ca')}) AS DOUBLE))"
            f" * SQRT(CAST(SUM({dec.format(x='cb * cb')}) AS DOUBLE)))) * 1e9) / 1e9 + 0.0)"
        ).alias("centroid_cosine"),
        F.expr(
            f"(ROUND((SQRT(CAST(SUM({dec.format(x='(ca - cb) * (ca - cb)')})"
            f" AS DOUBLE))) * 1e9) / 1e9 + 0.0)"
        ).alias("centroid_l2_drift"),
    )


@register(
    "ann_range_search",
    oracle=f"""
    WITH dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               {_DOT} AS dot, {_QQ} AS qq, {_CC} AS cc
        FROM embeddings q, embeddings c, {_IDX}
        WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
        GROUP BY q.vec_id, c.vec_id
    )
    SELECT query_id, cand_id, (ROUND((dot / (sqrt(qq) * sqrt(cc))) * 1e9) / 1e9 + 0.0) AS cos_sim
    FROM dots
    WHERE dot / (sqrt(qq) * sqrt(cc)) >= 0.3
    """,
)
def ann_range_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (radius) similarity search: ALL neighbors with cosine >= 0.3
    per query — the other retrieval API next to top-k (dedup and
    contamination sweeps want 'everything this similar', not 'the 10
    nearest'). Same ordered-fold cosine as `ann_bruteforce_topk` (exact
    across engines), same broadcast-queries map-only scan; the threshold
    makes the operator OUTPUT-bounded by data similarity rather than k —
    at 100 TB the scan cost is identical to brute-force top-k and the
    emitted pairs are the true result size (LSH/IVF prefilters compose in
    front exactly as in the top-k variants)."""
    from chainhouse_spark.functions.vector import cosine_prenorm_sql, norm_sql

    emb = load_table(spark, sf_dir, "embeddings")
    # Norms once per row on each side, not per pair (bit-identical —
    # functions/vector.py::cosine_prenorm_sql): the corpus-side scoring
    # pass runs 1 fold per pair instead of 3.
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_vec"),
        F.expr(norm_sql("embedding")).alias("qn"),
    )
    c = emb.select(
        F.col("vec_id").alias("cand_id"),
        F.col("embedding").alias("c_vec"),
        F.expr(norm_sql("embedding")).alias("cn"),
    )
    # Round-12 W12: range threshold via explode(filter(array(cos), ...))
    # — the .filter() form pulled the cosine into the join condition and
    # kept a second copy in the Project (2 folds per candidate), and its
    # null-intolerant division made the optimizer infer isnotnull(<norm
    # fold>) below each side's projection (2 norm folds per row). See
    # operators/similarity.py::embedding_near_pairs.
    cos = cosine_prenorm_sql("q_vec", "c_vec", "qn", "cn")
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.explode(
                F.expr(f"filter(array({cos}), c -> c >= CAST(0.3 AS DOUBLE))")
            ).alias("cos_sim"),
        )
        .withColumn("cos_sim", round9("cos_sim"))
    )


@register(
    "ann_lsh_recall_report",
    oracle=f"""
    WITH dots AS (
        SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
               {_DOT} AS dot, {_QQ} AS qq, {_CC} AS cc,
               ({_DUCK_BUCKET_Q}) = ({_DUCK_BUCKET_C}) AS same_bucket
        FROM embeddings q, embeddings c, {_IDX}
        WHERE q.vec_id < 5 AND c.vec_id != q.vec_id
        GROUP BY q.vec_id, c.vec_id,
                 ({_DUCK_BUCKET_Q}) = ({_DUCK_BUCKET_C})
    ),
    brute AS (
        SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, cand_id
                   ) AS rank
            FROM dots
        ) WHERE rank <= 10
    ),
    approx AS (
        SELECT query_id, cand_id FROM (
            SELECT query_id, cand_id,
                   ROW_NUMBER() OVER (
                       PARTITION BY query_id
                       ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, cand_id
                   ) AS rank
            FROM dots WHERE same_bucket
        ) WHERE rank <= 10
    )
    SELECT b.query_id,
           CAST(COUNT(a.cand_id) AS BIGINT) AS n_hits,
           ROUND(COUNT(a.cand_id) / 10.0, 2) AS recall_at_10
    FROM brute b
    LEFT JOIN approx a
      ON a.query_id = b.query_id AND a.cand_id = b.cand_id
    GROUP BY b.query_id
    """,
)
def ann_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of the 8-bit sign-LSH index against the exact brute-force
    baseline, per query — THE number an ANN deployment watches when
    tuning nbits/nprobe (ann_lsh_topk trades recall for touching
    ~corpus/256 of the vectors; this query says exactly what that trade
    bought). Composes the two existing operators and joins their top-10
    sets; both sides broadcast the 5-query side, so the added cost over
    running them separately is one |queries|x10-row join. Recall is an
    exact small-integer ratio."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    brute = brute_force_topk(emb, q, k=10).select("query_id", "cand_id")
    approx = lsh_topk(emb, q, k=10, nbits=8).select(
        F.col("query_id").alias("aq"), F.col("cand_id").alias("ac")
    )
    joined = brute.join(
        approx,
        (F.col("query_id") == F.col("aq")) & (F.col("cand_id") == F.col("ac")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        F.count("ac").cast("bigint").alias("n_hits"),
        F.round(F.count("ac") / 10.0, 2).alias("recall_at_10"),
    )


@register(
    "drift_embedding_cells",
    oracle=f"""
    WITH base AS (
        SELECT ({_DUCK_CELL_Q}) AS cell,
               ((strpos('0123456789abcdef',
                        substr(md5(CAST(vec_id AS VARCHAR)), 1, 1)) - 1) % 2)
                 AS snap
        FROM embeddings q
    ),
    cnt AS (
        SELECT cell,
               CAST(COUNT(*) FILTER (WHERE snap = 0) AS BIGINT) AS c0,
               CAST(COUNT(*) FILTER (WHERE snap = 1) AS BIGINT) AS c1
        FROM base GROUP BY cell
    ),
    spine AS (
        SELECT CAST(c AS INT) AS cell, COALESCE(cnt.c0, 0) AS c0,
               COALESCE(cnt.c1, 0) AS c1
        FROM UNNEST(range(0, {1 << _CELL_BITS})) t(c)
        LEFT JOIN cnt ON cnt.cell = c
    ),
    tot AS (SELECT SUM(c0) AS n0, SUM(c1) AS n1 FROM spine)
    SELECT cell,
           CAST(c0 AS BIGINT) AS n_ref,
           CAST(c1 AS BIGINT) AS n_cur,
           (ROUND((CAST(c0 AS DOUBLE) / n0) * 1e9) / 1e9 + 0.0) AS share_ref,
           (ROUND((CAST(c1 AS DOUBLE) / n1) * 1e9) / 1e9 + 0.0) AS share_cur,
           CAST(CAST(ROUND(
               (CAST(c1 + 1 AS DOUBLE) / (n1 + {1 << _CELL_BITS})
                - CAST(c0 + 1 AS DOUBLE) / (n0 + {1 << _CELL_BITS}))
               * LN((CAST(c1 + 1 AS DOUBLE) / (n1 + {1 << _CELL_BITS}))
                    / (CAST(c0 + 1 AS DOUBLE) / (n0 + {1 << _CELL_BITS}))), 6)
             AS DECIMAL(20, 6)) AS DOUBLE) AS psi_term
    FROM spine, tot
    """,
)
def drift_embedding_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-SPACE drift monitor: per sign-LSH cell, the population
    share in two corpus snapshots (deterministic md5 bit of vec_id — the
    id-arithmetic trap documented in drift_psi_by_source applies here too)
    plus the cell's Laplace-smoothed PSI term. Length/field drift monitors
    (drift_psi_by_source, drift_column_profile) can't see a re-embedding
    or distribution shift that moves vectors BETWEEN regions of the space
    while leaving every scalar column untouched — this is the readout an
    embedding-index owner watches before deciding to re-train IVF
    centroids or re-balance an at-rest layout. Cells are the same 6-bit
    sign buckets semantic_dedup_cells blocks on, so a drifting cell here
    directly names the partition whose dedup/probe cost is changing.

    Per-cell PSI terms follow the stat_entropy recipe (ROUND(term, 6)
    into DECIMAL — LN may differ in the last ulp across engines); shares
    are exact integer ratios rounded at 9. The 64-row cell spine is fixed,
    so the output is always 64 rows.

    Scale: one scan collapses map-side to <= 64 x 2 cells in a single
    shuffle; the spine is spark.range(64) (metadata), totals are a 1-row
    broadcast. At 100 TB: identical plan, 64-row state."""
    from chainhouse_spark.functions.vector import sign_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    n_cells = 1 << _CELL_BITS
    base = emb.select(
        sign_bucket("embedding", nbits=_CELL_BITS).alias("cell"),
        F.expr(
            "(CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 1), 16, 10)"
            " AS INT) % 2)"
        ).alias("snap"),
    )
    cnt = base.groupBy("cell").agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0)).cast("bigint").alias("c0"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0)).cast("bigint").alias("c1"),
    )
    spine = (
        spark.range(n_cells)
        .select(F.col("id").cast("int").alias("cell"))
        .join(F.broadcast(cnt), "cell", "left")
        .select(
            "cell",
            F.coalesce("c0", F.lit(0)).alias("c0"),
            F.coalesce("c1", F.lit(0)).alias("c1"),
        )
    )
    tot = spine.agg(
        F.sum("c0").alias("n0"), F.sum("c1").alias("n1")
    )
    p0 = f"(CAST(c0 + 1 AS DOUBLE) / (n0 + {n_cells}))"
    p1 = f"(CAST(c1 + 1 AS DOUBLE) / (n1 + {n_cells}))"
    return spine.crossJoin(F.broadcast(tot)).select(
        "cell",
        F.col("c0").cast("bigint").alias("n_ref"),
        F.col("c1").cast("bigint").alias("n_cur"),
        round9(F.expr("CAST(c0 AS DOUBLE) / n0")).alias("share_ref"),
        round9(F.expr("CAST(c1 AS DOUBLE) / n1")).alias("share_cur"),
        F.expr(
            f"CAST(CAST(ROUND(({p1} - {p0}) * LN({p1} / {p0}), 6)"
            " AS DECIMAL(20, 6)) AS DOUBLE)"
        ).alias("psi_term"),
    )


_SWEEP_TAUS = [0.15, 0.2, 0.25, 0.3, 0.4, 0.5]


@register(
    "semantic_dedup_threshold_sweep",
    oracle=f"""
    WITH pairs AS (
        SELECT q.vec_id AS vec_a, c.vec_id AS vec_b,
               {_DOT} / (sqrt({_QQ}) * sqrt({_CC})) AS cos_sim
        FROM embeddings q, embeddings c, {_IDX}
        WHERE q.vec_id < c.vec_id AND ({_DUCK_CELL_Q}) = ({_DUCK_CELL_C})
        GROUP BY q.vec_id, c.vec_id
    ),
    taus AS (
        SELECT CAST(UNNEST({_SWEEP_TAUS!r}) AS DOUBLE) AS tau
    ),
    idm AS (
        SELECT id, MAX(cos_sim) AS max_cos,
               """ + ", ".join(
        f"SUM(CASE WHEN cos_sim >= {t!r} THEN 1 ELSE 0 END) AS c_{i}"
        for i, t in enumerate(_SWEEP_TAUS)
    ) + f"""
        FROM (SELECT UNNEST([vec_a, vec_b]) AS id, cos_sim FROM pairs)
        GROUP BY id
    )
    SELECT t.tau,
           CASE t.tau """ + " ".join(
        f"WHEN {t!r} THEN (SELECT CAST(SUM(c_{i}) // 2 AS BIGINT) FROM idm)"
        for i, t in enumerate(_SWEEP_TAUS)
    ) + """ END AS n_pairs,
           CASE t.tau """ + " ".join(
        f"WHEN {t!r} THEN (SELECT CAST(SUM(CASE WHEN max_cos >= {t!r} "
        f"THEN 1 ELSE 0 END) AS BIGINT) FROM idm)"
        for i, t in enumerate(_SWEEP_TAUS)
    ) + """ END AS n_docs_affected
    FROM taus t
    """,
)
def semantic_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold PLANNER for semantic dedup: for each candidate cosine
    cutoff, how many within-cell near-dup pairs fire and how many distinct
    documents they touch — the readout that picks semantic_dedup_cells'
    tau BEFORE paying for connected components at scale (the companion of
    dedup_lsh_band_plan and dedup_threshold_sweep, in embedding space).
    The expensive within-cell pair relation is consumed EXACTLY ONCE
    (Spark materializes identical subplans per consumer, so two branches
    would pay the cell join twice): each pair explodes into its two doc
    ids, a per-id aggregate keeps MAX(cosine) plus six conditional counts,
    and one final 1-row aggregate answers everything — n_pairs(tau) =
    SUM(per-id counts)/2 (each pair contributes exactly 2 id rows — exact
    integer halving), n_docs_affected(tau) = COUNT(max_cos >= tau) (a doc
    is touched at tau iff its best pair clears tau). Cosines are bit-exact
    across engines (ordered fold), tau literals parse to identical
    doubles, and float MAX is exact — every comparison matches and all
    counts are exact integers.

    Scale: the one pair-generation shuffle is cell-blocked (never
    all-pairs); the sweep adds a 2x id explode whose per-id partial
    aggregation collapses map-side, so the id shuffle carries corpus-sized
    (not pair-sized) rows. Always 6 rows out."""
    from chainhouse_spark.functions.vector import sign_bucket

    emb = load_table(spark, sf_dir, "embeddings")
    cells = emb.withColumn("cell", sign_bucket("embedding", nbits=_CELL_BITS))
    pairs = embedding_near_pairs(
        cells, block_col="cell", threshold=-1.0
    ).select("vec_a", "vec_b", "cos_sim")
    idm = (
        pairs.select(
            F.explode(F.array("vec_a", "vec_b")).alias("id"), "cos_sim"
        )
        .groupBy("id")
        .agg(
            F.max("cos_sim").alias("max_cos"),
            *[
                F.sum(F.when(F.col("cos_sim") >= F.lit(t), 1).otherwise(0))
                .alias(f"c_{i}")
                for i, t in enumerate(_SWEEP_TAUS)
            ],
        )
    )
    row = idm.agg(
        *[
            F.expr(f"CAST(SUM(c_{i}) DIV 2 AS BIGINT)").alias(f"np_{i}")
            for i in range(len(_SWEEP_TAUS))
        ],
        *[
            F.sum(F.when(F.col("max_cos") >= F.lit(t), 1).otherwise(0))
            .cast("bigint")
            .alias(f"nd_{i}")
            for i, t in enumerate(_SWEEP_TAUS)
        ],
    )
    spine = pairs.sparkSession.createDataFrame(
        [(t, i) for i, t in enumerate(_SWEEP_TAUS)], "tau double, _i int"
    )
    np_case = "CASE _i " + " ".join(
        f"WHEN {i} THEN np_{i}" for i in range(len(_SWEEP_TAUS))
    ) + " END"
    nd_case = "CASE _i " + " ".join(
        f"WHEN {i} THEN nd_{i}" for i in range(len(_SWEEP_TAUS))
    ) + " END"
    return (
        spine.crossJoin(F.broadcast(row))
        .selectExpr(
            "tau",
            f"CAST({np_case} AS BIGINT) AS n_pairs",
            f"CAST({nd_case} AS BIGINT) AS n_docs_affected",
        )
    )


@register(
    "drift_ks_norm_by_source",
    oracle=f"""
    WITH norms AS (
        SELECT c.vec_id, sqrt({_CC}) AS v
        FROM embeddings c, {_IDX}
        GROUP BY c.vec_id
    ),
    base AS (
        SELECT d.source,
               ((strpos('0123456789abcdef',
                        substr(md5(CAST(n.vec_id AS VARCHAR)), 1, 1)) - 1) % 2)
                 AS snap,
               n.v
        FROM norms n JOIN documents d ON d.doc_id = n.vec_id
    ),
    cnt AS (
        SELECT source, v,
               CAST(COUNT(*) FILTER (WHERE snap = 0) AS BIGINT) AS c0,
               CAST(COUNT(*) FILTER (WHERE snap = 1) AS BIGINT) AS c1
        FROM base GROUP BY source, v
    ),
    cum AS (
        SELECT source, v, c0, c1,
               SUM(c0) OVER (PARTITION BY source ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS e0,
               SUM(c1) OVER (PARTITION BY source ORDER BY v
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS e1,
               SUM(c0) OVER (PARTITION BY source) AS n0,
               SUM(c1) OVER (PARTITION BY source) AS n1
        FROM cnt
    ),
    agg AS (
        SELECT source,
               CAST(MIN(n0) AS BIGINT) AS n_base,
               CAST(MIN(n1) AS BIGINT) AS n_cur,
               CAST(MAX(ABS(e0 * n1 - e1 * n0)) AS BIGINT) AS d_num
        FROM cum GROUP BY source
    )
    SELECT source, n_base, n_cur,
           (ROUND((CAST(d_num AS DOUBLE)
              / (CAST(n_base AS DOUBLE) * n_cur)) * 1e9) / 1e9 + 0.0) AS ks_d,
           CAST(d_num AS DOUBLE) / (CAST(n_base AS DOUBLE) * n_cur)
             > 1.358 * SQRT((n_base + CAST(n_cur AS DOUBLE))
                            / (CAST(n_base AS DOUBLE) * n_cur)) AS reject_05
    FROM agg
    WHERE n_base > 0 AND n_cur > 0
    """,
)
def drift_ks_norm_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-source KS drift on the EMBEDDING NORM distribution — the
    re-embedding canary that catches what drift_embedding_cells (where
    vectors sit) cannot: a model swap, a normalization change, or a
    quantization regression shifts the scale of the vectors before it
    shifts their directions, and the norm distribution registers it with
    no binning choice at all. Same machinery as drift_ks_by_source
    (statistics.py): md5-bit snapshot split (the id-arithmetic trap
    documented there), sup-distance as the integer max of
    |ecdf0*n1 - ecdf1*n0|, alpha=0.05 via the literal 1.358 constant.
    The norm itself is the bit-exact ordered fold (embedding_norms'
    proven expression), used RAW as the grouping/ordering key — it never
    reaches the output, so no rounding is needed and equal norms group
    identically in both engines.

    Scale: one map-side norm pass, one (source, v) count shuffle, ECDF
    windows partitioned BY SOURCE (never a single-task global window),
    BIGINT cross-products good to ~1e9 vectors per source-snapshot."""
    from chainhouse_spark.functions.vector import norm_sql
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr(norm_sql("embedding")).alias("v")
    )
    docs = load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "source"
    )
    d = emb.join(docs, "vec_id").select(
        "source",
        F.expr(
            "(CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 1), 16, 10)"
            " AS INT) % 2)"
        ).alias("snap"),
        "v",
    )
    cnt = d.groupBy("source", "v").agg(
        F.count(F.when(F.col("snap") == 0, 1)).cast("bigint").alias("c0"),
        F.count(F.when(F.col("snap") == 1, 1)).cast("bigint").alias("c1"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("source")
    cum = cnt.select(
        "source",
        F.sum("c0").over(w).alias("e0"),
        F.sum("c1").over(w).alias("e1"),
        F.sum("c0").over(wall).alias("n0"),
        F.sum("c1").over(wall).alias("n1"),
    )
    agg = cum.groupBy("source").agg(
        F.min("n0").cast("bigint").alias("n_base"),
        F.min("n1").cast("bigint").alias("n_cur"),
        F.max(F.abs(F.col("e0") * F.col("n1") - F.col("e1") * F.col("n0")))
        .cast("bigint")
        .alias("d_num"),
    )
    return agg.filter((F.col("n_base") > 0) & (F.col("n_cur") > 0)).selectExpr(
        "source",
        "n_base",
        "n_cur",
        "(ROUND((CAST(d_num AS DOUBLE)"
        " / (CAST(n_base AS DOUBLE) * n_cur)) * 1e9) / 1e9 + 0.0) AS ks_d",
        "CAST(d_num AS DOUBLE) / (CAST(n_base AS DOUBLE) * n_cur)"
        " > 1.358 * SQRT((n_base + CAST(n_cur AS DOUBLE))"
        " / (CAST(n_base AS DOUBLE) * n_cur)) AS reject_05",
    )
