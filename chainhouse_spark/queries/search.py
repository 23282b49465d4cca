"""Lexical + hybrid retrieval over the documents corpus: inverted-index
build, Okapi BM25 top-k, and reciprocal-rank-fusion of the lexical and
vector rankers.

The reference delegates its query surface to ClickHouse
(`/root/reference/src/main.rs:56-161`); full-text retrieval there is the
`tokenbf` skip-index + `hasToken` path.  Here the retrieval stack is built
from first principles as declarative Spark, completing the similarity
story: vector ANN (llm_similarity.py / operators/ivf.py) covers the dense
side, these cover the sparse/lexical side, and RRF fuses the two — the
standard hybrid-retrieval recipe for RAG corpora.

Determinism: token counts, document lengths, and ranks are exact integers.
BM25's float math runs on those integers through IDENTICAL expression trees
in Spark and DuckDB (k1/b embedded as literals both engines parse to the
same doubles); distinct (tf, dl, df) inputs yield score gaps orders of
magnitude above any last-ulp libm divergence, and exact ties produce
bit-identical doubles tie-broken by doc_id.  Output scores are rounded.

Scale: the BM25 scorer is ONE map-only pass over documents (per-term tf via
`filter()` on the token array — no explode, no join) + a single-row global
aggregate broadcast back; top-k compiles to TakeOrderedAndProject.  The
inverted index shuffles once on the term.  At 100 TB the per-term posting
lists are the only large state, and they partition by term hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chainhouse_spark.functions.vector import cosine_prenorm_sql, norm_sql
from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table

_QUERY_TERMS = ["spark", "table", "hash"]
_K1 = 1.2
_B = 0.75
_TOPK = 10


# --------------------------------------------------------------------------
# Inverted index build
# --------------------------------------------------------------------------

@register(
    "search_inverted_index",
    oracle="""
    WITH tf AS (
        SELECT term, doc_id, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM documents)
        GROUP BY term, doc_id
    )
    SELECT term,
           COUNT(*) AS df,
           CAST(SUM(tf) AS BIGINT) AS cf,
           array_to_string(
               (list(concat(doc_id, ':', tf) ORDER BY -tf, doc_id))[1:3],
               ',') AS top_postings
    FROM tf GROUP BY term
    """,
)
def search_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """term -> (document frequency, collection frequency, top-3 postings by
    tf).  Tokenize+count is map-side; the single shuffle is the term-keyed
    aggregate whose value state is the bounded top-3 posting prefix plus two
    counters (full posting lists would partition by term hash at scale)."""
    d = load_table(spark, sf_dir, "documents")
    tf = (
        d.select(
            "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
        )
        .groupBy("term", "doc_id")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    posting = F.struct(
        (-F.col("tf")).alias("s"),
        F.col("doc_id").alias("d"),
        F.concat_ws(":", F.col("doc_id"), F.col("tf")).alias("p"),
    )
    return (
        tf.groupBy("term")
        .agg(
            F.count(F.lit(1)).alias("df"),
            F.sum("tf").alias("cf"),
            F.concat_ws(
                ",",
                F.transform(
                    F.slice(F.array_sort(F.collect_list(posting)), 1, 3),
                    lambda x: x["p"],
                ),
            ).alias("top_postings"),
        )
    )


# --------------------------------------------------------------------------
# Okapi BM25 top-k
# --------------------------------------------------------------------------

def _bm25_stats_sql(split_fn: str) -> str:
    """Per-doc token stats: dl + per-query-term tf, engine-portable."""
    tfs = ", ".join(
        f"len(list_filter({split_fn}, x -> x = '{t}')) AS tf_{t}"
        for t in _QUERY_TERMS
    )
    return f"SELECT doc_id, len({split_fn}) AS dl, {tfs} FROM documents"


def _bm25_score_sql() -> str:
    """Σ_t idf_t · tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl)) — term order fixed."""
    terms = []
    for t in _QUERY_TERMS:
        idf = f"ln((n - df_{t} + 0.5) / (df_{t} + 0.5) + 1.0)"
        terms.append(
            f"({idf} * (tf_{t} * ({_K1} + 1.0)) /"
            f" (tf_{t} + {_K1} * (1.0 - {_B} + {_B} * dl / avgdl)))"
        )
    return " + ".join(terms)


_BM25_GLOBALS = (
    "SELECT COUNT(*) AS n, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl, "
    + ", ".join(
        f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
        for t in _QUERY_TERMS
    )
    + " FROM stats"
)


@register(
    "search_bm25_topk",
    oracle=f"""
    WITH stats AS ({_bm25_stats_sql("string_split(text, ' ')")}),
    g AS ({_BM25_GLOBALS})
    SELECT doc_id, ROUND({_bm25_score_sql()}, 6) AS score
    FROM stats, g
    WHERE {" + ".join(f"tf_{t}" for t in _QUERY_TERMS)} > 0
    ORDER BY {_bm25_score_sql()} DESC, doc_id
    LIMIT {_TOPK}
    """,
)
def search_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 for the fixed query terms (spark, table, hash).

    Shape: per-term tf comes from ``filter()`` over the token array — the
    whole scorer is one map-only scan (NO explode, NO per-term join), plus
    a single-row global aggregate (N, avgdl, df per term) broadcast back
    via crossJoin, then TakeOrderedAndProject for the top-k."""
    d = load_table(spark, sf_dir, "documents")
    stats = d.selectExpr(
        "doc_id",
        "size(split(text, ' ')) AS dl",
        *[
            f"size(filter(split(text, ' '), x -> x = '{t}')) AS tf_{t}"
            for t in _QUERY_TERMS
        ],
    )
    g = stats.selectExpr(
        "COUNT(*) AS n",
        "CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl",
        *[
            f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
            for t in _QUERY_TERMS
        ],
    )
    score = _bm25_score_sql()
    return (
        stats.crossJoin(F.broadcast(g))
        .filter(F.expr(" + ".join(f"tf_{t}" for t in _QUERY_TERMS)) > 0)
        .select(
            "doc_id",
            F.round(F.expr(score), 6).alias("score"),
            F.expr(score).alias("__raw"),
        )
        .orderBy(F.desc("__raw"), F.asc("doc_id"))
        .limit(_TOPK)
        .drop("__raw")
    )


# --------------------------------------------------------------------------
# Hybrid retrieval: reciprocal-rank fusion of BM25 and cosine rankers
# --------------------------------------------------------------------------

_RRF_K = 60


@register(
    "search_hybrid_rrf",
    oracle=f"""
    WITH stats AS ({_bm25_stats_sql("string_split(text, ' ')")}),
    g AS ({_BM25_GLOBALS}),
    lex AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (
                   ORDER BY {_bm25_score_sql()} DESC, doc_id
               ) AS lex_rank
        FROM stats, g
    ),
    q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    idx AS (SELECT UNNEST(range(1, 65)) AS i),
    sims AS (
        SELECT c.vec_id AS doc_id,
               SUM(CAST(q.embedding[idx.i] AS DOUBLE)
                   * CAST(c.embedding[idx.i] AS DOUBLE) ORDER BY idx.i)
               / (sqrt(SUM(CAST(q.embedding[idx.i] AS DOUBLE)
                           * CAST(q.embedding[idx.i] AS DOUBLE) ORDER BY idx.i))
                  * sqrt(SUM(CAST(c.embedding[idx.i] AS DOUBLE)
                             * CAST(c.embedding[idx.i] AS DOUBLE) ORDER BY idx.i)))
                 AS cos_sim
        FROM embeddings c, q, idx
        GROUP BY c.vec_id
    ),
    vec AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS vec_rank
        FROM sims
    )
    SELECT lex.doc_id,
           CAST(lex_rank AS INT) AS lex_rank,
           CAST(vec_rank AS INT) AS vec_rank,
           ROUND(1.0 / ({_RRF_K} + lex_rank) + 1.0 / ({_RRF_K} + vec_rank), 6)
             AS rrf
    FROM lex JOIN vec ON lex.doc_id = vec.doc_id
    ORDER BY 1.0 / ({_RRF_K} + lex_rank) + 1.0 / ({_RRF_K} + vec_rank) DESC,
             lex.doc_id
    LIMIT {_TOPK}
    """,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: rank all docs by BM25 AND by cosine to the query
    embedding (vec_id 0; doc_id == vec_id), fuse with reciprocal-rank
    fusion 1/(60+r_lex) + 1/(60+r_vec), return the fused top-10.

    Ranks are exact integers (total order with doc_id tie-break), so the
    fusion sum is two fixed-order float terms — engine-exact.  Scale: both
    rankers are map-only scoring passes + one DISTRIBUTED exact rank each
    (operators/ranking.py: range-partition + per-partition offsets — the
    round-5 audit flagged the previous unpartitioned rank windows as
    single-task at 100×); the fuse is an equi-join on doc_id of two
    |corpus|-row rank tables."""
    from chainhouse_spark.operators.ranking import global_row_number

    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    stats = d.selectExpr(
        "doc_id",
        "size(split(text, ' ')) AS dl",
        *[
            f"size(filter(split(text, ' '), x -> x = '{t}')) AS tf_{t}"
            for t in _QUERY_TERMS
        ],
    )
    g = stats.selectExpr(
        "COUNT(*) AS n",
        "CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl",
        *[
            f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
            for t in _QUERY_TERMS
        ],
    )
    # materialize_input (round-12 W9): both scoring passes are MAP-ONLY
    # (scan + in-row folds + a reused broadcast), so without it the
    # range-sampling job re-runs the whole tokenize/cosine pass per rank
    # call — measured −6% at sf0.1, one full scan+score pass saved per
    # call at scale.
    lex = global_row_number(
        stats.crossJoin(F.broadcast(g)).select(
            "doc_id", F.expr(_bm25_score_sql()).alias("score")
        ),
        [F.desc("score"), F.asc("doc_id")],
        "lex_rank",
        materialize_input=True,
    ).select("doc_id", "lex_rank")
    # The query norm is evaluated once on the 1-row broadcast side and the
    # candidate norm once per corpus row (bit-identical to the per-pair
    # form — functions/vector.py::cosine_prenorm_sql), so the scoring pass
    # runs 1 fold per row instead of 3.
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_vec"),
        F.expr(norm_sql("embedding")).alias("qn"),
    )
    sims = (
        emb.select(
            F.col("vec_id").alias("doc_id"),
            F.col("embedding").alias("c_vec"),
            F.expr(norm_sql("embedding")).alias("cn"),
        )
        .crossJoin(F.broadcast(q))
        .select(
            "doc_id",
            F.expr(cosine_prenorm_sql("q_vec", "c_vec", "qn", "cn")).alias(
                "cos_sim"
            ),
        )
    )
    vec = global_row_number(
        sims,
        [F.desc("cos_sim"), F.asc("doc_id")],
        "vec_rank",
        materialize_input=True,
    ).select("doc_id", "vec_rank")
    rrf = 1.0 / (F.lit(_RRF_K) + F.col("lex_rank")) + 1.0 / (
        F.lit(_RRF_K) + F.col("vec_rank")
    )
    return (
        lex.join(vec, "doc_id")
        .select(
            "doc_id",
            F.col("lex_rank").cast("int").alias("lex_rank"),
            F.col("vec_rank").cast("int").alias("vec_rank"),
            F.round(rrf, 6).alias("rrf"),
            rrf.alias("__raw"),
        )
        .orderBy(F.desc("__raw"), F.asc("doc_id"))
        .limit(_TOPK)
        .drop("__raw")
    )


@register(
    "search_phrase_match",
    oracle="""
    WITH tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    pos AS (
        SELECT doc_id, i.i AS pos, t[i.i] AS term
        FROM tok, LATERAL (SELECT UNNEST(range(1, len(t) + 1)) AS i) i
    )
    SELECT a.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences,
           CAST(MIN(a.pos) AS BIGINT) AS first_pos
    FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
    WHERE a.term = 'table' AND b.term = 'hash'
    GROUP BY a.doc_id
    """,
)
def search_phrase_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase search ("table hash") via the POSITIONAL inverted
    index: each phrase term's postings carry (doc, position), and the
    phrase matches where consecutive terms' postings join on (doc,
    pos + 1) — the classic IR positional-postings algorithm, the lexical
    exact-match step BM25's bag-of-words scoring cannot express.

    Scale: postings are filtered to the PHRASE'S OWN TERMS before the join
    (term-selective pushdown — the corpus-sized positional index never
    joins against itself), so the join input is the two terms' posting
    lists, equi-keyed on (doc_id, pos). N-word phrases chain N-1 such
    joins, each narrowing the candidate set.
    """
    d = load_table(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id", F.posexplode(F.split("text", " ")).alias("pos0", "term")
    ).select("doc_id", (F.col("pos0") + 1).alias("pos"), "term")
    a = pos.filter(F.col("term") == "table").alias("a")
    b = pos.filter(F.col("term") == "hash").alias("b")
    return (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .groupBy(F.col("a.doc_id").alias("doc_id"))
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("a.pos").alias("first_pos"),
        )
    )


# --------------------------------------------------------------------------
# Hard-negative mining for contrastive retrieval training
# --------------------------------------------------------------------------

_HN_POS = 3       # top-ranked docs = positives
_HN_CAND = 20     # candidate pool = next _HN_CAND ranks
_HN_K = 10        # negatives kept
_HN_SIM = 0.5     # near-dup exclusion threshold (est Jaccard)


@register(
    "mine_hard_negatives",
    oracle=None,  # composed below after the CTE fragments import
)
def mine_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining, the data-prep step of contrastive retrieval
    training (e.g. DPR, Karpukhin et al. 2020): the BM25 top-3 docs are
    the positives; the next 20 ranks are the candidate pool ('close but
    not chosen' — the informative negatives); candidates that are MinHash
    near-duplicates (est Jaccard >= 0.5) of ANY positive are excluded
    (they are unlabeled positives, the classic false-negative trap); the
    first 10 survivors by rank are the negatives.

    Scale: the expensive parts are exactly the two already-bounded
    operators it composes — the map-only BM25 scorer with its top-k, and
    LSH signatures restricted by semi-join to the positive∪candidate set
    (3 + 20 docs), so the near-dup check is a tiny bucket join no matter
    the corpus size."""
    from chainhouse_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    d = load_table(spark, sf_dir, "documents")
    stats = d.selectExpr(
        "doc_id",
        "size(split(text, ' ')) AS dl",
        *[
            f"size(filter(split(text, ' '), x -> x = '{t}')) AS tf_{t}"
            for t in _QUERY_TERMS
        ],
    )
    g = stats.selectExpr(
        "COUNT(*) AS n",
        "CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl",
        *[
            f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
            for t in _QUERY_TERMS
        ],
    )
    score = _bm25_score_sql()
    ranked = (
        stats.crossJoin(F.broadcast(g))
        .filter(F.expr(" + ".join(f"tf_{t}" for t in _QUERY_TERMS)) > 0)
        .select("doc_id", F.expr(score).alias("__raw"))
        .orderBy(F.desc("__raw"), F.asc("doc_id"))
        .limit(_HN_POS + _HN_CAND)
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("__raw"), F.asc("doc_id")))
            .alias("bm25_rank"),
        )
    )
    pos = ranked.filter(F.col("bm25_rank") <= _HN_POS)
    cand = ranked.filter(F.col("bm25_rank") > _HN_POS)

    pool = d.join(
        F.broadcast(ranked.select("doc_id")), "doc_id", "left_semi"
    )
    sigs = minhash_signatures(pool, num_hashes=16, shingle_words=3)
    pairs = lsh_candidate_pairs(sigs, num_hashes=16, bands=4).filter(
        F.col("est_jaccard") >= _HN_SIM
    )
    # near-dup of a positive, in either pair orientation
    dup_of_pos = (
        pairs.join(
            F.broadcast(pos.select(F.col("doc_id").alias("doc_a"))), "doc_a", "left_semi"
        )
        .select(F.col("doc_b").alias("doc_id"))
        .unionAll(
            pairs.join(
                F.broadcast(pos.select(F.col("doc_id").alias("doc_b"))),
                "doc_b",
                "left_semi",
            ).select(F.col("doc_a").alias("doc_id"))
        )
        .distinct()
    )
    survivors = cand.join(F.broadcast(dup_of_pos), "doc_id", "left_anti")
    return (
        survivors.select(
            "doc_id",
            "bm25_rank",
            F.row_number()
            .over(Window.orderBy(F.asc("bm25_rank")))
            .alias("neg_rank"),
        )
        .filter(F.col("neg_rank") <= _HN_K)
        .orderBy("neg_rank")
    )


def _hard_negatives_oracle() -> str:
    from chainhouse_spark.queries.llm_dedup import _DUCK_MINHASH, _DUCK_SHINGLES

    return f"""
    WITH ranked AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS bm25_rank
        FROM (
            SELECT doc_id, {_bm25_score_sql()} AS score
            FROM ({_bm25_stats_sql("string_split(text, ' ')")}) stats,
                 ({_BM25_GLOBALS.replace("FROM stats",
                     "FROM (" + _bm25_stats_sql("string_split(text, ' ')") + ") stats")}) g
            WHERE {" + ".join(f"tf_{t}" for t in _QUERY_TERMS)} > 0
        )
        ORDER BY bm25_rank LIMIT {_HN_POS + _HN_CAND}
    ),
    {_DUCK_SHINGLES.strip().lstrip()},
    {_DUCK_MINHASH.strip()},
    sim AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(SUM(CASE WHEN a.h = b.h THEN 1 ELSE 0 END) AS DOUBLE) / 16
                   AS est
        FROM mh a JOIN mh b ON a.s = b.s AND a.doc_id < b.doc_id
        WHERE a.doc_id IN (SELECT doc_id FROM ranked)
          AND b.doc_id IN (SELECT doc_id FROM ranked)
        GROUP BY a.doc_id, b.doc_id
    ),
    dup_of_pos AS (
        SELECT s.doc_b AS doc_id FROM sim s
        JOIN ranked p ON p.doc_id = s.doc_a AND p.bm25_rank <= {_HN_POS}
        WHERE s.est >= {_HN_SIM}
        UNION
        SELECT s.doc_a FROM sim s
        JOIN ranked p ON p.doc_id = s.doc_b AND p.bm25_rank <= {_HN_POS}
        WHERE s.est >= {_HN_SIM}
    )
    SELECT doc_id, CAST(bm25_rank AS BIGINT) AS bm25_rank,
           CAST(ROW_NUMBER() OVER (ORDER BY bm25_rank) AS BIGINT) AS neg_rank
    FROM ranked
    WHERE bm25_rank > {_HN_POS}
      AND doc_id NOT IN (SELECT doc_id FROM dup_of_pos)
    ORDER BY neg_rank LIMIT {_HN_K}
    """


from chainhouse_spark.queries.registry import ORACLES as _SEARCH_ORACLES  # noqa: E402

_SEARCH_ORACLES["mine_hard_negatives"] = _hard_negatives_oracle()


_NDCG_TERM = "CAST(ROUND(1.0 / log2({r} + 1.0), 9) AS DECIMAL(12,9))"


@register(
    "eval_retrieval_ndcg",
    oracle=f"""
    WITH dots AS (
        SELECT q.vec_id AS query_id, q.label AS q_label,
               c.vec_id AS cand_id, c.label AS c_label,
               SUM(CAST(q.embedding[i.i] AS DOUBLE)
                   * CAST(c.embedding[i.i] AS DOUBLE) ORDER BY i.i) AS dot,
               SUM(CAST(q.embedding[i.i] AS DOUBLE)
                   * CAST(q.embedding[i.i] AS DOUBLE) ORDER BY i.i) AS qq,
               SUM(CAST(c.embedding[i.i] AS DOUBLE)
                   * CAST(c.embedding[i.i] AS DOUBLE) ORDER BY i.i) AS cc
        FROM embeddings q, embeddings c,
             (SELECT UNNEST(range(1, 65)) AS i) i
        WHERE q.vec_id < 8 AND c.vec_id >= 8
        GROUP BY 1, 2, 3, 4
    ),
    ranked AS (
        SELECT query_id, q_label, cand_id,
               CASE WHEN c_label = q_label THEN 1 ELSE 0 END AS rel,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, cand_id
               ) AS rank
        FROM dots
    ),
    n_rel AS (
        SELECT q.vec_id AS query_id,
               CAST(COUNT(*) FILTER (WHERE c.label = q.label) AS BIGINT)
                 AS n_rel_corpus
        FROM embeddings q, embeddings c
        WHERE q.vec_id < 8 AND c.vec_id >= 8
        GROUP BY 1
    ),
    top AS (
        SELECT query_id,
               CAST(SUM(rel) AS BIGINT) AS hits_at_10,
               CAST(SUM(rel) AS DOUBLE) / 10.0 AS precision_at_10,
               (ROUND((COALESCE(1.0 / MIN(CASE WHEN rel = 1 THEN rank END), 0.0)
                 ) * 1e9) / 1e9 + 0.0) AS mrr_at_10,
               CAST(COALESCE(SUM(CASE WHEN rel = 1
                   THEN {_NDCG_TERM.format(r='rank')} END), 0) AS DECIMAL(20,9))
                 AS dcg
        FROM ranked WHERE rank <= 10 GROUP BY query_id
    ),
    ideal AS (
        SELECT n.query_id, n.n_rel_corpus,
               CAST(COALESCE((
                   SELECT SUM({_NDCG_TERM.format(r='t.i')})
                   FROM UNNEST(range(1, CAST(LEAST(10, n.n_rel_corpus) AS BIGINT) + 1)) t(i)
               ), 0) AS DECIMAL(20,9)) AS idcg
        FROM n_rel n
    )
    SELECT t.query_id, i.n_rel_corpus, t.hits_at_10, t.precision_at_10,
           t.mrr_at_10,
           (ROUND((CASE WHEN i.idcg > 0
                THEN CAST(t.dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE)
                ELSE 0.0 END) * 1e9) / 1e9 + 0.0) AS ndcg_at_10
    FROM top t JOIN ideal i ON t.query_id = i.query_id
    """,
)
def eval_retrieval_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retrieval-quality evaluation of the exact cosine ranker: Precision@10,
    MRR@10, and nDCG@10 per query (8 held-out query vectors vs the rest of
    the corpus; relevance = label match — the standard eval harness any
    retrieval stack needs next to its rankers). Each DCG/IDCG term
    1/log2(rank+1) is rounded to 9 decimals then DECIMAL-summed so
    cross-engine float summation order can't move the metric; the only
    remaining float ops are fixed single divisions. Ranks use the ordered
    cosine fold (bit-identical across engines). Scale: scoring is the same
    broadcast map-only pass as `ann_bruteforce_topk`; everything after the
    per-query top-10 window (partitioned by query) touches <= 10 rows per
    query."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    corpus = emb.filter(F.col("vec_id") >= 8)
    from chainhouse_spark.operators.similarity import brute_force_topk

    top10 = brute_force_topk(corpus, queries, k=10)
    labels_q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    labels_c = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("label").alias("c_label")
    )
    ranked = (
        top10.join(F.broadcast(labels_q), "query_id")
        .join(labels_c, "cand_id")
        .select(
            "query_id",
            (F.col("c_label") == F.col("q_label")).cast("int").alias("rel"),
            "rank",
        )
    )
    n_rel = (
        corpus.select(F.col("label").alias("c_label"))
        .crossJoin(F.broadcast(labels_q))
        .groupBy("query_id")
        .agg(
            F.sum((F.col("c_label") == F.col("q_label")).cast("int"))
            .cast("bigint")
            .alias("n_rel_corpus")
        )
    )
    dcg_term = _NDCG_TERM.format(r="rank")
    top = ranked.groupBy("query_id").agg(
        F.sum("rel").cast("bigint").alias("hits_at_10"),
        F.expr("CAST(SUM(rel) AS DOUBLE) / 10.0").alias("precision_at_10"),
        F.expr(
            # CAST to DOUBLE: Spark parses the bare 1.0 literal as DECIMAL
            # and would emit a DECIMAL ratio where the oracle emits DOUBLE.
            "(ROUND((COALESCE(CAST(1.0 AS DOUBLE) / MIN(CASE WHEN rel = 1 THEN rank END),"
            " CAST(0.0 AS DOUBLE))) * 1e9) / 1e9 + 0.0)"
        ).alias("mrr_at_10"),
        F.expr(
            f"CAST(COALESCE(SUM(CASE WHEN rel = 1 THEN {dcg_term} END), 0)"
            " AS DECIMAL(20,9))"
        ).alias("dcg"),
    )
    ideal_term = _NDCG_TERM.format(r="t")
    ideal = n_rel.select(
        "query_id",
        "n_rel_corpus",
        F.expr(
            # sequence(1, 0) would REVERSE into a descending array — guard
            # the n_rel = 0 case explicitly.
            "CAST(CASE WHEN n_rel_corpus = 0 THEN 0 ELSE"
            " aggregate(sequence(1, CAST(LEAST(10, n_rel_corpus) AS INT)),"
            f" CAST(0 AS DECIMAL(20,9)),"
            f" (acc, t) -> CAST(acc + {ideal_term} AS DECIMAL(20,9)))"
            " END AS DECIMAL(20,9))"
        ).alias("idcg"),
    )
    return top.join(F.broadcast(ideal), "query_id").select(
        "query_id",
        "n_rel_corpus",
        "hits_at_10",
        "precision_at_10",
        "mrr_at_10",
        F.expr(
            "(ROUND((CASE WHEN idcg > 0 THEN CAST(dcg AS DOUBLE) / CAST(idcg AS DOUBLE)"
            " ELSE 0.0 END) * 1e9) / 1e9 + 0.0)"
        ).alias("ndcg_at_10"),
    )


@register(
    "eval_ranker_agreement",
    oracle=f"""
    WITH stats AS ({_bm25_stats_sql("string_split(text, ' ')")}),
    g AS ({_BM25_GLOBALS}),
    lex AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (
                   ORDER BY {_bm25_score_sql()} DESC, doc_id
               ) AS lex_rank
        FROM stats, g
    ),
    q AS (SELECT embedding FROM embeddings WHERE vec_id = 0),
    idx AS (SELECT UNNEST(range(1, 65)) AS i),
    sims AS (
        SELECT c.vec_id AS doc_id,
               SUM(CAST(q.embedding[idx.i] AS DOUBLE)
                   * CAST(c.embedding[idx.i] AS DOUBLE) ORDER BY idx.i)
               / (sqrt(SUM(CAST(q.embedding[idx.i] AS DOUBLE)
                           * CAST(q.embedding[idx.i] AS DOUBLE) ORDER BY idx.i))
                  * sqrt(SUM(CAST(c.embedding[idx.i] AS DOUBLE)
                             * CAST(c.embedding[idx.i] AS DOUBLE) ORDER BY idx.i)))
                 AS cos_sim
        FROM embeddings c, q, idx
        GROUP BY c.vec_id
    ),
    vec AS (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY cos_sim DESC, doc_id) AS vec_rank
        FROM sims
    ),
    top AS (
        SELECT lex.doc_id, lex_rank, vec_rank
        FROM lex JOIN vec ON lex.doc_id = vec.doc_id
        WHERE lex_rank <= 10
    ),
    pairs AS (
        SELECT CASE WHEN (a.lex_rank - b.lex_rank)
                         * (a.vec_rank - b.vec_rank) > 0
                    THEN 1 ELSE 0 END AS conc
        FROM top a JOIN top b ON a.doc_id < b.doc_id
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(conc) AS BIGINT) AS concordant,
           CAST(COUNT(*) - SUM(conc) AS BIGINT) AS discordant,
           ROUND((2.0 * SUM(conc) - COUNT(*)) / COUNT(*), 9) AS kendall_tau
    FROM pairs
    """,
)
def eval_ranker_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau between the lexical (BM25) and vector rankers over the
    lexical top-10 — the ranker-agreement diagnostic behind hybrid-search
    tuning (tau near 1: the dense ranker adds nothing; near -1: the two
    disagree so fusion is load-bearing; search_hybrid_rrf is the consumer
    of this diagnosis). Both global ranks run distributed
    (operators/ranking.py); the pair enumeration is a self-join of a
    10-row set (45 pairs — bounded by construction, never the corpus).
    Ranks are exact integers, so concordance and tau are exact."""
    from chainhouse_spark.operators.ranking import global_row_number

    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    stats = d.selectExpr(
        "doc_id",
        "size(split(text, ' ')) AS dl",
        *[
            f"size(filter(split(text, ' '), x -> x = '{t}')) AS tf_{t}"
            for t in _QUERY_TERMS
        ],
    )
    g = stats.selectExpr(
        "COUNT(*) AS n",
        "CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl",
        *[
            f"SUM(CASE WHEN tf_{t} > 0 THEN 1 ELSE 0 END) AS df_{t}"
            for t in _QUERY_TERMS
        ],
    )
    # materialize_input: same map-only scoring passes as search_hybrid_rrf
    # (round-12 W9) — the range-sampling job would re-run them otherwise.
    lex = global_row_number(
        stats.crossJoin(F.broadcast(g)).select(
            "doc_id", F.expr(_bm25_score_sql()).alias("score")
        ),
        [F.desc("score"), F.asc("doc_id")],
        "lex_rank",
        materialize_input=True,
    ).select("doc_id", "lex_rank")
    # The query norm is evaluated once on the 1-row broadcast side and the
    # candidate norm once per corpus row (bit-identical to the per-pair
    # form — functions/vector.py::cosine_prenorm_sql), so the scoring pass
    # runs 1 fold per row instead of 3.
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_vec"),
        F.expr(norm_sql("embedding")).alias("qn"),
    )
    sims = (
        emb.select(
            F.col("vec_id").alias("doc_id"),
            F.col("embedding").alias("c_vec"),
            F.expr(norm_sql("embedding")).alias("cn"),
        )
        .crossJoin(F.broadcast(q))
        .select(
            "doc_id",
            F.expr(cosine_prenorm_sql("q_vec", "c_vec", "qn", "cn")).alias(
                "cos_sim"
            ),
        )
    )
    vec = global_row_number(
        sims,
        [F.desc("cos_sim"), F.asc("doc_id")],
        "vec_rank",
        materialize_input=True,
    ).select("doc_id", "vec_rank")
    top = (
        lex.join(vec, "doc_id")
        .filter(F.col("lex_rank") <= 10)
        .localCheckpoint(eager=False)
    )
    a, b = top.alias("a"), top.alias("b")
    # broadcast the 10-row side: the inequality pair join compiles to a
    # bounded BroadcastNestedLoopJoin instead of a CartesianProduct
    pairs = a.join(F.broadcast(b), F.col("a.doc_id") < F.col("b.doc_id")).select(
        F.when(
            (F.col("a.lex_rank") - F.col("b.lex_rank"))
            * (F.col("a.vec_rank") - F.col("b.vec_rank"))
            > 0,
            1,
        )
        .otherwise(0)
        .alias("conc")
    )
    return pairs.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
        F.sum("conc").cast("bigint").alias("concordant"),
        (F.count(F.lit(1)) - F.sum("conc")).cast("bigint").alias("discordant"),
        F.round(
            (2.0 * F.sum("conc") - F.count(F.lit(1))) / F.count(F.lit(1)), 9
        ).alias("kendall_tau"),
    )


# Precision-at-k term for MAP, product-space-rounded (the repo round-at-9
# scheme) then DECIMAL-summed so cross-engine float order can't move AP.
_AP_TERM = (
    "CAST((ROUND((CAST({h} AS DOUBLE) / {r}) * 1e9) / 1e9 + 0.0)"
    " AS DECIMAL(12,9))"
)


@register(
    "eval_retrieval_map",
    oracle=f"""
    WITH dots AS (
        SELECT q.vec_id AS query_id, q.label AS q_label,
               c.vec_id AS cand_id, c.label AS c_label,
               SUM(CAST(q.embedding[i.i] AS DOUBLE)
                   * CAST(c.embedding[i.i] AS DOUBLE) ORDER BY i.i) AS dot,
               SUM(CAST(q.embedding[i.i] AS DOUBLE)
                   * CAST(q.embedding[i.i] AS DOUBLE) ORDER BY i.i) AS qq,
               SUM(CAST(c.embedding[i.i] AS DOUBLE)
                   * CAST(c.embedding[i.i] AS DOUBLE) ORDER BY i.i) AS cc
        FROM embeddings q, embeddings c,
             (SELECT UNNEST(range(1, 65)) AS i) i
        WHERE q.vec_id < 8 AND c.vec_id >= 8
        GROUP BY 1, 2, 3, 4
    ),
    ranked AS (
        SELECT query_id, q_label, cand_id,
               CASE WHEN c_label = q_label THEN 1 ELSE 0 END AS rel,
               ROW_NUMBER() OVER (
                   PARTITION BY query_id
                   ORDER BY dot / (sqrt(qq) * sqrt(cc)) DESC, cand_id
               ) AS rank
        FROM dots
    ),
    hits AS (
        SELECT query_id, rel, rank,
               SUM(rel) OVER (
                   PARTITION BY query_id ORDER BY rank
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS h
        FROM ranked WHERE rank <= 10
    ),
    n_rel AS (
        SELECT q.vec_id AS query_id,
               CAST(COUNT(*) FILTER (WHERE c.label = q.label) AS BIGINT)
                 AS n_rel_corpus
        FROM embeddings q, embeddings c
        WHERE q.vec_id < 8 AND c.vec_id >= 8
        GROUP BY 1
    ),
    top AS (
        SELECT query_id,
               CAST(SUM(rel) AS BIGINT) AS hits_at_10,
               CAST(COALESCE(SUM(CASE WHEN rel = 1
                   THEN {_AP_TERM.format(h='h', r='rank')} END), 0)
                 AS DECIMAL(20,9)) AS ap_num
        FROM hits GROUP BY query_id
    )
    SELECT t.query_id, n.n_rel_corpus, t.hits_at_10,
           (ROUND((CAST(t.hits_at_10 AS DOUBLE) / n.n_rel_corpus) * 1e9)
             / 1e9 + 0.0) AS recall_at_10,
           (ROUND((CAST(t.ap_num AS DOUBLE)
                   / LEAST(10, n.n_rel_corpus)) * 1e9) / 1e9 + 0.0)
             AS ap_at_10
    FROM top t JOIN n_rel n ON t.query_id = n.query_id
    """,
)
def eval_retrieval_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-average-precision eval of the exact cosine ranker: Recall@10
    and AP@10 per query — the order-sensitive retrieval metric next to
    eval_retrieval_ndcg's graded-gain view (AP integrates precision at
    each relevant hit, so early misses cost quadratically). Running hit
    counts are exact integers from a per-query window (<= 10 rows per
    query); each precision term h/k is product-space-rounded at 9 digits
    and DECIMAL-summed, and AP divides by min(10, |relevant|) — the only
    float ops are fixed single divisions on aggregate rows. Scale: the
    scoring pass is the same broadcast map-only cosine as
    ann_bruteforce_topk; everything after the per-query top-10 touches
    <= 10 rows per query."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 8)
    corpus = emb.filter(F.col("vec_id") >= 8)
    from chainhouse_spark.operators.similarity import brute_force_topk

    top10 = brute_force_topk(corpus, queries, k=10)
    labels_q = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    labels_c = emb.select(
        F.col("vec_id").alias("cand_id"), F.col("label").alias("c_label")
    )
    ranked = (
        top10.join(F.broadcast(labels_q), "query_id")
        .join(labels_c, "cand_id")
        .select(
            "query_id",
            (F.col("c_label") == F.col("q_label")).cast("int").alias("rel"),
            "rank",
        )
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy("rank")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    hits = ranked.withColumn("h", F.sum("rel").over(w))
    top = hits.groupBy("query_id").agg(
        F.sum("rel").cast("bigint").alias("hits_at_10"),
        F.expr(
            "CAST(COALESCE(SUM(CASE WHEN rel = 1 THEN "
            + _AP_TERM.format(h="h", r="rank")
            + " END), 0) AS DECIMAL(20,9))"
        ).alias("ap_num"),
    )
    n_rel = (
        corpus.select(F.col("label").alias("c_label"))
        .crossJoin(F.broadcast(labels_q))
        .groupBy("query_id")
        .agg(
            F.sum((F.col("c_label") == F.col("q_label")).cast("int"))
            .cast("bigint")
            .alias("n_rel_corpus")
        )
    )
    return top.join(F.broadcast(n_rel), "query_id").selectExpr(
        "query_id",
        "n_rel_corpus",
        "hits_at_10",
        "(ROUND((CAST(hits_at_10 AS DOUBLE) / n_rel_corpus) * 1e9)"
        " / 1e9 + 0.0) AS recall_at_10",
        "(ROUND((CAST(ap_num AS DOUBLE) / LEAST(10, n_rel_corpus)) * 1e9)"
        " / 1e9 + 0.0) AS ap_at_10",
    )
