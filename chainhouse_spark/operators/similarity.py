"""Similarity search over embedding columns.

- brute_force_topk: exact cosine top-k of every query vector against the
  corpus — broadcast the (small) query set, per-partition scoring, global
  top-k via window rank. The correctness baseline.
- lsh_topk: sign-bit LSH bucketing; queries only score candidates in their
  bucket — the scale path (bucket count grows 2^nbits; each probe touches
  ~corpus/2^nbits vectors). Recall < 1 by construction; measured against
  the brute-force baseline in tests.
- embedding_near_pairs: all near-duplicate pairs above a cosine threshold,
  blocked by a partition key (here: label) so the pair space never goes
  quadratic in the corpus.

Cosine is the ordered-fold expression from functions.vector — bit-exact
and DuckDB-oracle-able (see that module's docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chainhouse_spark.functions.vector import (
    cosine_prenorm_sql,
    norm_sql,
    sign_bucket,
)
from chainhouse_spark.operators.partitioning import spread


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact top-k neighbors by cosine for each query vector.

    The query side is broadcast (queries ≪ corpus always); scoring is a
    map-only pass over the corpus; ranking is one shuffle on query_id.
    """
    # Norms are evaluated once per ROW on each side before the pair join
    # (bit-identical to the per-pair form — see cosine_prenorm_sql).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.expr(norm_sql(vec_col)).alias("qn"),
    )
    c = spread(corpus, id_col).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        F.expr(norm_sql(vec_col)).alias("cn"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.expr(cosine_prenorm_sql("q_vec", "c_vec", "qn", "cn")).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nbits: int = 8,
) -> DataFrame:
    """Approximate top-k: only candidates sharing the query's sign-bit LSH
    bucket are scored. Same output shape as brute_force_topk."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.expr(norm_sql(vec_col)).alias("qn"),
        sign_bucket(vec_col, nbits).alias("bucket"),
    )
    c = spread(corpus, id_col).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        F.expr(norm_sql(vec_col)).alias("cn"),
        sign_bucket(vec_col, nbits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.expr(cosine_prenorm_sql("q_vec", "c_vec", "qn", "cn")).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def embedding_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "label",
    threshold: float = 0.35,
    salt: int = 8,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within blocking groups.

    Blocking keeps the pair space linear-ish; at 100 TB the block key would
    be an LSH bucket (see lsh_topk) rather than a label.

    The block key is low-cardinality by design, which would cap the join at
    |blocks| parallel tasks — so the left side is salted by id and the right
    side replicated over the salt range: every pair still meets exactly once
    (on the left row's salt), but the shuffle spreads over |blocks| × salt
    partitions. Replication only multiplies the small in-block data."""
    a = spread(df, id_col).select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("va"),
        F.expr(norm_sql(vec_col)).alias("na"),
        (F.col(id_col) % salt).alias("salt"),
    )
    b = df.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("vb"),
        F.expr(norm_sql(vec_col)).alias("nb"),
    ).withColumn("salt", F.explode(F.expr(f"sequence(0, {salt - 1})")))
    # Round-12 W12: the threshold is applied via explode(filter(array(
    # cos), ...)) instead of .filter() on the projected cos_sim. The
    # filter form let the optimizer pull the cosine into the JOIN
    # CONDITION and keep a second copy in the output Project (2 dot
    # folds per candidate), and its null-intolerant division made
    # InferFiltersFromConstraints add isnotnull(<norm fold>) below each
    # side's projection (2 norm folds per input ROW). Generate evaluates
    # the cosine exactly once per candidate and the sides' norms once
    # per row; a NULL cosine (zero-norm vectors) is dropped by filter()
    # exactly as the >= comparison dropped it. Plan facts: SQRT norm
    # folds 6 -> 2 (0 left in Filters), pair dot folds 2 -> 1; rows
    # identical (see tests/test_round12_opt.py).
    cos = cosine_prenorm_sql("va", "vb", "na", "nb")
    return (
        a.join(b, ["blk", "salt"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select(
            "blk",
            "vec_a",
            "vec_b",
            F.explode(
                F.expr(
                    f"filter(array({cos}), c -> c >= CAST({threshold!r} AS DOUBLE))"
                )
            ).alias("cos_sim"),
        )
    )


def embedding_cross_pairs(
    left: DataFrame,
    right: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str = "cell",
    threshold: float = 0.3,
    salt: int = 8,
) -> DataFrame:
    """All (left, right) CROSS-set pairs sharing a blocking key with cosine
    >= threshold — the decontamination shape: left is the LARGE side (the
    training corpus), right the small one (the eval set), and only
    left-vs-right pairs are ever scored (a self-pair generator over the
    union would spend almost all its cosine budget on left-vs-left pairs,
    the dominant quadratic term when left ≫ right).

    Same skew discipline as embedding_near_pairs: the block key is
    low-cardinality, so the big side is salted by id and the small side
    replicated over the salt range — each pair meets exactly once (on the
    left row's salt) and the one shuffle spreads over |blocks| × salt
    partitions. Replication multiplies only the small side.

    Output: (blk, left_id, right_id, cos_sim), cos_sim already >= threshold.
    """
    a = spread(left, id_col).select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("left_id"),
        F.col(vec_col).alias("va"),
        F.expr(norm_sql(vec_col)).alias("na"),
        (F.col(id_col) % salt).alias("salt"),
    )
    b = right.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("right_id"),
        F.col(vec_col).alias("vb"),
        F.expr(norm_sql(vec_col)).alias("nb"),
    ).withColumn("salt", F.explode(F.expr(f"sequence(0, {salt - 1})")))
    # Round-12 W12: same single-evaluation form as embedding_near_pairs —
    # see the comment there (threshold out of the join condition, norms
    # once per row, cosine once per candidate).
    cos = cosine_prenorm_sql("va", "vb", "na", "nb")
    return (
        a.join(b, ["blk", "salt"])
        .select(
            "blk",
            "left_id",
            "right_id",
            F.explode(
                F.expr(
                    f"filter(array({cos}), c -> c >= CAST({threshold!r} AS DOUBLE))"
                )
            ).alias("cos_sim"),
        )
    )


def lsh_multiprobe_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    nbits: int = 8,
) -> DataFrame:
    """Multi-probe LSH top-k: each query probes its own bucket PLUS every
    1-bit-flip neighbor (nbits+1 probes). Sign-LSH's failure mode is a
    near-neighbor landing just across one hyperplane — exactly the buckets
    multi-probe visits — so recall rises steeply while cost stays
    (nbits+1)/2^nbits of the corpus per query, still an equality join.

    The probe expansion happens on the (broadcast) QUERY side only; the
    corpus is bucketed once and never replicated — the property that matters
    when the corpus is the 100 TB side.
    """
    probes = F.expr(
        f"explode(array_union(array(bucket), "
        f"transform(sequence(0, {nbits - 1}), i -> bucket ^ shiftleft(1, i))))"
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.expr(norm_sql(vec_col)).alias("qn"),
        sign_bucket(vec_col, nbits).alias("bucket"),
    ).select("query_id", "q_vec", "qn", probes.alias("bucket"))
    c = spread(corpus, id_col).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        F.expr(norm_sql(vec_col)).alias("cn"),
        sign_bucket(vec_col, nbits).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.expr(cosine_prenorm_sql("q_vec", "c_vec", "qn", "cn")).alias(
                "cos_sim"
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


MAX_GEMM_QUERIES = 100_000


def brute_force_topk_gemm(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    max_queries: int = MAX_GEMM_QUERIES,
) -> DataFrame:
    """BLAS path for exact cosine top-k: the query matrix is collected once
    (queries ≪ corpus, same contract as `brute_force_topk`), broadcast as a
    normalized numpy array, and each Arrow batch of corpus vectors scores
    against ALL queries with one float64 GEMM inside `mapInPandas` — then a
    per-partition top-k and the global k-row merge.

    Same answer as the SQL-aggregate form (modulo last-ulp float summation
    order — numpy reduces pairwise, the SQL fold is sequential), ~10-50×
    less per-pair overhead: one matrix multiply per batch instead of one
    higher-order-lambda evaluation per pair. This is the 100 TB shape for
    similarity scoring: corpus streams through a single Python stage in
    Arrow batches, compute is vendored to BLAS, and only |partitions|·k·|q|
    candidate rows reach the shuffle."""
    import numpy as np
    import pandas as pd

    # Driver-collect guard: the small-side contract (queries ≪ corpus) is
    # load-bearing — the query matrix lands on the driver and broadcasts to
    # every task. A mis-sized call must fail loudly, not OOM the driver:
    # limit(max_queries + 1) bounds the collect itself, so even a huge query
    # set costs one extra row — and the guard shares the one job with the
    # collect instead of executing the query lineage twice.
    q_rows = queries.select(id_col, vec_col).limit(max_queries + 1).collect()
    if len(q_rows) > max_queries:
        raise ValueError(
            f"brute_force_topk_gemm: query side exceeds {max_queries} rows — "
            "this operator collects+broadcasts the query matrix (small-side "
            "contract). Swap query/corpus sides, pre-partition the queries, "
            "or raise max_queries explicitly if the driver can hold them."
        )
    q_ids = np.array([r[0] for r in q_rows], dtype=np.int64)
    qm = np.array([r[1] for r in q_rows], dtype=np.float64)
    qm /= np.linalg.norm(qm, axis=1, keepdims=True)
    sc = corpus.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, qm))

    def score(batches):
        ids, mat = bq.value
        for pdf in batches:
            cv = np.array(list(pdf[vec_col]), dtype=np.float64)
            cv /= np.linalg.norm(cv, axis=1, keepdims=True)
            sims = cv @ mat.T  # (batch, n_queries)
            cand = pdf[id_col].to_numpy(dtype=np.int64)
            out_q, out_c, out_s = [], [], []
            for j in range(len(ids)):
                col = sims[:, j]
                mask = cand != ids[j]
                cc, ss = cand[mask], col[mask]
                if len(cc) > k:  # partial top-k per partition, then global merge
                    idx = np.argpartition(-ss, k)[: k]
                    cc, ss = cc[idx], ss[idx]
                out_q.extend([ids[j]] * len(cc))
                out_c.extend(cc.tolist())
                out_s.extend(ss.tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "cand_id": out_c, "cos_sim": out_s}
            )

    scored = spread(corpus, id_col).select(id_col, vec_col).mapInPandas(
        score, schema="query_id long, cand_id long, cos_sim double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )
