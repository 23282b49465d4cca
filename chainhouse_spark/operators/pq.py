"""Product quantization (PQ) approximate nearest neighbor.

The bandwidth path for similarity search at 100 TB: each D-dim float vector
is cut into `m` subvectors and every subvector is replaced by the id of its
nearest codeword from a per-subspace KMeans codebook — a D*4-byte embedding
becomes m single-byte codes (64x smaller at D=64, m=8, k<=256). Scoring a
query then reads CODES, not vectors: the asymmetric-distance computation
(ADC, Jegou et al. 2011, "Product quantization for nearest neighbor
search") sums dot(q_sub_j, codeword[j][code_j]) over subspaces, so the
corpus-sized scan and the rank shuffle carry bytes, not floats.

Spark mechanics (mirrors operators/ivf.py — no pyspark.ml anywhere):
  - Codebook fit is Lloyd's KMeans over ALL m subspaces in one job chain:
    the corpus explodes into (subspace, subvector) rows once, every
    iteration is one codegen-side argmin over the codebook plan-literal
    plus one (subspace, code, dim)-keyed partial-agg shuffle whose result
    (m x k x d_sub doubles) is all the driver ever sees.
  - Encoding and ADC scoring are map-only column expressions over the
    codebook literal (m*k*d_sub doubles — a few KiB shipped inside the
    plan; at k=256 use a broadcast variable instead).
  - The candidate rank shuffle carries (query_id, cand_id, adc_score) only;
    the exact cosine re-rank joins the `shortlist` survivors (nq x
    shortlist rows) back to full vectors.

Fit cost scales with corpus size; at real scale fit the codebooks on a
hash-sample (centroids do not need every row) and encode the full corpus
with the fitted literal — `pq_fit` takes any DataFrame, so pass
`corpus.sample(...)`.

Iterative KMeans is not SQL-expressible; the registered query
(`ann_pq_topk`) oracles the invariant summary (exact per-query row counts +
aggregate recall vs the exact brute-force baseline), the same contract as
`ann_ivf_topk`. Reference parity: the reference (c0mm4nd/chainhouse) has no
similarity search at all — this is a beyond-parity training-data-pipeline
operator (brief: similarity-search family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chainhouse_spark.functions.vector import cosine_sql, dot_sql
from chainhouse_spark.operators.partitioning import spread

Codebooks = list[list[list[float]]]  # m x k_sub x d_sub


def _codebook_literal(codebooks: Codebooks):
    """m x k x d_sub nested array literal (KiB-scale; ships in the plan)."""
    return F.array(
        *[
            F.array(*[F.array(*[F.lit(float(x)) for x in cw]) for cw in book])
            for book in codebooks
        ]
    )


def _sub_expr(vec_col: str, j_expr: str, d_sub: int) -> str:
    """Subvector j (1-based j_expr) of `vec_col`, cast to doubles."""
    return (
        f"transform(slice({vec_col}, ({j_expr} - 1) * {d_sub} + 1, {d_sub}), "
        f"x -> CAST(x AS DOUBLE))"
    )


def _argmin_code_expr(sub: str, book: str) -> str:
    """0-based id of the codeword in `book` (k x d_sub) nearest to `sub`
    by squared L2. First-index tie-break -> deterministic."""
    dist = (
        f"transform({book}, c -> aggregate(zip_with(c, {sub}, "
        f"(x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), "
        f"(acc, v) -> acc + v))"
    )
    return f"CAST(array_position({dist}, array_min({dist})) - 1 AS INT)"


def pq_fit(
    corpus: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    m: int = 8,
    k_sub: int = 16,
    n_iter: int = 6,
) -> Codebooks:
    """Fit m per-subspace codebooks of k_sub codewords (Lloyd's KMeans).

    Deterministic init: per subspace, the k_sub subvectors with the
    smallest md5(json(subvec)) digests (hash-spread sample; one window
    rank, no full sort materialized on the driver beyond m*k rows).
    """
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    d_sub = dim // m

    subs = corpus.select(
        F.posexplode(
            F.expr(
                f"transform(sequence(1, {m}), j -> {_sub_expr(vec_col, 'j', d_sub)})"
            )
        ).alias("j0", "sub")
    ).select((F.col("j0") + 1).alias("j"), "sub")

    w = Window.partitionBy("j").orderBy(F.md5(F.to_json(F.col("sub"))))
    init = (
        subs.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k_sub)
        .select("j", "r", "sub")
        .collect()
    )
    books: Codebooks = [[None] * k_sub for _ in range(m)]  # type: ignore[list-item]
    for row in init:
        books[row.j - 1][row.r - 1] = list(row.sub)
    for jb, book in enumerate(books):
        if any(cw is None for cw in book):
            raise ValueError(
                f"subspace {jb}: corpus has fewer than k_sub={k_sub} rows"
            )

    for _ in range(n_iter):
        assigned = subs.withColumn("_cb", _codebook_literal(books)).withColumn(
            "code", F.expr(_argmin_code_expr("sub", "element_at(_cb, j)"))
        )
        # Mean per (subspace, code, dim): partial map-side aggregates; the
        # final m*k*d_sub rows are the only driver-side materialization.
        means = (
            assigned.select("j", "code", F.posexplode("sub").alias("pos", "val"))
            .groupBy("j", "code", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        acc: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            acc.setdefault((r.j - 1, r.code), {})[r.pos] = r.s / r.n
        books = [
            [
                [acc[(jb, c)][p] for p in range(d_sub)]
                if (jb, c) in acc
                else books[jb][c]  # empty code keeps its previous codeword
                for c in range(k_sub)
            ]
            for jb in range(m)
        ]
    return books


def pq_encode(
    corpus: DataFrame,
    codebooks: Codebooks,
    vec_col: str = "embedding",
) -> DataFrame:
    """Add `codes` (array<int>, length m) — the PQ compression of
    `vec_col`. Map-only, fully codegen-side."""
    m = len(codebooks)
    d_sub = len(codebooks[0][0])
    codes = (
        f"transform(sequence(1, {m}), j -> "
        f"{_argmin_code_expr(_sub_expr(vec_col, 'j', d_sub), 'element_at(_cb, j)')})"
    )
    return (
        corpus.withColumn("_cb", _codebook_literal(codebooks))
        .withColumn("codes", F.expr(codes))
        .drop("_cb")
    )


def _adc_expr(q_vec: str, codes: str, m: int, d_sub: int) -> str:
    """ADC inner-product estimate: sum_j dot(q_sub_j, codeword[j][code_j]).
    Ordered left fold -> deterministic doubles."""
    cw = f"element_at(element_at(_cb, j), element_at({codes}, j) + 1)"
    return (
        f"aggregate(sequence(1, {m}), CAST(0.0 AS DOUBLE), (acc, j) -> acc + "
        f"{dot_sql(_sub_expr(q_vec, 'j', d_sub), cw)})"
    )


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    m: int = 8,
    k_sub: int = 16,
    n_iter: int = 6,
    shortlist: int = 50,
) -> DataFrame:
    """Approximate cosine top-k via PQ/ADC shortlist + exact re-rank.

    Small-query-side contract (like brute_force/ivf): `queries` broadcasts.
    Output shape matches brute_force_topk: (query_id, cand_id, cos_sim,
    rank) with cos_sim EXACT on the re-ranked survivors.
    """
    books = pq_fit(corpus, vec_col, dim, m, k_sub, n_iter)
    d_sub = dim // m
    enc = pq_encode(spread(corpus, id_col), books, vec_col).select(
        F.col(id_col).alias("cand_id"), "codes"
    )

    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    # ADC scan: corpus side carries (cand_id, codes) only — the rank shuffle
    # moves m bytes of code per row, never the vectors.
    scored = (
        enc.withColumn("_cb", _codebook_literal(books))
        .join(F.broadcast(q), F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.expr(_adc_expr("q_vec", "codes", m, d_sub)).alias("adc"),
        )
    )
    ws = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("cand_id"))
    short = (
        scored.withColumn("r", F.row_number().over(ws))
        .filter(F.col("r") <= shortlist)
        .select("query_id", "cand_id")
    )

    # Exact re-rank on nq x shortlist survivors: join full vectors back.
    cv = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    exact = (
        short.join(cv, "cand_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "cand_id",
            F.expr(cosine_sql("q_vec", "c_vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    n_cells: int = 16,
    n_probe: int = 8,
    m: int = 8,
    k_sub: int = 16,
    n_iter: int = 6,
    shortlist: int = 50,
    seed: int = 42,
) -> DataFrame:
    """IVF-PQ: the canonical billion-scale ANN layout (Jegou et al. 2011
    §IV; what FAISS calls IVFPQ). The IVF coarse quantizer prunes the scan
    to `n_probe`/`n_cells` of the corpus; PQ codes make the scanned
    fraction `m` bytes per row instead of dim*4; an exact cosine re-rank
    fixes the shortlist ordering.

    At rest this is: corpus partitioned by `cell` (partition pruning does
    the probe), `codes` stored alongside (the scan column), float vectors
    cold (fetched for nq x shortlist rows only). Shuffle budget: the rank
    shuffle carries (query_id, cand_id, adc) for the probed fraction only.
    """
    from chainhouse_spark.operators.ivf import assign_cells
    from chainhouse_spark.functions.vector import cosine_sql as _cos

    assigned, centroids = assign_cells(corpus, vec_col, n_cells, seed)
    books = pq_fit(corpus, vec_col, dim, m, k_sub, n_iter)
    d_sub = dim // m
    enc = pq_encode(spread(assigned, id_col), books, vec_col).select(
        F.col(id_col).alias("cand_id"), "cell", "codes"
    )

    spark = corpus.sparkSession
    cent = spark.createDataFrame(centroids, ["cell", "centroid"])
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    qc = q.crossJoin(F.broadcast(cent)).withColumn(
        "c_sim", F.expr(_cos("q_vec", "centroid"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_sim"), F.asc("cell"))
    probes = (
        qc.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= n_probe)
        .select("query_id", "q_vec", "cell")
    )

    # Probe = equi-join on cell (partition pruning at rest); score = ADC
    # over codes. Only (query_id, cand_id, adc) reaches the rank shuffle.
    scored = (
        enc.withColumn("_cb", _codebook_literal(books))
        .join(F.broadcast(probes), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.expr(_adc_expr("q_vec", "codes", m, d_sub)).alias("adc"),
        )
    )
    ws = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("cand_id"))
    short = (
        scored.withColumn("r", F.row_number().over(ws))
        .filter(F.col("r") <= shortlist)
        .select("query_id", "cand_id")
    )

    cv = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    exact = (
        short.join(cv, "cand_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id", "cand_id", F.expr(_cos("q_vec", "c_vec")).alias("cos_sim")
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )


def pq_topk_broadcast_lut(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    dim: int = 64,
    m: int = 8,
    k_sub: int = 16,
    n_iter: int = 6,
    shortlist: int = 50,
    max_queries: int = 10_000,
) -> DataFrame:
    """pq_topk with the ADC scan as an Arrow-batched numpy LUT pass — the
    transport for LARGE codebooks (k_sub = 256 and up), where the
    plan-literal form bloats every task's serialized plan with m*k*d_sub
    doubles. Here the per-query lookup tables (LUT[q][j][code] =
    dot(q_sub_j, codeword[j][code]), nq x m x k doubles) are broadcast
    once via the SparkContext, and each Arrow batch scores all queries
    with m vectorized gathers — per-row Python never runs.

    Scoring floats come from numpy dot products, whose summation order
    differs from the SQL fold at the last ulp, so this path re-ranks its
    OWN shortlist with the same exact cosine as pq_topk; outputs match
    pq_topk except where an ulp moved the shortlist boundary (tested
    equal on the fixtures). Same bounded-collect contract: the query side
    is a batch (collected to build the LUT), the corpus only streams.

    Broadcast lifecycle: the LUT broadcast must outlive the returned (lazy)
    DataFrame, so it is NOT unpersisted here. In a resident session making
    many calls, blocks accumulate (bounded by max_queries*m*k_sub doubles
    each) until Spark's ContextCleaner collects them when the returned
    plan is garbage-collected — force with `spark.sparkContext._jvm
    .System.gc()` or recreate the session between large batches."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    books = pq_fit(corpus, vec_col, dim, m, k_sub, n_iter)
    d_sub = dim // m
    enc = pq_encode(spread(corpus, id_col), books, vec_col).select(
        F.col(id_col).alias("cand_id"), "codes"
    )

    # Same bounded-collect guard as similarity.brute_force_topk_gemm: the
    # query side lands on the driver (nq*m*k LUT doubles) — a mis-sized
    # call must fail loudly, not OOM the driver. limit(max+1) bounds the
    # collect itself.
    q_rows = (
        queries.select(F.col(id_col), F.col(vec_col))
        .limit(max_queries + 1)
        .collect()
    )
    if len(q_rows) > max_queries:
        raise ValueError(
            f"pq_topk_broadcast_lut: query side exceeds {max_queries} rows — "
            "this operator collects the queries and broadcasts an nq*m*k LUT "
            "(small-side contract). Batch the queries or raise max_queries "
            "explicitly if the driver can hold the LUT."
        )
    qids = np.array([r[0] for r in q_rows], dtype=np.int64)
    Q = np.array([list(r[1]) for r in q_rows], dtype=np.float64)
    B = np.array(books, dtype=np.float64)  # m x k x d_sub
    lut = np.einsum("qjd,jkd->qjk", Q.reshape(len(qids), m, d_sub), B)
    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((qids, lut))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ids, table = bc.value
        nq = len(ids)
        for pdf in batches:
            if len(pdf) == 0:
                continue
            codes = np.stack(pdf["codes"].to_numpy()).astype(np.int64)  # B x m
            scores = np.zeros((nq, len(pdf)), dtype=np.float64)
            for j in range(m):
                scores += table[:, j, codes[:, j]]
            cand = pdf["cand_id"].to_numpy()
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(ids, len(pdf)),
                    "cand_id": np.tile(cand, nq),
                    "adc": scores.reshape(-1),
                }
            )

    scored = enc.mapInPandas(
        gen, schema="query_id long, cand_id long, adc double"
    ).filter(F.col("cand_id") != F.col("query_id"))

    ws = Window.partitionBy("query_id").orderBy(F.desc("adc"), F.asc("cand_id"))
    short = (
        scored.withColumn("r", F.row_number().over(ws))
        .filter(F.col("r") <= shortlist)
        .select("query_id", "cand_id")
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    cv = corpus.select(F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"))
    exact = (
        short.join(cv, "cand_id")
        .join(F.broadcast(q), "query_id")
        .select(
            "query_id",
            "cand_id",
            F.expr(cosine_sql("q_vec", "c_vec")).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        exact.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )
