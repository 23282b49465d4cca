"""IVF (inverted-file) approximate nearest neighbor over an embedding column.

The scale path for similarity search: a KMeans coarse quantizer (pure
DataFrame Lloyd's iterations — no pyspark.ml, whose import chain needs
`_multiprocessing` and fails in restricted sandboxes) splits the corpus
into cells; each query scores only the `n_probe` cells whose centroids are
nearest, so probe cost is ~ n_probe/n_cells of brute force. Recall < 1 by
construction — tests measure it against operators.similarity.brute_force_topk.

Each Lloyd's iteration is one codegen-side argmin over a broadcast centroid
literal (n_cells × dim doubles) plus one (cell, dim)-keyed partial-agg
shuffle whose result — n_cells × dim rows — is collected to the driver.
Nothing corpus-sized ever leaves the executors.

Layout note for 100 TB: the cell assignment is exactly the partition/bucket
key you would persist the corpus by (`partitionBy("cell")` on write), making
a probe a partition-pruned scan plus a broadcast of the query batch; the
quantizer fit itself samples the corpus (fit on a fraction — centroids don't
need every row).

Not SQL-expressible (iterative KMeans) -> registered rows-only with recall
covered in tests (SURVEY.md §5 strategy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chainhouse_spark.functions.vector import (
    cosine_prenorm_sql,
    cosine_sql,
    norm_sql,
)
from chainhouse_spark.operators.partitioning import spread


def _centroid_literal(centroids: list[list[float]]):
    """n_cells × dim column literal (tiny; ships inside the plan)."""
    return F.array(*[F.array(*[F.lit(float(x)) for x in c]) for c in centroids])


def _nearest_cell_expr(vec_col: str) -> str:
    """0-based argmin over squared-L2 distance to each centroid in `_cent`.

    Left-fold arithmetic (aggregate over zip_with) — deterministic order,
    all inside WholeStageCodegen."""
    dist = (
        f"transform(_cent, c -> aggregate(zip_with(c, {vec_col}, "
        f"(x, y) -> (x - CAST(y AS DOUBLE)) * (x - CAST(y AS DOUBLE))), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )
    # array_position returns the FIRST index of the min -> deterministic
    # tie-break (lowest cell id wins).
    return f"CAST(array_position({dist}, array_min({dist})) - 1 AS INT)"


def assign_cells(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    n_iter: int = 8,
):
    """Fit the coarse quantizer (Lloyd's KMeans) and return
    (assigned corpus, centroids).

    Init is deterministic: the n_cells corpus vectors with the smallest
    md5(json(vector)) digests (a hash-spread pseudo-random sample — a
    TakeOrdered of n_cells rows, no full sort). `seed` keeps its place in
    the signature for API stability; determinism comes from the hash order.

    centroids is a list of (cell_id, [float...]) — small by construction
    (n_cells × dim), safe to broadcast or keep driver-side.
    """
    vecs = corpus.select(F.col(vec_col).cast("array<double>").alias("_v"))
    init_rows = (
        vecs.withColumn("_h", F.md5(F.to_json(F.col("_v"))))
        .orderBy("_h")
        .limit(n_cells)
        .collect()
    )
    cents = [list(r._v) for r in init_rows]

    for _ in range(n_iter):
        assigned_v = vecs.withColumn("_cent", _centroid_literal(cents)).withColumn(
            "cell", F.expr(_nearest_cell_expr("_v"))
        )
        # Mean per (cell, dim): partial aggregates map-side, final result is
        # n_cells × dim rows — the only thing the driver ever sees.
        means = (
            assigned_v.select("cell", F.posexplode("_v").alias("pos", "val"))
            .groupBy("cell", "pos")
            .agg(F.sum("val").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r.cell, {})[r.pos] = r.s / r.n
        # Empty cells keep their previous centroid.
        cents = [
            [by_cell[i][p] for p in range(len(cents[i]))] if i in by_cell else cents[i]
            for i in range(n_cells)
        ]

    assigned = corpus.withColumn("_cent", _centroid_literal(cents)).withColumn(
        "cell", F.expr(_nearest_cell_expr(vec_col))
    ).drop("_cent")
    centroids = [(i, [float(x) for x in c]) for i, c in enumerate(cents)]
    return assigned, centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: each query probes its `n_probe` nearest
    cells. Same output shape as brute_force_topk (query_id, cand_id,
    cos_sim, rank)."""
    assigned, centroids = assign_cells(corpus, vec_col, n_cells, seed)
    spark = corpus.sparkSession

    cent = spark.createDataFrame(centroids, ["cell", "centroid"])
    # Each query ranks all centroids (n_cells rows — tiny) and keeps n_probe.
    # The query norm rides along so the corpus-scoring stage below runs 1
    # fold per candidate instead of 3 (functions/vector.py::
    # cosine_prenorm_sql — bit-identical).
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.expr(norm_sql(vec_col)).alias("qn"),
    )
    qc = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("c_dist", F.expr(cosine_sql("q_vec", "centroid")))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_dist"), F.asc("cell"))
    probes = (
        qc.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= n_probe)
        .select("query_id", "q_vec", "qn", "cell")
    )

    c = spread(assigned, id_col).select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        F.expr(norm_sql(vec_col)).alias("cn"),
        "cell",
    )
    scored = (
        c.join(F.broadcast(probes), "cell")
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


def ivf_write(
    corpus: DataFrame,
    path: str,
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
    n_iter: int = 8,
) -> None:
    """Persist the corpus as an at-rest IVF index: vectors land in parquet
    PARTITIONED BY their coarse-quantizer cell, centroids next to them
    (`<path>/centroids`, n_cells rows). This is the module docstring's
    '100 TB layout note' made real: after this write, a probe is a
    partition-PRUNED scan (only n_probe/n_cells of the files open) — the
    same mechanics ClickHouse gets from a partition key, with no index
    service in the loop."""
    assigned, centroids = assign_cells(corpus, vec_col, n_cells, seed, n_iter)
    (
        assigned.repartition("cell")
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/vectors")
    )
    spark = corpus.sparkSession
    spark.createDataFrame(centroids, ["cell", "centroid"]).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")


def ivf_probe(
    spark,
    path: str,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Query an `ivf_write` index from disk. Each query ranks the stored
    centroids (n_cells rows — driver/broadcast scale) and keeps its
    n_probe nearest cells; the vector scan then filters on the UNION of
    probed cells as a LITERAL IN-list, which Spark turns into
    PartitionFilters — files of unprobed cells are never opened
    (pinned by tests/test_ivf.py::test_ivf_at_rest_partition_pruning).

    The collect is bounded: n_queries x n_probe (cell, query) pairs with
    cell ids < n_cells; the IN-list is at most n_cells integers. Output
    shape matches ivf_topk/brute_force_topk: (query_id, cand_id, cos_sim,
    rank), exact cosine on scanned candidates."""
    cent = spark.read.parquet(f"{path}/centroids")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.expr(norm_sql(vec_col)).alias("qn"),
    )
    qc = q.crossJoin(F.broadcast(cent)).withColumn(
        "c_dist", F.expr(cosine_sql("q_vec", "centroid"))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_dist"), F.asc("cell"))
    probes = (
        qc.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= n_probe)
        .select("query_id", "q_vec", "qn", "cell")
    )
    probed_cells = sorted(
        {r.cell for r in probes.select("cell").distinct().collect()}
    )

    vecs = spark.read.parquet(f"{path}/vectors").filter(
        F.col("cell").isin(probed_cells)  # literal IN -> partition pruning
    )
    c = vecs.select(
        F.col(id_col).alias("cand_id"),
        F.col(vec_col).alias("c_vec"),
        F.expr(norm_sql(vec_col)).alias("cn"),
        "cell",
    )
    scored = (
        c.join(F.broadcast(probes), "cell")
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
