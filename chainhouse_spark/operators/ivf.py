"""IVF (inverted-file) approximate nearest neighbor over an embedding column.

The scale path for similarity search: a KMeans coarse quantizer (Spark ML,
JVM-side, trained once per corpus snapshot) splits the corpus into cells;
each query scores only the `n_probe` cells whose centroids are nearest, so
probe cost is ~ n_probe/n_cells of brute force. Recall < 1 by construction —
tests measure it against operators.similarity.brute_force_topk.

Layout note for 100 TB: the cell assignment is exactly the partition/bucket
key you would persist the corpus by (`partitionBy("cell")` on write), making
a probe a partition-pruned scan plus a broadcast of the query batch; the
KMeans fit itself samples the corpus (fit on a fraction — centroids don't
need every row).

Not SQL-expressible (iterative KMeans) -> registered rows-only with recall
covered in tests (SURVEY.md §5 strategy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chainhouse_spark.functions.vector import cosine_sql
from chainhouse_spark.operators.partitioning import spread


def assign_cells(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    seed: int = 42,
):
    """Fit the coarse quantizer and return (assigned corpus, centroids).

    centroids is a list of (cell_id, [float...]) — small by construction
    (n_cells × dim), safe to broadcast or keep driver-side.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feat = corpus.withColumn("_fv", array_to_vector(F.col(vec_col).cast("array<double>")))
    model = KMeans(k=n_cells, seed=seed, featuresCol="_fv", predictionCol="cell").fit(feat)
    assigned = model.transform(feat).drop("_fv")
    centroids = [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())]
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
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    qc = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("c_dist", F.expr(cosine_sql("q_vec", "centroid")))
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("c_dist"), F.asc("cell"))
    probes = (
        qc.withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= n_probe)
        .select("query_id", "q_vec", "cell")
    )

    c = spread(assigned, id_col).select(
        F.col(id_col).alias("cand_id"), F.col(vec_col).alias("c_vec"), "cell"
    )
    scored = (
        c.join(F.broadcast(probes), "cell")
        .filter(F.col("cand_id") != F.col("query_id"))
        .select("query_id", "cand_id", F.expr(cosine_sql("q_vec", "c_vec")).alias("cos_sim"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "cos_sim", "rank")
    )
