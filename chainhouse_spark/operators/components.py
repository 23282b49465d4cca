"""Distributed connected components — the clustering stage of near-dup
deduplication: pair edges (from LSH/Jaccard/SimHash) become duplicate
CLUSTERS, and each cluster keeps one canonical document.

Algorithm: iterative min-label propagation (hash-to-min family). Every node
starts labeled with itself; each round a node takes the minimum label among
itself and its neighbors; convergence when no label changes. Rounds needed
are bounded by component diameter — for dedup graphs (small, dense clusters)
this is a handful; the classic alternating large/small-star optimization is
unnecessary at that diameter.

Spark mechanics that matter at scale:
- each round is one shuffle (edge⨝label + groupBy-min, both on node keys);
- `localCheckpoint()` per round cuts the lineage — without it the plan
  doubles every iteration and the job dies on planning time, the classic
  iterative-DataFrame mistake;
- the convergence check is a cheap anti-equality count on the changed set.

Iterative -> not SQL-expressible as one query in Spark, but the fixpoint IS
expressible as a recursive CTE in DuckDB, so the cluster query in
queries/llm_dedup.py is fully oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Edges (undirected; any orientation) -> (node, cluster_id) where
    cluster_id is the minimum node id in the component."""
    sym = edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).union(
        edges.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    labels = (
        sym.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_min = (
            sym.join(labels, sym["b"] == labels["node"])
            .groupBy(sym["a"].alias("node"))
            .agg(F.min("label").alias("nbr_label"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left_outer")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce("nbr_label", "label")).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node"), F.col("label").alias("cluster_id"))


def canonicalize(components: DataFrame, id_col: str = "node") -> DataFrame:
    """(node, cluster_id) -> per-cluster summary with the canonical (minimum)
    member and the cluster size — the drop-list input for dedup."""
    return components.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.min(id_col).alias("canonical_id"),
    )
