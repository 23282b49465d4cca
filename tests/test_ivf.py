"""IVF ANN: determinism, output contract, and recall vs brute force."""

from __future__ import annotations

from pyspark.sql import functions as F

from chainhouse_spark.operators.ivf import assign_cells, ivf_topk
from chainhouse_spark.operators.similarity import brute_force_topk
from chainhouse_spark.tables import load_table

SF = "/root/testdata/sf0.01"


def test_assignment_covers_corpus(spark):
    emb = load_table(spark, SF, "embeddings")
    assigned, centroids = assign_cells(emb, n_cells=8)
    assert assigned.count() == emb.count()
    assert len(centroids) == 8
    cells = {r.cell for r in assigned.select("cell").distinct().collect()}
    assert cells <= set(range(8))


def test_ivf_topk_contract_and_recall(spark):
    emb = load_table(spark, SF, "embeddings").cache()
    q = emb.filter(F.col("vec_id") < 5)
    exact = brute_force_topk(emb, q, k=10)
    approx = ivf_topk(emb, q, k=10, n_cells=16, n_probe=4)
    assert approx.columns == ["query_id", "cand_id", "cos_sim", "rank"]
    e = {(r.query_id, r.cand_id) for r in exact.collect()}
    a = {(r.query_id, r.cand_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    # 4/16 cells probed: recall must beat random cell coverage by a wide
    # margin (nearest cells hold the nearest vectors).
    assert recall >= 0.5, f"recall {recall}"
    # per-query rank sequence is 1..k with no gaps
    for qid in range(5):
        ranks = sorted(r.rank for r in approx.collect() if r.query_id == qid)
        assert ranks == list(range(1, len(ranks) + 1))


def test_ivf_deterministic(spark):
    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    a = {(r.query_id, r.cand_id, r.rank) for r in ivf_topk(emb, q, k=5).collect()}
    b = {(r.query_id, r.cand_id, r.rank) for r in ivf_topk(emb, q, k=5).collect()}
    assert a == b


def test_gemm_topk_matches_aggregate_topk(spark, sf_dir):
    """The BLAS path must return the same top-10 per query as the
    SQL-aggregate exact form; cosine values agree to 1e-9 (both are exact
    float64 — only summation order differs)."""
    from chainhouse_spark.operators.similarity import (
        brute_force_topk,
        brute_force_topk_gemm,
    )
    from chainhouse_spark.tables import load_table
    import pyspark.sql.functions as F  # noqa: N812

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    a = brute_force_topk(emb, q, k=10).toPandas()
    b = brute_force_topk_gemm(emb, q, k=10).toPandas()
    for qid in a["query_id"].unique():
        sa = set(a[a.query_id == qid]["cand_id"])
        sb = set(b[b.query_id == qid]["cand_id"])
        assert sa == sb, f"query {qid}: {sa ^ sb}"
    m = a.merge(b, on=["query_id", "cand_id"], suffixes=("_a", "_b"))
    assert (m["cos_sim_a"] - m["cos_sim_b"]).abs().max() < 1e-9


def test_gemm_guard_rejects_oversized_query_set(spark):
    """The GEMM path collects the query side to the driver; an oversized
    query set must raise a clear error instead of OOMing."""
    import pytest

    from chainhouse_spark.operators.similarity import brute_force_topk_gemm

    emb = load_table(spark, SF, "embeddings")
    with pytest.raises(ValueError, match="small-side contract"):
        brute_force_topk_gemm(emb, emb, k=5, max_queries=10)


def test_ivf_cell_partitioned_layout_prunes_scan(spark, tmp_path):
    """The SCALE.md contract made executable: persist the corpus
    partitionBy("cell") and a single-cell probe must read ONLY that cell's
    partition — the physical plan carries the cell value as a partition
    filter and the other cells' files are never listed into the scan."""
    from chainhouse_spark.operators.ivf import assign_cells

    emb = load_table(spark, SF, "embeddings")
    assigned, _ = assign_cells(emb, "embedding", n_cells=8)
    path = str(tmp_path / "ivf_corpus")
    assigned.write.partitionBy("cell").parquet(path)

    cells = sorted(r.cell for r in assigned.select("cell").distinct().collect())
    probe_cell = cells[0]
    probed = spark.read.parquet(path).filter(f"cell = {probe_cell}")
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan
    # row count equals the cell's population — nothing else was read
    expect = assigned.filter(f"cell = {probe_cell}").count()
    assert probed.count() == expect
    # and at execution time every task reads only that cell's files
    # (inputFiles() lists the pre-pruning relation, so probe at runtime)
    from pyspark.sql import functions as F

    files = [
        r[0]
        for r in probed.select(F.input_file_name()).distinct().collect()
    ]
    assert files and all(f"cell={probe_cell}" in f for f in files)


def test_ivf_at_rest_partition_pruning(spark, tmp_path):
    """ivf_write lays vectors out partitioned by cell; ivf_probe's scan
    must carry PartitionFilters (only probed cells' files open) and its
    results must match the in-memory ivf_topk with identical params."""
    from chainhouse_spark.operators.ivf import ivf_probe, ivf_topk, ivf_write
    from chainhouse_spark.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter("vec_id < 5")
    idx = str(tmp_path / "ivf")
    ivf_write(emb, idx, n_cells=8)

    # at-rest layout: one directory per cell
    import os

    cells = sorted(
        d for d in os.listdir(f"{idx}/vectors") if d.startswith("cell=")
    )
    assert len(cells) >= 2

    got = ivf_probe(spark, idx, q, k=10, n_probe=3)
    plan = got._jdf.queryExecution().executedPlan().toString()
    # a NON-EMPTY partition filter with the literal cell IN-list — proof
    # the unprobed cells' files never open (plus runtime dynamic pruning)
    assert "PartitionFilters: [cell" in plan and " IN (" in plan

    mem = ivf_topk(emb, q, k=10, n_cells=8, n_probe=3)
    g = {(r.query_id, r.cand_id, r.rank) for r in got.collect()}
    m = {(r.query_id, r.cand_id, r.rank) for r in mem.collect()}
    assert g == m and len(g) > 0
