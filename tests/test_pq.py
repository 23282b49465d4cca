"""Product quantization: codebook fit determinism, encode bounds, ADC
shortlist recall vs the exact baseline, and the bandwidth plan shape
(rank shuffle carries codes, vectors only rejoin for the shortlist).

Oracle-side equality for the registered `ann_pq_topk` summary is in
test_oracle_parity.py; these pin what the invariant oracle can't.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chainhouse_spark.operators.pq import pq_encode, pq_fit, pq_topk
from chainhouse_spark.operators.similarity import brute_force_topk
from chainhouse_spark.tables import load_table

SF = "/root/testdata/sf0.001"


def _emb(spark):
    return load_table(spark, SF, "embeddings")


def test_codebook_shape_and_determinism(spark):
    emb = _emb(spark)
    b1 = pq_fit(emb, m=8, k_sub=16, n_iter=3)
    b2 = pq_fit(emb, m=8, k_sub=16, n_iter=3)
    assert len(b1) == 8
    assert all(len(book) == 16 for book in b1)
    assert all(len(cw) == 8 for book in b1 for cw in book)
    assert b1 == b2  # hash-seeded init + deterministic fold arithmetic


def test_encode_codes_in_range(spark):
    emb = _emb(spark)
    books = pq_fit(emb, m=8, k_sub=16, n_iter=2)
    enc = pq_encode(emb, books)
    row = enc.select(
        F.min(F.array_min("codes")).alias("lo"),
        F.max(F.array_max("codes")).alias("hi"),
        F.min(F.size("codes")).alias("m_lo"),
        F.max(F.size("codes")).alias("m_hi"),
    ).first()
    assert row.lo >= 0 and row.hi <= 15
    assert row.m_lo == 8 and row.m_hi == 8


def test_pq_recall_vs_bruteforce(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    approx = pq_topk(emb, q, k=10, m=8, k_sub=16, shortlist=50)
    exact = brute_force_topk(emb, q, k=10)
    hits = approx.join(
        exact.select("query_id", "cand_id"), ["query_id", "cand_id"], "left_semi"
    ).count()
    # 5 queries x 10 results; ADC over 16 codewords/subspace + exact re-rank
    # of a 50-deep shortlist lands well above the 0.6 oracle floor.
    assert hits >= 30
    # exactly k rows per query, ranks 1..k
    per_q = approx.groupBy("query_id").count().select(F.collect_set("count")).first()[0]
    assert per_q == [10]


def test_pq_exact_rerank_scores_are_exact(spark):
    # cos_sim on reported rows must equal the exact cosine for those pairs
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 3)
    approx = pq_topk(emb, q, k=5, m=8, k_sub=16, shortlist=30)
    exact_all = brute_force_topk(emb, q, k=500)  # all candidates, exact
    joined = approx.alias("a").join(
        exact_all.alias("e"), ["query_id", "cand_id"]
    ).select((F.col("a.cos_sim") == F.col("e.cos_sim")).alias("eq"))
    rows = joined.collect()
    assert rows and all(r.eq for r in rows)


def test_pq_plan_broadcasts_queries_and_ships_codes(spark):
    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 3)
    plan = (
        pq_topk(emb, q, k=5, m=8, k_sub=16, shortlist=30)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastExchange" in plan  # query side broadcasts into the scan
    assert "codes" in plan  # ADC path scores on codes, not raw vectors


def test_ivfpq_recall_and_row_contract(spark):
    from chainhouse_spark.operators.pq import ivfpq_topk

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    approx = ivfpq_topk(emb, q, k=10, n_cells=16, n_probe=8, shortlist=50)
    exact = brute_force_topk(emb, q, k=10)
    hits = approx.join(
        exact.select("query_id", "cand_id"), ["query_id", "cand_id"], "left_semi"
    ).count()
    assert hits >= 25  # cell pruning + code quantization; floor 0.5 recall
    per_q = approx.groupBy("query_id").count().select(F.collect_set("count")).first()[0]
    assert per_q == [10]


def test_recall_curve_sf01(spark):
    """Approximation-quality pin at the bench scale (sf0.1: 2000 vectors,
    20 queries, dim 64): recall@10 vs exact brute force must clear floors
    measured on this corpus AND respond to both quality knobs — deeper
    shortlist (more exact re-ranking) and finer codebooks (more bits per
    vector). Guards against a refactor that keeps row contracts green
    while silently wrecking ranking quality.

    Measured curve (2026-08, the floors sit ~0.05 under it):
      m=8  k_sub=16 (32-bit codes): s=50 0.45, s=150 0.705, s=400 0.905
      m=16 k_sub=16 (64-bit codes): s=50 0.71
      ivfpq n_cells=16 n_probe=8 s=150: 0.66
    The default 32-bit code is a bandwidth-first setting — at shortlist
    2.5% of the corpus it recovers 0.7, and doubling the code budget to
    64 bits buys the same recall at 1/3 the shortlist."""
    from chainhouse_spark.operators.pq import ivfpq_topk, pq_topk

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings").cache()
    q = emb.filter(F.col("vec_id") < 20)
    exact = (
        brute_force_topk(emb, q, k=10)
        .select("query_id", "cand_id")
        .cache()
    )
    n_exact = exact.count()  # 20 queries x 10
    assert n_exact == 200

    def recall(approx):
        return (
            approx.join(exact, ["query_id", "cand_id"], "left_semi").count()
            / n_exact
        )

    pq_curve = {
        s: recall(pq_topk(emb, q, k=10, m=8, k_sub=16, shortlist=s))
        for s in (50, 150, 400)
    }
    # deeper shortlist -> never worse (exact re-rank over a superset)
    assert pq_curve[50] <= pq_curve[150] <= pq_curve[400], pq_curve
    assert pq_curve[50] >= 0.40, pq_curve
    assert pq_curve[150] >= 0.60, pq_curve
    assert pq_curve[400] >= 0.85, pq_curve

    # finer quantization (64-bit codes) must beat the 32-bit default at
    # the same shortlist depth
    r_m16 = recall(pq_topk(emb, q, k=10, m=16, k_sub=16, shortlist=50))
    assert r_m16 >= 0.60, r_m16
    assert r_m16 > pq_curve[50], (r_m16, pq_curve[50])

    r_ivf = recall(
        ivfpq_topk(emb, q, k=10, n_cells=16, n_probe=8, shortlist=150)
    )
    assert r_ivf >= 0.55, r_ivf
    emb.unpersist()
    exact.unpersist()


def test_broadcast_lut_transport_matches_literal(spark):
    """The Arrow/numpy LUT transport (large-codebook path) returns the
    same final top-k as the plan-literal ADC at identical params, and its
    plan carries exactly one Python stage for the ADC scan."""
    from chainhouse_spark.operators.pq import pq_topk_broadcast_lut

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 5)
    lit = pq_topk(emb, q, k=10, m=8, k_sub=16, shortlist=50)
    lut = pq_topk_broadcast_lut(emb, q, k=10, m=8, k_sub=16, shortlist=50)
    a = {(r.query_id, r.cand_id, r.rank) for r in lit.collect()}
    b = {(r.query_id, r.cand_id, r.rank) for r in lut.collect()}
    assert a == b and len(a) == 50
    plan = lut._jdf.queryExecution().executedPlan().toString()
    # AQE renders the node in both the final and initial plan sections
    assert "MapInPandas" in plan
    # the large-codebook shape it exists for also runs (k_sub=64)
    big = pq_topk_broadcast_lut(emb, q, k=5, m=8, k_sub=64, shortlist=30)
    per_q = big.groupBy("query_id").count().select(F.collect_set("count")).first()[0]
    assert per_q == [5]


def test_broadcast_lut_guard_rejects_oversized_query_set(spark):
    """The LUT path collects the query side to the driver (nq*m*k doubles);
    an oversized query set must raise loudly instead of OOMing — the same
    bound as similarity.brute_force_topk_gemm (VERDICT r04 nit)."""
    import pytest

    from chainhouse_spark.operators.pq import pq_topk_broadcast_lut

    emb = _emb(spark)
    with pytest.raises(ValueError, match="small-side contract"):
        pq_topk_broadcast_lut(emb, emb, k=5, max_queries=10)
