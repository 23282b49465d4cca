"""Round-12 query invariants the oracle-parity gate can't express.

Starts with the ADVICE r11 totality fix: dedup_modality_overlap's 1-row
go/no-go report must stay NULL-free even on a corpus with ZERO near-dup
pairs in either modality (sums over an empty relation are NULL and 0/0 is
NULL in both engines; the sf0.01 parity run always has union > 0, so only
a constructed corpus exercises the guard).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from chainhouse_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def nodup_sf_dir(tmp_path_factory):
    """A tiny sf dir whose corpus has NO near-dup pairs in either
    modality: two orthogonal embeddings (cosine 0 < 0.2 even if sign-LSH
    buckets them together) and two texts sharing no 3-gram."""
    d = tmp_path_factory.mktemp("sf_nodup")
    dim = 16
    e1 = [0.0] * dim
    e2 = [0.0] * dim
    e1[0] = 1.0
    e2[1] = 1.0
    pd.DataFrame(
        {
            "vec_id": pd.array([1, 2], dtype="int64"),
            "embedding": [
                np.asarray(e1, dtype=np.float32),
                np.asarray(e2, dtype=np.float32),
            ],
            "label": pd.array([0, 1], dtype="int32"),
        }
    ).to_parquet(d / "embeddings.parquet")
    texts = [
        "alpha beta gamma delta epsilon zeta",
        "one two three four five six",
    ]
    pd.DataFrame(
        {
            "doc_id": pd.array([1, 2], dtype="int64"),
            "text": texts,
            "lang": ["en", "en"],
            "source": ["src_a", "src_b"],
            "n_chars": pd.array([len(t) for t in texts], dtype="int64"),
        }
    ).to_parquet(d / "documents.parquet")
    return str(d)


def test_modality_overlap_total_on_empty_union(spark, nodup_sf_dir):
    """Every cell of the report is non-NULL and exactly zero when the
    pair union is empty (ADVICE r11: the unguarded form emitted NULL
    from SUM-over-empty and 0/0)."""
    r = QUERIES["dedup_modality_overlap"](spark, nodup_sf_dir).collect()[0]
    assert r.n_semantic == 0
    assert r.n_lexical == 0
    assert r.n_both == 0
    assert r.n_semantic_only == 0
    assert r.n_lexical_only == 0
    assert r.pair_jaccard == 0.0


def test_modality_overlap_unchanged_on_real_corpus(spark):
    """The guard is a no-op whenever union > 0 — the identity the r11
    driver row adjudicated still holds on the real sf0.01 corpus."""
    r = QUERIES["dedup_modality_overlap"](spark, SF).collect()[0]
    union = r.n_semantic + r.n_lexical - r.n_both
    assert union > 0
    assert abs(r.pair_jaccard - r.n_both / union) < 1e-9


# --- Semantic decontamination family (round 12): cross-query consistency
# the per-query DuckDB oracles cannot see, because each oracle only checks
# one query against itself. The four queries share one leak-pair relation,
# so their aggregates must agree exactly. ---


def test_semantic_contamination_family_consistent(spark):
    rate = QUERIES["contamination_semantic_cells"](spark, SF).collect()
    nearest = QUERIES["contamination_semantic_nearest"](spark, SF).collect()
    purge = QUERIES["semantic_purge_plan"](spark, SF).collect()
    by_cell = QUERIES["contamination_semantic_by_cell"](spark, SF).collect()

    n_leaked = sum(r.n_leaked for r in rate)
    assert n_leaked > 0, "threshold produced zero leaks — family untestable"
    # nearest emits exactly one audit row per leaked eval doc
    assert len(nearest) == n_leaked
    assert len({r.eval_id for r in nearest}) == n_leaked
    # leak PAIRS counted per cell == leak pairs counted per train doc
    assert sum(r.n_leak_pairs for r in by_cell) == sum(
        r.n_eval_hits for r in purge
    )
    # per-cell workload accounting is total: pairs = train × eval
    for r in by_cell:
        assert r.n_pairs == r.n_train * r.n_eval
        assert r.n_leak_pairs <= r.n_pairs
        if r.n_pairs == 0:
            assert r.max_cos is None and r.n_leak_pairs == 0


def test_purge_plan_targets_train_split_only(spark):
    """Every purge row must name a TRAIN-split doc (md5 snap bit 0) — a
    row naming an eval doc would mean the pair orientation flipped."""
    import hashlib

    purge = QUERIES["semantic_purge_plan"](spark, SF).collect()
    assert purge
    for r in purge:
        bit = int(hashlib.md5(str(r.train_id).encode()).hexdigest()[0], 16) % 2
        assert bit == 0, f"train_id {r.train_id} is on the eval split"


def test_stream_semantic_equals_batch_purge_plan(spark):
    """The streaming probe must reproduce semantic_purge_plan exactly —
    same pair relation, same aggregation, micro-batch boundaries absorbed
    by order-insensitive COUNT/MAX over bit-exact cosines."""
    batch = {
        (r.train_id, r.source, r.n_eval_hits, r.max_cos)
        for r in QUERIES["semantic_purge_plan"](spark, SF).collect()
    }
    stream = {
        (r.train_id, r.source, r.n_eval_hits, r.max_cos)
        for r in QUERIES["stream_semantic_decontaminate"](spark, SF).collect()
    }
    assert batch == stream and batch


def test_tau_sweep_consistent_with_family(spark):
    """Monotone in tau, total on the spine, and the tau=0.3 row must agree
    exactly with the per-source rate report and the purge plan (shared
    pair relation, same threshold)."""
    from chainhouse_spark.queries.llm_contamination import _SWEEP_TAUS, _TAU

    rows = sorted(
        QUERIES["contamination_semantic_tau_sweep"](spark, SF).collect(),
        key=lambda r: r.tau,
    )
    assert [r.tau for r in rows] == sorted(_SWEEP_TAUS)
    for lo, hi in zip(rows, rows[1:]):
        assert lo.n_eval_leaked >= hi.n_eval_leaked
        assert lo.n_train_purged >= hi.n_train_purged
    at_tau = next(r for r in rows if r.tau == _TAU)
    rate = QUERIES["contamination_semantic_cells"](spark, SF).collect()
    assert at_tau.n_eval_leaked == sum(r.n_leaked for r in rate)
    purge = QUERIES["semantic_purge_plan"](spark, SF).collect()
    assert at_tau.n_train_purged == len(purge)


def test_manifest_consistent_with_purge_plan(spark):
    """The manifest's purge accounting must agree with semantic_purge_plan
    row-for-row (one plan row per purged train doc), and per-source
    in/out/purged must partition."""
    manifest = QUERIES["semantic_decontaminate_manifest"](spark, SF).collect()
    purge = QUERIES["semantic_purge_plan"](spark, SF).collect()
    assert sum(r.n_purged for r in manifest) == len(purge)
    for r in manifest:
        assert r.n_docs_in == r.n_docs_out + r.n_purged
        assert r.checksum is not None


def test_nearest_cos_at_least_tau(spark):
    from chainhouse_spark.queries.llm_contamination import _TAU

    for r in QUERIES["contamination_semantic_nearest"](spark, SF).collect():
        assert r.cos_sim >= _TAU


# --- semantic_dedup_ivf_cells (VERDICT r11 task 4): the trained-cell swap
# is pinned against GLOBAL ground truth and against the sign-LSH variant's
# report pipeline — invariants no cell assignment wobble can break. ---


def test_ivf_dedup_invariants_hold(spark):
    rows = QUERIES["semantic_dedup_ivf_cells"](spark, SF).collect()
    assert rows
    for r in rows:
        assert r.totals_ok and r.dropped_valid and r.nontrivial_ok


def test_ivf_dedup_dropped_subset_of_global_neighbors(spark):
    """Cells only RESTRICT candidate generation: any doc the IVF variant
    drops must have >= 1 cosine-{0.2} neighbor in the UNRESTRICTED pair
    graph, and any globally isolated doc must be kept — true for every
    possible cell assignment, so k-means float wobble cannot flake this."""
    from pyspark.sql import functions as F

    from chainhouse_spark.functions.vector import cosine_sql
    from chainhouse_spark.operators.components import connected_components_star
    from chainhouse_spark.operators.ivf import assign_cells
    from chainhouse_spark.operators.similarity import embedding_near_pairs
    from chainhouse_spark.queries.llm_contamination import _IVF_TAU
    from chainhouse_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    assigned, _ = assign_cells(emb, n_cells=16, n_iter=4)
    pairs = embedding_near_pairs(
        assigned, block_col="cell", threshold=_IVF_TAU
    ).select("vec_a", "vec_b")
    clusters = connected_components_star(pairs, src="vec_a", dst="vec_b")
    dropped = {
        r.node
        for r in clusters.filter(F.col("node") != F.col("cluster_id")).collect()
    }
    assert dropped, "IVF cells produced zero drops at sf0.001"

    a = emb.select(F.col("vec_id").alias("ia"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"))
    global_nbr = {
        r.ia
        for r in a.join(b, F.col("ia") != F.col("ib"))
        .filter(F.expr(cosine_sql("va", "vb")) >= _IVF_TAU)
        .select("ia")
        .distinct()
        .collect()
    }
    assert dropped <= global_nbr, dropped - global_nbr


def test_ivf_report_schema_matches_sign_lsh_variant(spark):
    """The docstring claim semantic_dedup_ivf_cells exists to prove: the
    report pipeline is cell-source-agnostic, so swapping the cell column
    yields the identical per-source report schema as semantic_dedup_cells
    (before the IVF query's invariant projection)."""
    from pyspark.sql import functions as F

    from chainhouse_spark.functions.vector import sign_bucket
    from chainhouse_spark.operators.components import connected_components_star
    from chainhouse_spark.operators.ivf import assign_cells
    from chainhouse_spark.operators.similarity import embedding_near_pairs
    from chainhouse_spark.queries.llm_contamination import _IVF_TAU
    from chainhouse_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    docs = load_table(spark, sf, "documents").select(
        F.col("doc_id").alias("vec_id"), "source"
    )

    def report(cells_df):
        pairs = embedding_near_pairs(
            cells_df, block_col="cell", threshold=_IVF_TAU
        ).select("vec_a", "vec_b")
        cl = connected_components_star(pairs, src="vec_a", dst="vec_b")
        dr = cl.filter(F.col("node") != F.col("cluster_id")).select(
            F.col("node").alias("vec_id"), F.lit(1).alias("is_dropped")
        )
        return (
            emb.select("vec_id")
            .join(docs, "vec_id")
            .join(dr, "vec_id", "left")
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
        )

    ivf_cells, _ = assign_cells(emb, n_cells=16, n_iter=4)
    lsh_cells = emb.withColumn("cell", sign_bucket("embedding", nbits=6))
    r_ivf, r_lsh = report(ivf_cells), report(lsh_cells)
    assert r_ivf.schema == r_lsh.schema
    # and both reports partition the same corpus
    for rep in (r_ivf, r_lsh):
        tot = rep.agg(
            F.sum("n_vecs").alias("v"),
            F.sum("n_kept").alias("k"),
            F.sum("n_dropped").alias("d"),
        ).collect()[0]
        assert tot.v == tot.k + tot.d == 500
