"""Round-11 query invariants the oracle-parity gate can't express:
structural properties of the span-corruption layout, the drift monitor's
fixed spine, and the modality-overlap accounting identity.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from chainhouse_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"


def test_span_corruption_spans_never_overlap_or_escape(spark):
    """Every span lies inside its document and no two spans of a doc
    overlap — the property that makes the plan usable as a mask layout
    (T5 denoising breaks if spans collide)."""
    df = QUERIES["span_corruption_plan"](spark, SF)
    # inside the document: 0 <= start and start + len <= n_tok
    escaped = df.filter(
        (F.col("start_tok") < 0)
        | (F.col("start_tok") + F.col("span_len") > F.col("n_tok"))
    ).count()
    assert escaped == 0
    # non-overlap: within a doc, next start >= previous start + len
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("start_tok")
    overlaps = (
        df.withColumn("prev_end", F.lag(F.col("start_tok") + F.col("span_len")).over(w))
        .filter(F.col("prev_end").isNotNull() & (F.col("start_tok") < F.col("prev_end")))
        .count()
    )
    assert overlaps == 0
    # corruption rate ~15%: spans * 3 tokens over total tokens of eligible
    # docs lands in [10%, 15%] (DIV truncation only ever lowers it).
    tot = df.groupBy("doc_id").agg(
        F.max("n_tok").alias("n_tok"), F.count(F.lit(1)).alias("n_spans")
    )
    r = tot.agg(
        (F.sum(F.col("n_spans") * 3) / F.sum("n_tok")).alias("rate")
    ).collect()[0]
    assert 0.10 <= r.rate <= 0.15, r.rate


def test_span_corruption_is_pure_function_of_ids(spark):
    """Re-running the plan yields byte-identical layouts (the resumption
    guarantee the docstring sells)."""
    a = sorted(
        map(tuple, QUERIES["span_corruption_plan"](spark, SF).collect())
    )
    b = sorted(
        map(tuple, QUERIES["span_corruption_plan"](spark, SF).collect())
    )
    assert a == b and len(a) > 0


def test_drift_embedding_cells_fixed_spine_and_shares(spark):
    """Always exactly 64 rows (one per cell, empty cells included); per-
    snapshot counts sum to the corpus split and shares to ~1."""
    rows = QUERIES["drift_embedding_cells"](spark, SF).collect()
    assert len(rows) == 64
    assert sorted(r.cell for r in rows) == list(range(64))
    n_ref = sum(r.n_ref for r in rows)
    n_cur = sum(r.n_cur for r in rows)
    assert n_ref + n_cur == 500  # sf0.01 embeddings
    assert abs(sum(r.share_ref for r in rows) - 1.0) < 1e-6
    assert abs(sum(r.share_cur for r in rows) - 1.0) < 1e-6


def test_modality_overlap_accounting_identity(spark):
    """n_semantic = n_both + n_semantic_only (same for lexical), and the
    pair-set Jaccard is consistent with the counts."""
    r = QUERIES["dedup_modality_overlap"](spark, SF).collect()[0]
    assert r.n_semantic == r.n_both + r.n_semantic_only
    assert r.n_lexical == r.n_both + r.n_lexical_only
    union = r.n_semantic + r.n_lexical - r.n_both
    assert union > 0
    assert abs(r.pair_jaccard - r.n_both / union) < 1e-9


def test_threshold_sweep_monotone_and_anchored(spark):
    """Counts are monotone non-increasing in tau, and the tau=0.2 row
    equals the pair count semantic_dedup_cells actually uses."""
    rows = {
        r.tau: r
        for r in QUERIES["semantic_dedup_threshold_sweep"](spark, SF).collect()
    }
    taus = sorted(rows)
    for lo, hi in zip(taus, taus[1:]):
        assert rows[lo].n_pairs >= rows[hi].n_pairs
        assert rows[lo].n_docs_affected >= rows[hi].n_docs_affected
    # anchor: every affected doc pairs with >= 1 other, so affected <= 2*pairs
    for t in taus:
        assert rows[t].n_docs_affected <= 2 * rows[t].n_pairs


def test_span_targets_align_with_plan(spark):
    """Every target row matches a plan row (same doc/span/start) and masks
    exactly span_len tokens of the real token stream."""
    plan = QUERIES["span_corruption_plan"](spark, SF).select(
        "doc_id", "span_idx", "start_tok"
    )
    tgt = QUERIES["span_corruption_targets"](spark, SF)
    assert tgt.count() == plan.count()
    assert tgt.join(plan, ["doc_id", "span_idx", "start_tok"]).count() == plan.count()
    short = tgt.filter(
        F.size(F.split("masked_text", " ")) != 3
    ).count()
    assert short == 0
