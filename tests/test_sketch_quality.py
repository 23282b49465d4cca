"""Statistical quality of the approximate operators, pinned as tests:
a sketch that is cross-engine-deterministic but WRONG would still pass the
oracle — these tests check the estimates actually track the exact values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_minhash_estimate_tracks_exact_jaccard(spark):
    """For every LSH candidate pair, |est_jaccard - exact_jaccard| must be
    within the k=16 signature's sampling error (std ≈ sqrt(j(1-j)/16) ≤
    0.125; 4 sigma + discretization == 0.55 absolute bound, and the MEAN
    absolute error must be far tighter)."""
    from chainhouse_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        ngram_jaccard_pairs,
    )
    from chainhouse_spark.tables import load_table

    docs = load_table(spark, SF, "documents")
    sigs = minhash_signatures(docs)
    cand = lsh_candidate_pairs(sigs)
    exact = ngram_jaccard_pairs(docs, threshold=0.0).withColumnRenamed(
        "jaccard", "exact_j"
    )
    joined = cand.join(exact, ["doc_a", "doc_b"]).select(
        F.abs(F.col("est_jaccard") - F.col("exact_j")).alias("err")
    )
    stats = joined.agg(
        F.max("err").alias("max_err"), F.avg("err").alias("mean_err"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert stats.n > 10  # the corpus actually produces candidates
    assert stats.max_err <= 0.55
    assert stats.mean_err <= 0.15


def test_lsh_topk_recall_tradeoff(spark):
    """Sign-bit LSH recall vs bruteforce: measured 0.38 at nbits=2 on this
    corpus, decaying as buckets shrink — pin the floor at the wide setting
    AND the monotone candidates-for-recall trade so a silent bucketing bug
    (recall collapse at wide buckets) fails loudly. Production picks
    multi-probe or IVF (operators/ivf.py, recall pinned in test_ivf.py)
    when single-probe recall is insufficient."""
    from chainhouse_spark.operators.similarity import brute_force_topk, lsh_topk
    from chainhouse_spark.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.cand_id) for r in brute_force_topk(emb, q, k=10).collect()
    }

    def recall(nbits):
        approx = {
            (r.query_id, r.cand_id)
            for r in lsh_topk(emb, q, k=10, nbits=nbits).collect()
        }
        return len(exact & approx) / len(exact)

    r2, r8 = recall(2), recall(8)
    assert r2 >= 0.25, f"wide-bucket LSH recall degraded: {r2:.2f}"
    assert r2 >= r8  # fewer bits -> bigger buckets -> never worse recall


def test_simhash_hamming_correlates_with_jaccard(spark):
    """SimHash must separate true near-dups from the background: 0.8-jaccard
    pairs measured at mean Hamming 3.0 / max 6 on this corpus vs ~7.8 for
    random pairs — which also validates the default max_hamming=6 band in
    simhash_near_pairs (it captures exactly these pairs)."""
    import statistics

    from chainhouse_spark.operators.dedup import ngram_jaccard_pairs, simhash
    from chainhouse_spark.tables import load_table

    docs = load_table(spark, SF, "documents")
    sh = simhash(docs)
    near = ngram_jaccard_pairs(docs, threshold=0.8).select("doc_a", "doc_b")
    a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("hb"))
    near_h = [
        r.h
        for r in near.join(a, "doc_a").join(b, "doc_b")
        .select(F.expr("bit_count(ha ^ hb)").alias("h"))
        .collect()
    ]
    assert len(near_h) > 10
    assert max(near_h) <= 6  # the default near-pair band catches all of them
    rand_h = [
        r.h
        for r in sh.limit(50)
        .crossJoin(sh.limit(50).select(F.col("doc_id").alias("d2"), F.col("simhash").alias("h2")))
        .filter("doc_id < d2")
        .select(F.expr("bit_count(simhash ^ h2)").alias("h"))
        .collect()
    ]
    assert statistics.mean(near_h) < statistics.mean(rand_h) - 2


def test_multiprobe_recall_dominates_single_probe(spark):
    """Multi-probe at the SAME nbits must never lose to single-probe and
    must deliver a usable floor at nbits=8 (single-probe measured 0.00
    there — the whole point of probing the 1-flip neighborhood)."""
    from chainhouse_spark.operators.similarity import (
        brute_force_topk,
        lsh_multiprobe_topk,
        lsh_topk,
    )
    from chainhouse_spark.tables import load_table

    emb = load_table(spark, SF, "embeddings")
    q = emb.filter(F.col("vec_id") < 5)
    exact = {
        (r.query_id, r.cand_id) for r in brute_force_topk(emb, q, k=10).collect()
    }
    single = {
        (r.query_id, r.cand_id) for r in lsh_topk(emb, q, k=10, nbits=8).collect()
    }
    multi = {
        (r.query_id, r.cand_id)
        for r in lsh_multiprobe_topk(emb, q, k=10, nbits=8).collect()
    }
    r_single = len(exact & single) / len(exact)
    r_multi = len(exact & multi) / len(exact)
    assert r_multi >= r_single
    assert r_multi >= 0.1, f"multiprobe recall floor broken: {r_multi:.2f}"


def test_ngram_shingle_hash_collision_free_on_corpus(spark):
    """ngram_jaccard_pairs keys its inverted index by xxhash64(shingle)
    instead of the raw string (operators/dedup.py). A 64-bit collision
    would perturb |A ∩ B| and break the string-keyed DuckDB oracle, so pin
    that the real test corpus has zero colliding shingles."""
    from chainhouse_spark.functions.text import word_shingles

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sh = docs.select(
        F.explode(word_shingles("text", 3)).alias("s")
    ).distinct()
    n_str = sh.count()
    n_hash = sh.select(F.xxhash64("s")).distinct().count()
    assert n_str == n_hash


def test_hll_registers_accuracy_and_merge(spark):
    # The explicit-register HLL: (1) the corrected estimate is within its
    # flag bound on real data (the oracle replays the same boolean);
    # (2) registers merge by re-MAX — building one sketch over A∪B equals
    # merging the A and B sketches, the property that lets per-day sketches
    # re-aggregate without rescanning rows.
    from chainhouse_spark.queries import QUERIES

    sf = "/root/testdata/sf0.001"
    out = QUERIES["sketch_hll_registers"](spark, sf).collect()
    assert out and all(r["within_20pct"] for r in out)

    from chainhouse_spark.queries.sketches import _HLL_BUCKET, _HLL_RHO
    from chainhouse_spark.tables import load_table

    d = (
        load_table(spark, sf, "events")
        .select(F.md5(F.col("user_id").cast("string")).alias("h"),
                (F.col("event_id") % 2).alias("half"))
        .selectExpr("half", f"{_HLL_BUCKET} AS bucket", f"{_HLL_RHO} AS rho")
    )
    whole = d.groupBy("bucket").agg(F.max("rho").alias("rho"))
    halves = d.groupBy("half", "bucket").agg(F.max("rho").alias("rho"))
    merged = halves.groupBy("bucket").agg(F.max("rho").alias("rho"))
    assert sorted(map(tuple, whole.collect())) == sorted(
        map(tuple, merged.collect())
    )
