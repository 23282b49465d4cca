"""Deduplication operators for large-scale training-data pipelines.

Five families, each a DataFrame -> DataFrame transform:

- exact_dedup:            hash-groupBy on (normalized) content — one shuffle.
- minhash_signatures /
  lsh_candidate_pairs:    shingle -> minhash -> band -> bucket-join. The
                          scale path: candidate generation never compares
                          all pairs; cost is ~ O(docs × shingles) + the
                          bucket joins.
- ngram_jaccard_pairs:    exact Jaccard over distinct word shingles via an
                          inverted-index self-join — the *verifier* stage
                          run after LSH candidate generation at scale (here
                          also runnable standalone at test SFs).
- simhash:                32-bit sign-sum sketch per doc + Hamming-banded
                          near-dup pairs.

All hashing is md5-derived (engine-portable) so every stage is
DuckDB-oracle-able: minhash values are minima of a Carter-Wegman family
parameterized by the digest's 32-bit words (exact BIGINT arithmetic any
engine replays), simhash bits come from digest hex digits. No Python
UDFs — every stage is built-in expressions (codegen) + shuffles on
well-distributed keys.

Reference parity note: the reference's only dedup is ClickHouse
ReplacingMergeTree eventual dedup-by-key (src/main.rs:87,122,139,156);
exact_dedup is the Spark-native strengthening of that contract
(SURVEY.md §2.4 K8), and the rest go beyond it per the north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chainhouse_spark.functions.text import fingerprint, word_shingles
from chainhouse_spark.operators.partitioning import spread

def exact_dedup(
    df: DataFrame,
    content_col: str = "text",
    id_col: str = "doc_id",
    normalized: bool = False,
) -> DataFrame:
    """Exact duplicate groups: one row per distinct content, keeping the
    smallest id as the canonical representative.

    One shuffle on the md5 of content (never the content itself — at 100 TB
    shuffling full documents to compare them is the classic mistake; 16-byte
    keys shuffle instead).
    """
    key: Column = fingerprint(content_col) if normalized else F.md5(F.col(content_col))
    return (
        df.select(key.alias("content_key"), F.col(id_col))
        .groupBy("content_key")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# Largest 32-bit prime — the Carter-Wegman modulus for the MinHash family.
MINHASH_PRIME = 4294967291


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_words: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: array of `num_hashes` minima of a
    Carter-Wegman hash family over the doc's distinct word shingles.

    ONE md5 per shingle, not one per (seed, shingle): the digest's first
    two 32-bit words (h1, h2) parameterize the whole family as
    hash_i = (h1 + i*h2) mod p (p = largest 32-bit prime) — the standard
    universal-hashing construction, ~num_hashes x fewer digest
    computations, and every op is exact BIGINT arithmetic both engines
    reproduce (h1 + 15*h2 < 2^36, the oracle replays the identical fold).

    Single pass: each shingle row carries an array of its `num_hashes`
    hashes (transform over a literal sequence — no seed cross-join, no
    extra shuffle), then one groupBy(id) folds element-wise minima.
    Docs with < shingle_words tokens produce no signature (exact dedup is
    their path; pinned in tests/test_edge_cases.py).
    """
    # No .distinct() on shingles: MIN over a multiset equals MIN over its
    # set, so dedup would only add a shuffle. Each seed's minimum is its own
    # algebraic aggregate -> map-side partial combine reduces the shuffle to
    # (docs x num_hashes) short keys instead of the full hashed corpus
    # (collect_list has no partial aggregation and ships every hash).
    sh = (
        spread(df, id_col)
        .select(
            F.col(id_col),
            F.explode(word_shingles(text_col, shingle_words)).alias("shingle"),
        )
        .withColumn("m", F.md5("shingle"))
        .withColumn("h1", F.expr("CAST(conv(substring(m, 1, 8), 16, 10) AS BIGINT)"))
        .withColumn("h2", F.expr("CAST(conv(substring(m, 9, 8), 16, 10) AS BIGINT)"))
        .withColumn(
            "hs",
            F.expr(
                f"transform(sequence(0, {num_hashes - 1}), "
                f"s -> (h1 + CAST(s AS BIGINT) * h2) % {MINHASH_PRIME})"
            ),
        )
    )
    mins = [F.min(F.element_at("hs", i + 1)).alias(f"m{i}") for i in range(num_hashes)]
    return (
        sh.groupBy(id_col)
        .agg(*mins)
        .select(id_col, F.array(*[f"m{i}" for i in range(num_hashes)]).alias("sig"))
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    max_bucket: int = 512,
    delta_col: str | None = None,
) -> DataFrame:
    """LSH banding: equal band-hash in any band -> candidate pair, with the
    signature-estimated Jaccard attached.

    Pairs are generated by grouping on (band_idx, md5-of-band) and expanding
    each bucket's sorted member list in place — NOT a bucket self-join: a
    self-join would recompute the whole signature pipeline for both sides
    (identical shuffle subplans are materialized per-stage, not shared), so
    the groupBy form halves the work and uses a single shuffle on a small,
    uniformly distributed key. Never all-pairs.

    Adversarial-bucket cap: a bucket of B docs normally expands to
    B(B-1)/2 pairs, so a pathological corpus (thousands of identical docs
    land the same band-hash in every band) would go quadratic. Buckets
    wider than `max_bucket` therefore fall back to a STAR expansion — every
    member pairs with the bucket's min-id anchor, B-1 pairs. That keeps
    exactly the property LSH candidates exist for downstream (duplicate-
    cluster connectivity: the verifier + connected-components stage still
    groups the whole bucket) while bounding expansion linearly. Honest
    buckets (the normal corpus) sit far below the cap and are unaffected.
    The oracle for dedup_minhash_lsh assumes full expansion, which holds
    because testdata buckets are orders of magnitude under the cap;
    tests/test_properties.py pins the 10k-identical-docs bound.

    Incremental mode (`delta_col` = name of a boolean column marking the
    new/changed docs): only pairs INVOLVING a delta doc are produced — the
    daily-increment shape where yesterday's corpus is already deduped and
    re-expanding old×old pairs would redo the whole job. Buckets with no
    delta member are dropped BEFORE expansion (the dominant saving: at a
    steady state almost every bucket is all-old), and within a surviving
    bucket the expansion keeps only delta-involving pairs. Identical to
    filtering the full candidate set on "a or b is delta" — pinned by
    tests — at a fraction of the expansion and shuffle.
    """
    rows_per_band = num_hashes // bands
    item_fields = [F.col(id_col).alias("id"), F.col("sig").alias("sig")]
    keep_cols = [id_col, "sig"]
    if delta_col is not None:
        item_fields.append(F.col(delta_col).alias("d"))
        keep_cols.append(delta_col)
    banded = sig_df.select(
        *[F.col(c) for c in keep_cols],
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b AS band, md5(array_join(transform(slice(sig, "
                f"b * {rows_per_band} + 1, {rows_per_band}), x -> CAST(x AS STRING)), "
                f"',')) AS bh))"
            )
        ).alias("bb"),
    ).select(*keep_cols, F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.array_sort(F.collect_list(F.struct(*item_fields))).alias("items"))
        .filter(F.size("items") > 1)
    )
    if delta_col is not None:
        buckets = buckets.filter(F.expr("exists(items, it -> it.d)"))
    pair_struct = "struct(a.id AS doc_a, b.id AS doc_b, a.sig AS sig_a, b.sig AS sig_b"
    star_struct = ("struct(items[0].id AS doc_a, b.id AS doc_b, "
                   "items[0].sig AS sig_a, b.sig AS sig_b")
    if delta_col is not None:
        pair_struct += ", (a.d OR b.d) AS keep"
        star_struct += ", (items[0].d OR b.d) AS keep"
    all_pairs = (
        "flatten(transform(items, (a, i) -> "
        "transform(slice(items, i + 2, size(items)), "
        f"b -> {pair_struct}))))"
    )
    star_pairs = f"transform(slice(items, 2, size(items)), b -> {star_struct}))"
    expansion = (
        f"CASE WHEN size(items) > {max_bucket} THEN {star_pairs} "
        f"ELSE {all_pairs} END"
    )
    if delta_col is not None:
        expansion = f"filter({expansion}, p -> p.keep)"
    # est_jaccard is computed BEFORE the cross-bucket pair dedup: it is a
    # pure function of the pair, so deduping (doc_a, doc_b, est) equals
    # deduping (doc_a, doc_b) — and the dedup exchange then carries 24
    # bytes per pair instead of two 16-element BIGINT signatures (~10x
    # less shuffle payload on the widest stage of the job).
    return (
        buckets.select(F.explode(F.expr(expansion)).alias("p"))
        .select(
            "p.doc_a",
            "p.doc_b",
            F.expr(
                f"CAST(size(filter(zip_with(p.sig_a, p.sig_b, (x, y) -> x = y),"
                f" v -> v)) AS DOUBLE) / {num_hashes}"
            ).alias("est_jaccard"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs via inverted-index self-join.

    jaccard = |A ∩ B| / (|A| + |B| − |A ∩ B|) over distinct shingle sets.
    The self-join is on the shingle (inverted index), so only docs sharing
    at least one shingle ever meet — at scale, run it on LSH candidates.

    Shingles are keyed by xxhash64 (8 bytes) rather than the raw n-gram
    string — the distinct, the inverted-index exchange, and the self-join
    all carry fixed-width longs instead of ~16–60-byte strings, and the
    key is never output so no oracle has to replay it. A 64-bit hash over
    per-corpus distinct shingles makes collisions (which would perturb
    |A ∩ B| by 1) vanishingly rare; tests/test_dedup.py pins zero
    collisions on the real test corpus.
    """
    sh = _sized_shingles(df, text_col, id_col, shingle_words)
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            # n_sh is constant per doc -> min() is exact, and folding the
            # sizes into the pair aggregate avoids two extra joins against
            # (and re-computations of) the shingle subtree.
            F.min("a.n_sh").alias("n_a"),
            F.min("b.n_sh").alias("n_b"),
        )
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _sized_shingles(
    df: DataFrame, text_col: str, id_col: str, shingle_words: int
) -> DataFrame:
    """(id, shingle=xxhash64, n_sh) — each doc's distinct shingle keys with
    the doc's shingle-set size on every row.

    Built to evaluate ONCE per join side: `spread` partitions by the doc
    id, so the distinct aggregates AND the size window both run without a
    further exchange (hash(doc_id) satisfies both the (doc_id, shingle)
    grouping and the window's partitioning) — sizes come from a sort
    within already-placed partitions, not a second tokenize subtree."""
    from pyspark.sql import Window

    return (
        spread(df, id_col)
        .select(
            F.col(id_col),
            F.explode(word_shingles(text_col, shingle_words)).alias("_sh_str"),
        )
        .select(F.col(id_col), F.xxhash64("_sh_str").alias("shingle"))
        .distinct()
        .withColumn(
            "n_sh", F.count(F.lit(1)).over(Window.partitionBy(id_col))
        )
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
    threshold: float = 0.6,
) -> DataFrame:
    """Asymmetric containment near-dup pairs: containment(a -> b) =
    |shingles(a) ∩ shingles(b)| / |shingles(a)| — the quote/excerpt/superset
    detector Jaccard misses (a short doc fully contained in a long one has
    low Jaccard but containment 1.0). Broder 1997's second resemblance
    measure.

    Same inverted-index shape as ngram_jaccard_pairs — the intersection is
    computed ONCE per unordered pair, then both orientations are emitted by
    dividing by each side's shingle count (a projection, not a second
    join). At scale, run on LSH candidates like the Jaccard verifier.
    """
    sh = _sized_shingles(df, text_col, id_col, shingle_words)
    a, b = sh.alias("a"), sh.alias("b")
    sized = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("lo"), F.col(f"b.{id_col}").alias("hi")
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.min("a.n_sh").alias("n_lo"),
            F.min("b.n_sh").alias("n_hi"),
        )
    )
    fwd = sized.select(
        F.col("lo").alias("doc_a"),
        F.col("hi").alias("doc_b"),
        (F.col("n_common").cast("double") / F.col("n_lo")).alias("containment"),
    )
    rev = sized.select(
        F.col("hi").alias("doc_a"),
        F.col("lo").alias("doc_b"),
        (F.col("n_common").cast("double") / F.col("n_hi")).alias("containment"),
    )
    return fwd.unionAll(rev).filter(F.col("containment") >= threshold)


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    nbits: int = 32,
) -> DataFrame:
    """32-bit SimHash per doc over distinct tokens.

    Bit j of md5(token) is bit j%4 of hex digit j/4 (the definition the
    DuckDB oracle replays digit-by-digit). Here the first nbits/4 hex
    digits are decoded ONCE per token with a single conv(hex,16,10) into a
    bigint v — digit p (1-based) lands at bits [4*(nbits/4-p), ...+3] of v,
    so vote j is one integer shift/mask: (v >> (4*(nbits/4-1 - j/4) + j%4)) & 1.

    The nbits vote tallies are nbits conditional-sum aggregates over the
    token rows — ONE groupBy(id) shuffle carrying nbits ints per doc, no
    per-bit row explosion (the earlier tokens × nbits explode pushed 32×
    the rows through two shuffles for the same tallies), and one string
    decode per token instead of nbits. All codegen, linear in corpus size.
    """
    if nbits % 4:
        raise ValueError(f"nbits must be a multiple of 4 (hex digits), got {nbits}")
    ndigits = nbits // 4
    tok = spread(df, id_col).select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    ).withColumn(
        "v", F.expr(f"CAST(conv(substring(md5(tok), 1, {ndigits}), 16, 10) AS BIGINT)")
    )

    def vote(j: int):
        shift = 4 * (ndigits - 1 - j // 4) + (j % 4)
        return F.expr(f"CASE WHEN (shiftright(v, {shift}) & 1) = 1 THEN 1 ELSE -1 END")

    tallies = tok.groupBy(id_col).agg(
        *[F.sum(vote(j)).alias(f"s{j}") for j in range(nbits)]
    )
    sketch = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN CAST({1 << j} AS BIGINT) ELSE CAST(0 AS BIGINT) END)"
        for j in range(nbits)
    )
    return tallies.select(F.col(id_col), F.expr(sketch).alias("simhash"))


def simhash_near_pairs(
    sim_df: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 6,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, banded on the sketch's
    4 bytes: pairs agreeing on ≥1 byte are candidates (pigeonhole covers
    hamming ≤ 6 with high probability for 32-bit sketches), then the exact
    bit_count filter applies. Avoids the all-pairs XOR."""
    banded = sim_df.select(
        F.col(id_col),
        F.col("simhash"),
        F.explode(
            F.expr(
                "transform(sequence(0, 3), "
                "b -> struct(b AS band, (shiftright(simhash, b * 8) & 255) AS bv))"
            )
        ).alias("bb"),
    ).select(id_col, "simhash", F.col("bb.band").alias("band"), F.col("bb.bv").alias("bv"))
    # groupBy-bucket pair expansion, not a self-join — computes the sketch
    # pipeline once (see lsh_candidate_pairs for the rationale).
    buckets = (
        banded.groupBy("band", "bv")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col(id_col).alias("id"), F.col("simhash").alias("sh")))
            ).alias("items")
        )
        .filter(F.size("items") > 1)
    )
    return (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(items, (a, i) -> "
                    "transform(slice(items, i + 2, size(items)), "
                    "b -> struct(a.id AS doc_a, b.id AS doc_b, "
                    "CAST(bit_count(a.sh ^ b.sh) AS INT) AS hamming))))"
                )
            ).alias("p")
        )
        .select("p.*")
        # hamming is functionally determined by the pair, so filtering before
        # dropDuplicates is equivalent and shrinks the dedup shuffle.
        .filter(F.col("hamming") <= max_hamming)
        .dropDuplicates(["doc_a", "doc_b"])
    )
