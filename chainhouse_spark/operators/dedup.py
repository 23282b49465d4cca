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

All hashing is md5 (engine-portable) so every stage is DuckDB-oracle-able:
minhash values are *lexicographic minima of md5 hex strings*, which
reproduce exactly anywhere md5 exists. No Python UDFs — every stage is
built-in expressions (codegen) + shuffles on well-distributed keys.

Reference parity note: the reference's only dedup is ClickHouse
ReplacingMergeTree eventual dedup-by-key (src/main.rs:87,122,139,156);
exact_dedup is the Spark-native strengthening of that contract
(SURVEY.md §2.4 K8), and the rest go beyond it per the north star.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from chainhouse_spark.functions.text import fingerprint, word_shingles

# Lexicographic max for a 32-hex-char md5 string — fold seed for MIN.
_MD5_MAX = "g" * 32


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


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    shingle_words: int = 3,
) -> DataFrame:
    """Per-doc MinHash signature: array of `num_hashes` minima of
    md5(seed ':' shingle) over the doc's distinct word shingles.

    Single pass: each shingle row carries an array of its `num_hashes`
    hashes (transform over a literal sequence — no seed cross-join, no
    extra shuffle), then one groupBy(id) folds element-wise minima.
    Docs with < shingle_words tokens get an all-sentinel signature.
    """
    sh = (
        df.select(
            F.col(id_col), F.explode(word_shingles(text_col, shingle_words)).alias("shingle")
        )
        .distinct()
        .withColumn(
            "hs",
            F.expr(
                f"transform(sequence(0, {num_hashes - 1}), "
                f"s -> md5(concat(CAST(s AS STRING), ':', shingle)))"
            ),
        )
    )
    init = f"transform(sequence(0, {num_hashes - 1}), i -> '{_MD5_MAX}')"
    return sh.groupBy(id_col).agg(
        F.expr(
            f"aggregate(collect_list(hs), {init}, "
            f"(acc, h) -> zip_with(acc, h, (a, b) -> least(a, b)))"
        ).alias("sig")
    )


def lsh_candidate_pairs(
    sig_df: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """LSH banding: equal band-hash in any band -> candidate pair, with the
    signature-estimated Jaccard attached.

    The join key is (band_idx, md5-of-band) — small, uniformly distributed.
    Pair generation is a bucket self-join, never all-pairs.
    """
    rows_per_band = num_hashes // bands
    banded = sig_df.select(
        F.col(id_col),
        F.col("sig"),
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}), "
                f"b -> struct(b AS band, md5(array_join(slice(sig, b * {rows_per_band} + 1, "
                f"{rows_per_band}), ',')) AS bh))"
            )
        ).alias("bb"),
    ).select(id_col, "sig", F.col("bb.band").alias("band"), F.col("bb.bh").alias("bh"))

    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.col("a.sig").alias("sig_a"),
            F.col("b.sig").alias("sig_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    return pairs.select(
        "doc_a",
        "doc_b",
        F.expr(
            f"CAST(size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), v -> v)) AS DOUBLE)"
            f" / {num_hashes}"
        ).alias("est_jaccard"),
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
    """
    sh = df.select(
        F.col(id_col), F.explode(word_shingles(text_col, shingle_words)).alias("shingle")
    ).distinct()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    a, b = sh.alias("a"), sh.alias("b")
    common = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("doc_a"), F.col(f"b.{id_col}").alias("doc_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def simhash(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    nbits: int = 32,
) -> DataFrame:
    """32-bit SimHash per doc over distinct tokens.

    Bit j of md5(token) is extracted from hex digit j/4 (value via
    instr('0123456789abcdef', ch) - 1 — engine-portable); each token votes
    ±1 per bit; the sketch sets bits with positive vote sums.
    Explode is tokens × nbits rows, all codegen, one groupBy(id, bit) +
    one groupBy(id) — linear in corpus size.
    """
    tok = df.select(
        F.col(id_col),
        F.explode(F.array_distinct(F.split(F.col(text_col), " "))).alias("tok"),
    ).withColumn("h", F.md5(F.col("tok")))
    bits = tok.select(
        F.col(id_col),
        F.col("h"),
        F.explode(F.expr(f"sequence(0, {nbits - 1})")).alias("j"),
    ).withColumn(
        "vote",
        F.expr(
            "CASE WHEN (shiftright(instr('0123456789abcdef', substring(h, CAST(j / 4 AS INT) + 1, 1)) - 1, "
            "j % 4) & 1) = 1 THEN 1 ELSE -1 END"
        ),
    )
    bitsums = bits.groupBy(id_col, "j").agg(F.sum("vote").alias("s"))
    return bitsums.groupBy(id_col).agg(
        F.sum(
            F.expr("CASE WHEN s > 0 THEN CAST(shiftleft(CAST(1 AS BIGINT), j) AS BIGINT) ELSE 0 END")
        ).alias("simhash")
    )


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
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("doc_a"),
            F.col(f"b.{id_col}").alias("doc_b"),
            F.expr("CAST(bit_count(a.simhash ^ b.simhash) AS INT)").alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= max_hamming)
    )
