"""Bloom-filter n-gram decontamination.

`decontaminate_against_testset` (queries/llm_corpus.py) does the exact
thing: a semi-join of training shingle hashes against the held-out set's
shingle hashes. Exact, but the join's build side grows with the test set.
This module is the constant-memory variant every large pipeline actually
deploys: hash each held-out shingle to k positions in an m-bit Bloom
filter, broadcast the filter (m bits, fixed — here 64 KiB regardless of
test-set size), and flag a training shingle when ALL k of its positions
are set. False positives are possible by construction (that is the Bloom
trade); false negatives are not — no contaminated shingle escapes.

Determinism contract: positions come from the same Carter-Wegman family as
operators/dedup.py — one md5 per shingle, h1/h2 = the digest's first two
32-bit words, pos_j = (h1 + j*h2) mod m. Every step is exact integer
arithmetic, so a DuckDB oracle replays the filter (including its false
positives) bit-for-bit.

Representation note: the broadcast side is the filter's SET-BIT POSITIONS
(distinct ints ≤ m), not a packed bitset — semantically identical, at most
m rows (65536 here ≈ 512 KiB broadcast), and it keeps the probe a plain
broadcast-hash-join that Catalyst plans with zero custom code. A packed
array<bigint> bitset would save ~8× broadcast bytes at the cost of an
opaque lookup expression; at m = 2^16..2^24 the join form is the better
Spark citizen (and either way nothing corpus-sized moves).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from chainhouse_spark.functions.text import word_shingles
from chainhouse_spark.operators.partitioning import spread

BLOOM_BITS = 1 << 16  # m: filter size in bits
BLOOM_HASHES = 3  # k: positions per key


def _positions_cols():
    """Columns: md5-derived h1/h2 -> array of k filter positions."""
    return [
        F.expr("CAST(conv(substring(m, 1, 8), 16, 10) AS BIGINT)").alias("h1"),
        F.expr("CAST(conv(substring(m, 9, 8), 16, 10) AS BIGINT)").alias("h2"),
    ]


def shingle_positions(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
) -> DataFrame:
    """(id, shingle-md5, pos) — one row per (distinct shingle, hash fn)."""
    return (
        spread(df, id_col)
        .select(
            F.col(id_col),
            F.explode(word_shingles(text_col, shingle_words)).alias("shingle"),
        )
        .select(F.col(id_col), F.md5("shingle").alias("m"))
        .distinct()
        .select(
            F.col(id_col),
            F.col("m"),
            *_positions_cols(),
        )
        .select(
            F.col(id_col),
            F.col("m"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, {BLOOM_HASHES - 1}), "
                    f"j -> CAST((h1 + CAST(j AS BIGINT) * h2) % {BLOOM_BITS} AS INT))"
                )
            ).alias("pos"),
        )
    )


def bloom_decontaminate(
    train: DataFrame,
    testset: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_words: int = 3,
) -> DataFrame:
    """Training docs with ≥1 Bloom-positive shingle: (id, n_bloom_hits).

    Build: distinct set-bit positions of the test set's shingles (≤ m rows,
    broadcast). Probe: a training shingle is positive iff all k of its
    position rows find a partner — COUNT of joined rows == k, because the
    build side is distinct and the probe rows are the shingle's k (possibly
    repeated) positions. One broadcast join + two cheap aggregations;
    nothing test-set-sized or corpus-sized shuffles.
    """
    bits = (
        shingle_positions(testset, text_col, id_col, shingle_words)
        .select("pos")
        .distinct()
    )
    probe = shingle_positions(train, text_col, id_col, shingle_words)
    return (
        probe.join(F.broadcast(bits), "pos")
        .groupBy(id_col, "m")
        .agg(F.count(F.lit(1)).alias("n_set"))
        .filter(F.col("n_set") == BLOOM_HASHES)
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_bloom_hits"))
    )
