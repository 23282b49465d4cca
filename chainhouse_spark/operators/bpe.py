"""Distributed BPE tokenizer training and encoding.

The reference delegates all text analytics to its warehouse
(`/root/reference/src/main.rs:52-163` provisions tables and nothing more);
a training-data engine needs the tokenizer-training loop itself. This is
the standard corpus-count BPE formulation (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") expressed
Spark-first:

- The corpus is first collapsed to a DISTINCT-WORD FREQUENCY table —
  |vocab| rows, not |corpus| rows. Every later pass runs over the word
  table weighted by word count, which is how BPE trainers scale: at
  100 TB the distinct-word table is millions of rows, not trillions.
- Each merge round is ONE bounded shuffle: adjacent-pair counts
  (map-side-combined on a bounded symbol-pair key space) followed by a
  TakeOrdered(1) argmax with a total-order tie-break (count DESC, pair
  ASC). The chosen merge is applied map-only via a literal string
  replace over the padded symbol representation.
- The symbol state of a word is a SPACE-PADDED STRING (' h e l l o '),
  so applying merge ('l', 'l') is `replace(repr, ' l l ', ' ll ')` —
  a JVM-side literal (non-regex) replace, no Python in any hot path.

Merge-application semantics: leftmost non-overlapping, as implemented by
both Spark's `replace` and DuckDB's `replace` (' a b a b ' merges once
per scan because the shared boundary space is consumed — verified
identical in both engines; the oracle replays the exact same fold).
Greedy-longest-match BPE differs only on degenerate runs of the merged
pair and is deterministic the same way in both engines here.

The trainer drives rounds from the driver (one 1-row collect per round —
the cluster_kmeans_summary precedent for iterative algorithms); corpus
state never leaves the executors.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def word_frequency_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, wcnt): distinct whitespace tokens with corpus frequencies —
    the scale-defining reduction (all later passes are per distinct word,
    weighted)."""
    return (
        docs.select(F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wcnt"))
    )


def char_repr(col: str | Column) -> Column:
    """Space-padded initial symbol string of a word: 'he' -> ' h e '."""
    c = F.col(col) if isinstance(col, str) else col
    chars = F.expr(
        "transform(sequence(1, length(word)), i -> substring(word, i, 1))"
    ) if isinstance(col, str) and col == "word" else None
    if chars is None:
        raise ValueError("char_repr expects the column name 'word'")
    return F.concat(F.lit(" "), F.array_join(chars, " "), F.lit(" "))


_PAIRS_SQL = (
    "CASE WHEN size(__toks) >= 2 THEN "
    "transform(sequence(1, size(__toks) - 1), "
    "i -> concat(element_at(__toks, i), ' ', element_at(__toks, i + 1))) "
    "ELSE array() END"
)


def _with_pairs(wf: DataFrame) -> DataFrame:
    # sequence(1, 0) REVERSES in Spark, so the size >= 2 guard is
    # load-bearing for single-symbol words.
    return wf.withColumn(
        "__toks", F.split(F.trim(F.col("repr")), " ")
    ).withColumn("pair", F.explode(F.expr(_PAIRS_SQL)))


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> list[tuple[int, str, str, int]]:
    """Learn `n_merges` BPE merges; returns [(rank, pair, merged, count)].

    Ties break on (count DESC, pair ASC) — a total order, so the merge
    table is deterministic and cross-engine reproducible.
    """
    wf = word_frequency_table(docs, text_col).withColumn(
        "repr", char_repr("word")
    )
    wf = wf.persist()
    try:
        merges: list[tuple[int, str, str, int]] = []
        for rank in range(1, n_merges + 1):
            best = (
                _with_pairs(wf)
                .groupBy("pair")
                .agg(F.sum("wcnt").alias("cnt"))
                .orderBy(F.desc("cnt"), F.asc("pair"))
                .limit(1)
                .collect()
            )
            if not best:
                break
            pair, cnt = best[0]["pair"], int(best[0]["cnt"])
            merged = pair.replace(" ", "")
            merges.append((rank, pair, merged, cnt))
            # map-only literal replace; the padded spaces scope the match
            # to whole symbols. F.replace is literal (never regex), so
            # pair content cannot inject patterns.
            wf = wf.withColumn(
                "repr",
                F.replace(
                    F.col("repr"),
                    F.lit(f" {pair} "),
                    F.lit(f" {merged} "),
                ),
            )
        return merges
    finally:
        wf.unpersist()


def apply_merges(reprs: DataFrame, merges: list[tuple[int, str, str, int]],
                 repr_col: str = "repr") -> DataFrame:
    """Apply a learned merge table to padded symbol strings, in rank
    order — map-only (the merge table is a constant folded into the
    plan, the distributed analogue of a broadcast tokenizer)."""
    out = reprs
    for _, pair, merged, _ in merges:
        out = out.withColumn(
            repr_col,
            F.replace(F.col(repr_col), F.lit(f" {pair} "), F.lit(f" {merged} ")),
        )
    return out


def bpe_encode_stats(
    docs: DataFrame,
    merges: list[tuple[int, str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document symbol statistics under a learned merge table:
    (id, n_words, n_chars, n_symbols, compression). Tokenize + merge are
    map-only; the one shuffle is the per-doc aggregation."""
    words = (
        docs.select(F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("word"))
        .filter(F.col("word") != "")
        .withColumn("repr", char_repr("word"))
    )
    enc = apply_merges(words, merges).withColumn(
        "n_sym", F.size(F.split(F.trim(F.col("repr")), " "))
    )
    return enc.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_words"),
        F.sum(F.length("word")).alias("n_chars"),
        F.sum("n_sym").alias("n_symbols"),
        (
            F.sum(F.length("word")).cast("double")
            / F.sum("n_sym").cast("double")
        ).alias("compression"),
    )
