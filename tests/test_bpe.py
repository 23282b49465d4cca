"""BPE trainer/encoder semantics pinned on hand-computed corpora."""

from __future__ import annotations

from pyspark.sql import functions as F

from chainhouse_spark.operators.bpe import (
    apply_merges,
    bpe_encode_stats,
    bpe_train,
    char_repr,
    word_frequency_table,
)


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_word_frequency_table_weights(spark):
    wf = word_frequency_table(_docs(spark, ["low low lower", "low news"]))
    got = {r.word: r.wcnt for r in wf.collect()}
    assert got == {"low": 3, "lower": 1, "news": 1}


def test_first_merge_is_most_frequent_weighted_pair(spark):
    # 'low'x3 + 'lower' -> pair (l,o) count 4, (o,w) count 4; tie breaks
    # pair ASC -> 'l o' < 'o w'.
    merges = bpe_train(_docs(spark, ["low low lower", "low news"]), n_merges=1)
    assert merges == [(1, "l o", "lo", 4)]


def test_merge_sequence_hand_computed(spark):
    # Single word 'aaab' x2: round 1 pairs {a a:4, a b:2} -> merge 'a a'.
    # repr ' a a a b ' -> ' aa a b ' (leftmost non-overlapping).
    # Round 2 pairs {aa a:2, a b:2} -> 'a b' < 'aa a' ties at 2 -> 'a b'.
    merges = bpe_train(_docs(spark, ["aaab aaab"]), n_merges=2)
    assert merges == [(1, "a a", "aa", 4), (2, "a b", "ab", 2)]


def test_apply_merges_overlap_semantics(spark):
    # ' a a a ' merges once per scan: shared boundary space is consumed.
    df = spark.createDataFrame([(" a a a ",)], "repr string")
    out = apply_merges(df, [(1, "a a", "aa", 0)]).collect()[0].repr
    assert out == " aa a "


def test_single_char_words_produce_no_pairs(spark):
    # sequence(1, 0) reverses in Spark — the size guard must keep 1-symbol
    # words from generating phantom pairs.
    merges = bpe_train(_docs(spark, ["a b c a b"]), n_merges=1)
    assert merges == []


def test_encode_stats_counts(spark):
    docs = _docs(spark, ["low low", "lower"])
    merges = [(1, "l o", "lo", 0), (2, "lo w", "low", 0)]
    got = {
        r.doc_id: (r.n_words, r.n_chars, r.n_symbols, r.compression)
        for r in bpe_encode_stats(docs, merges).collect()
    }
    # 'low' -> ' low ' = 1 symbol; 'lower' -> ' low e r ' = 3 symbols.
    assert got[0] == (2, 6, 2, 3.0)
    assert got[1] == (1, 5, 3, 5.0 / 3.0)


def test_char_repr_pads_and_spaces(spark):
    df = spark.createDataFrame([("he",)], "word string").select(
        char_repr("word").alias("r")
    )
    assert df.collect()[0].r == " h e "


def test_trainer_plan_stays_jvm_side(spark):
    """The per-round pair count is pure DataFrame ops — no Python stages
    in the trainer or encoder plans (UDF-free contract)."""
    docs = _docs(spark, ["low low lower"])
    merges = bpe_train(docs, n_merges=2)
    plan = bpe_encode_stats(docs, merges)._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in plan
