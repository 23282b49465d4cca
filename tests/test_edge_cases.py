"""Edge-case robustness for the text/dedup/sessionize operators: empty
strings, single tokens, unicode, and degenerate groups must produce sane
values, not crashes or NULL storms — the rows a 100 TB corpus will
definitely contain."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


EDGE_TEXTS = [
    "",                     # empty
    "one",                  # single token (below shingle width)
    "two words",            # below 3-gram width
    "exactly three words",  # one shingle
    "наступил Дед Мороз — unicode текст",  # non-ascii
    "🚀 emoji 🌕 to the moon 🚀",          # astral-plane chars
    "a  b",                 # double space -> empty token
]


def test_shingles_edge_cases(spark):
    from chainhouse_spark.functions.text import word_shingles

    out = _docs(spark, EDGE_TEXTS).select(
        "doc_id", word_shingles("text", 3).alias("sh")
    ).collect()
    by_id = {r.doc_id: r.sh for r in out}
    assert by_id[0] == []            # empty doc -> no shingles, not a crash
    assert by_id[1] == []            # 1 token < width
    assert by_id[2] == []
    assert by_id[3] == ["exactly three words"]
    assert len(by_id[4]) > 0         # unicode shingles fine
    assert all(isinstance(s, str) for s in by_id[5])


def test_minhash_sentinel_for_short_docs(spark):
    from chainhouse_spark.operators.dedup import minhash_signatures

    sigs = minhash_signatures(_docs(spark, EDGE_TEXTS))
    got = {r.doc_id for r in sigs.collect()}
    # groupBy over exploded shingles drops shingle-less docs — the operator's
    # contract is "docs with >= shingle_words tokens"; short docs fall to
    # exact dedup. Pin that behavior so it changes consciously.
    assert 3 in got and 4 in got
    assert 0 not in got and 1 not in got


def test_exact_dedup_handles_empty_and_unicode(spark):
    from chainhouse_spark.operators.dedup import exact_dedup

    d = _docs(spark, ["", "", "наступил", "наступил", "x"])
    out = {r.canonical_id: r.n_copies for r in exact_dedup(d).collect()}
    assert out == {0: 2, 2: 2, 4: 1}


def test_quality_scores_no_nan_on_edges(spark):
    from chainhouse_spark.queries.llm_text import text_quality_scores

    _docs(spark, EDGE_TEXTS).createOrReplaceTempView("_edge")
    # run the same expressions directly over the edge frame
    from chainhouse_spark.functions.text import (
        digit_ratio,
        n_tokens,
        punct_ratio,
    )

    out = _docs(spark, EDGE_TEXTS).select(
        "doc_id",
        n_tokens("text").alias("nt"),
        punct_ratio("text").alias("pr"),
        digit_ratio("text").alias("dr"),
    ).collect()
    for r in out:
        assert r.nt is not None
        # ratios over empty text may be NULL (0/0) but never NaN/crash
        assert r.pr is None or 0.0 <= r.pr <= 1.0
        assert r.dr is None or 0.0 <= r.dr <= 1.0


def test_sessionize_single_event_and_identical_timestamps(spark):
    from chainhouse_spark.operators.sessionize import sessionize_events

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (1, 1, t0, 1.0),           # lone event
            (2, 2, t0, 1.0), (3, 2, t0, 1.0), (4, 2, t0, 1.0),  # same instant
        ],
        "event_id long, user_id long, ts timestamp_ntz, value double",
    )
    out = sessionize_events(df, gap_seconds=60).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r.user_id, []).append(r)
    assert len(by_user[1]) == 1 and by_user[1][0].n_events == 1
    assert len(by_user[2]) == 1 and by_user[2][0].n_events == 3  # one session


def test_chunking_reconstructs_document(spark, sf_dir):
    """Non-overlapping prefixes of consecutive char chunks concatenate back
    to the original text — no byte lost or duplicated by the windowing."""
    from chainhouse_spark.queries.llm_chunking import (
        CHAR_STRIDE,
        text_chunk_chars,
    )
    from chainhouse_spark.tables import load_table

    chunks = text_chunk_chars(spark, sf_dir).orderBy("doc_id", "chunk_id").collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    rebuilt: dict[int, str] = {}
    last_chunk: dict[int, str] = {}
    for r in chunks:
        rebuilt[r["doc_id"]] = rebuilt.get(r["doc_id"], "") + r["chunk"][:CHAR_STRIDE]
        last_chunk[r["doc_id"]] = r["chunk"]
    for doc_id, text in docs.items():
        # prefix sum covers all but the final chunk's tail beyond one stride
        full = rebuilt[doc_id][: len(text)] if len(text) else rebuilt[doc_id]
        tail = last_chunk[doc_id]
        assert text.startswith(full[: max(len(full) - len(tail), 0)] or "")
        assert text == (full if len(full) >= len(text) else full + text[len(full):])
        # every chunk tail must be a suffix of the doc
        assert text.endswith(tail)


def test_vocab_ids_are_dense_and_rank_ordered(spark, sf_dir):
    from chainhouse_spark.queries.llm_text import vocab_build

    rows = vocab_build(spark, sf_dir).collect()
    ids = [r["token_id"] for r in rows]
    assert ids == list(range(len(rows)))
    freqs = [r["doc_freq"] for r in rows]
    assert freqs == sorted(freqs, reverse=True)


def test_attribution_gaps_strictly_positive(spark, sf_dir):
    """merge_asof with allow_exact_matches=False: every attributed click is
    strictly earlier than its purchase; unattributed rows carry NULLs."""
    from chainhouse_spark.queries.funnel import attribution_last_click

    rows = attribution_last_click(spark, sf_dir).collect()
    assert rows
    attributed = [r for r in rows if r["last_click_ts"] is not None]
    assert attributed, "fixture data should attribute at least one purchase"
    for r in attributed:
        assert r["last_click_ts"] < r["purchase_ts"]
        assert r["gap_us"] > 0


def test_interpolation_bounds(spark, sf_dir):
    """Filled values lie within [min, max] of observed values (linear blend
    can't overshoot its bracketing neighbors) and observed hours pass
    through unchanged."""
    from chainhouse_spark.queries.timeseries import ts_interpolate_linear

    rows = ts_interpolate_linear(spark, sf_dir).collect()
    assert len(rows) == 24
    observed = [r["observed"] for r in rows if r["observed"] is not None]
    lo, hi = min(observed), max(observed)
    for r in rows:
        if r["observed"] is not None:
            assert r["filled"] == r["observed"]
        elif r["filled"] is not None:
            assert lo - 1e-9 <= r["filled"] <= hi + 1e-9


def test_events_nanos_conf_does_not_leak(spark):
    """load_table('events') must restore spark.sql.legacy.parquet.nanosAsLong
    (a leaked true would silently surface any other table's nanos column as
    bigint), and the returned frame must still execute correctly after the
    restore (the plan captures the conf at analysis time)."""
    from chainhouse_spark.tables import load_table

    assert (
        spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) != "true"
    )
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong", None) != "true"
    assert df.count() > 0
    assert dict(df.dtypes)["ts"] == "timestamp_ntz"


def test_events_load_requires_utc_session(spark):
    """Non-UTC session timezone must fail loudly instead of silently
    shifting events.ts through the NTZ cast."""
    import pytest

    from chainhouse_spark.tables import load_table

    saved = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with pytest.raises(ValueError, match="timeZone=UTC"):
            load_table(spark, "/root/testdata/sf0.001", "events")
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)


def test_utc_equivalent_zones_accepted(spark):
    """Zone ALIASES of UTC ('Etc/UTC', 'GMT', '+00:00') are offset-equal and
    must pass the guard — compare offsets, not strings (VERDICT r04 nit)."""
    from chainhouse_spark.tables import _is_utc_zone, load_table

    for tz in ("UTC", "Etc/UTC", "GMT", "+00:00", "Z"):
        assert _is_utc_zone(tz), tz
    for tz in ("America/New_York", "Europe/Berlin", "+01:00"):
        assert not _is_utc_zone(tz), tz

    saved = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "Etc/UTC")
    try:
        df = load_table(spark, "/root/testdata/sf0.001", "events")
        assert df.count() > 0
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)


def test_quantize_zero_and_degenerate_vectors(spark):
    """Zero vectors quantize to all-zero with scale 0 (no NaN/∞ storm);
    single-element and constant vectors round-trip within the bound."""
    from chainhouse_spark.operators.quantize import quantize_int8

    df = spark.createDataFrame(
        [
            (0, [0.0, 0.0, 0.0]),
            (1, [5.0]),
            (2, [-3.0, -3.0]),
            (3, [1e-30, -1e-30]),  # denormal-adjacent scale
        ],
        "vec_id long, embedding array<float>",
    )
    rows = {r.vec_id: r for r in quantize_int8(df).collect()}
    assert rows[0].scale == 0.0 and list(rows[0].q) == [0, 0, 0]
    assert list(rows[1].q) == [127]
    assert list(rows[2].q) == [-127, -127]
    assert all(abs(v) <= 127 for v in rows[3].q)


def test_bloom_empty_testset_flags_nothing(spark):
    """An empty held-out set builds an empty filter: zero flagged docs
    (and no crash from the empty broadcast side)."""
    from chainhouse_spark.operators.bloom import bloom_decontaminate

    train = _docs(spark, ["alpha beta gamma delta", "epsilon zeta eta theta"])
    empty = _docs(spark, []).filter("doc_id IS NOT NULL")
    assert bloom_decontaminate(train, empty).count() == 0


def test_bloom_identical_doc_always_flagged(spark):
    """A training doc byte-identical to a held-out doc must be flagged
    (no false negatives), whatever the filter parameters."""
    from chainhouse_spark.operators.bloom import bloom_decontaminate

    text = "the quick brown fox jumps over the lazy dog"
    train = _docs(spark, [text, "completely different words here now"])
    test = spark.createDataFrame([(100, text)], "doc_id long, text string")
    flagged = bloom_decontaminate(train, test).collect()
    assert any(r.doc_id == 0 for r in flagged)


def test_asof_nearest_edges(spark):
    """asof_join_nearest: backward-only, forward-only, exact-tie (prefers
    backward), equidistant (prefers backward), and no-match keys."""
    from chainhouse_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 100), (1, 10), (2, 5), (3, 50), (4, 7)],
        "k long, t long",
    )
    right = spark.createDataFrame(
        # k=1: rights at 20, 90 -> t=100 nearest 90 (b); t=10 nearest 20 (f)
        # k=2: right at 5 -> exact tie matches backward
        # k=3: rights at 40 and 60 -> equidistant, prefer backward (40)
        # k=4: no rights
        [(1, 20, 111), (1, 90, 222), (2, 5, 333), (3, 40, 444), (3, 60, 555)],
        "k long, t long, payload long",
    )
    got = {
        (r.k, r.t): (r.payload, r["__asof_dir"])
        for r in asof_join_nearest(
            left, right, by="k", ts="t", right_payload=["payload"]
        ).collect()
    }
    assert got[(1, 100)] == (222, "b")
    assert got[(1, 10)] == (111, "f")
    assert got[(2, 5)] == (333, "b")   # exact ts tie counts as backward
    assert got[(3, 50)] == (444, "b")  # equidistant -> backward wins
    assert got[(4, 7)] == (None, None)


def test_access_list_stats_empty_list_is_ansi_safe(spark):
    """An empty accessList '[]' (common on real chains, never emitted by the
    fixtures) must count as a tx-with-list and contribute NULL — not throw
    INVALID_ARRAY_INDEX under Spark 4's default ANSI mode (ADVICE r06:
    a bare al[0] would). Mirrors DuckDB's 1-based al[1] -> NULL."""
    from chainhouse_spark.queries.ethereum import eth_access_list_stats

    tx = spark.createDataFrame(
        [
            ('[]',),
            ('[{"address":"0xaa","storageKeys":["0x01","0x02"]}]',),
            (None,),
        ],
        "accessList string",
    )
    import chainhouse_spark.queries.ethereum as eth

    orig = eth._tables
    eth._tables = lambda s: {"transactions": tx}
    try:
        row = eth_access_list_stats(spark, "unused").collect()[0]
    finally:
        eth._tables = orig
    assert row.n_txs_with_list == 2
    assert row.total_entries == 1
    assert row.total_storage_keys == 2
    assert row.n_distinct_first_addresses == 1


def test_asof_interpolate_edges(spark):
    from chainhouse_spark.operators.asof import asof_interpolate

    left = spark.createDataFrame(
        [(1, 50), (1, 10), (1, 95), (2, 7), (3, 40)], "k long, t long"
    )
    right = spark.createDataFrame(
        # k=1: rights at t=20 (v=100) and t=80 (v=400)
        # k=3: single right at t=40 exact match (v=77)
        # k=2: no rights
        [(1, 20, 100.0), (1, 80, 400.0), (3, 40, 77.0)],
        "k long, t long, v double",
    )
    got = {
        (r.k, r.t): r.iv
        for r in asof_interpolate(
            left, right, by="k", ts="t", value_col="v", out_col="iv"
        ).collect()
    }
    assert got[(1, 50)] == 250.0   # halfway between 100 and 400
    assert got[(1, 10)] == 100.0   # before first right: flat backward
    assert got[(1, 95)] == 400.0   # after last right: flat forward
    assert got[(2, 7)] is None     # no right rows
    assert got[(3, 40)] == 77.0    # exact timestamp match
