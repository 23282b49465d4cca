"""UDTF + grouped pandas UDAF: results vs local recomputation."""

from __future__ import annotations

import math

from chainhouse_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"


def test_udtf_counts_match_python(spark):
    got = QUERIES["udtf_token_counts"](spark, SF).collect()
    docs = {r.doc_id: r.text for r in
            __import__("chainhouse_spark.tables", fromlist=["load_table"])
            .load_table(spark, SF, "documents").filter("doc_id < 50").collect()}
    by_doc = {}
    for r in got:
        by_doc.setdefault(r.doc_id, {})[r.token] = r.n
    assert set(by_doc) == set(docs)
    for did, text in list(docs.items())[:10]:
        exp = {}
        for t in text.split(" "):
            exp[t] = exp.get(t, 0) + 1
        assert by_doc[did] == exp


def test_udaf_gmean_matches_local(spark):
    """Raw UDAF values vs a local recompute (the registered query reduces
    them to the oracled invariant form, so the library path is pinned
    here)."""
    from chainhouse_spark.functions.python_surface import gmean_value
    from chainhouse_spark.tables import load_table

    e = load_table(spark, SF, "events")
    got = {r.event_type: r.gmean_value
           for r in e.groupBy("event_type")
                     .agg(gmean_value("value").alias("gmean_value")).collect()}
    rows = e.select("event_type", "value").collect()
    by_type = {}
    for r in rows:
        if r.value is not None and r.value > 0:
            by_type.setdefault(r.event_type, []).append(r.value)
    for t, vals in by_type.items():
        vals.sort()
        exp = math.exp(sum(math.log(v) for v in vals) / len(vals))
        assert math.isclose(got[t], exp, rel_tol=1e-9), t


def test_encoding_quality_detects_crafted_artifacts(spark):
    """The text_encoding_quality expressions on crafted strings: U+FFFD,
    C0 control chars (tab/newline/CR exempt), and mojibake lead chars
    count exactly; the flag fires on hard artifacts and the 0.1% mojibake
    rate, not on clean text."""
    from chainhouse_spark.queries.llm_quality import _enc_count_exprs

    rows = [
        (1, "clean text with tabs\tand\nnewlines\rok", "s"),
        (2, "bad � repl � twice", "s"),
        (3, "binary \x00 leak \x1f and \x0b here", "s"),
        (4, "mojibake Ã© and â€¦ artifacts", "s"),
        (5, "Ã" + "x" * 5000, "s"),  # 1 mojibake char in 5001 -> under 0.1%
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r.doc_id: r
        for r in df.selectExpr(
            "doc_id", "length(text) AS n_chars_txt", *_enc_count_exprs("spark")
        ).collect()
    }
    assert (got[1].n_repl, got[1].n_ctrl, got[1].n_moji) == (0, 0, 0)
    assert got[2].n_repl == 2
    assert got[3].n_ctrl == 3
    assert got[4].n_moji == 2  # 'Ã' + 'â'
    assert got[5].n_moji == 1

    flagged = df.selectExpr(
        "doc_id", "length(text) AS n_chars_txt", *_enc_count_exprs("spark")
    ).selectExpr(
        "doc_id",
        "n_repl > 0 OR n_ctrl > 0 OR n_moji * 1000 > n_chars_txt AS flag",
    ).collect()
    assert {r.doc_id: r.flag for r in flagged} == {
        1: False, 2: True, 3: True, 4: True, 5: False,
    }

    # DuckDB twin computes the same counts on the same strings
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT * FROM (VALUES "
        + ", ".join(
            "(%d, ?, 's')" % i for i, _, _ in rows
        )
        + ") v(doc_id, text, source)",
        [t for _, t, _ in rows],
    )
    duck = con.execute(
        "SELECT doc_id, " + ", ".join(_enc_count_exprs("duckdb")) + " FROM t"
    ).fetchall()
    for doc_id, n_repl, n_ctrl, n_moji in duck:
        g = got[doc_id]
        assert (n_repl, n_ctrl, n_moji) == (g.n_repl, g.n_ctrl, g.n_moji)
