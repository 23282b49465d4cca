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
    from chainhouse_spark.tables import load_table

    got = {r.event_type: r.gmean_value
           for r in QUERIES["udaf_gmean_by_type"](spark, SF).collect()}
    rows = load_table(spark, SF, "events").select("event_type", "value").collect()
    by_type = {}
    for r in rows:
        if r.value is not None and r.value > 0:
            by_type.setdefault(r.event_type, []).append(r.value)
    for t, vals in by_type.items():
        vals.sort()
        exp = math.exp(sum(math.log(v) for v in vals) / len(vals))
        assert math.isclose(got[t], exp, rel_tol=1e-9), t
