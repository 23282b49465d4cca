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
