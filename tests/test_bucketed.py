"""Bucketed layout: the fact-fact join must plan with ZERO shuffle exchanges
when both sides share the bucket spec — the co-located join contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chainhouse_spark.plans.audit import plan_facts
from chainhouse_spark.sinks.bucketed import colocated_join, write_bucketed
from chainhouse_spark.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("warehouse")
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    write_bucketed(li, "li_b", "l_orderkey", 8, str(base / "li_b"))
    write_bucketed(
        o.withColumnRenamed("o_orderkey", "l_orderkey"),
        "o_b", "l_orderkey", 8, str(base / "o_b"),
    )
    yield "li_b", "o_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS o_b")


def test_colocated_join_has_no_shuffle(spark, bucketed_tables):
    li_b, o_b = bucketed_tables
    # force the join to be non-broadcast so the bucket alignment is what
    # saves the shuffle, exactly as it would at 100 TB
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, li_b, o_b, "l_orderkey").groupBy(
            "o_orderpriority"
        ).agg(F.count(F.lit(1)).alias("n"))
        f = plan_facts(j)
        assert f.sortmerge_joins >= 1, "expected a sort-merge join"
        # the ONLY exchange allowed is the final group-by; the join itself
        # must consume bucketed scans directly.
        assert f.shuffle_exchanges <= 1, "bucketed join shuffled"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_colocated_join_correct(spark, bucketed_tables):
    li_b, o_b = bucketed_tables
    got = colocated_join(spark, li_b, o_b, "l_orderkey").count()
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    exp = li.join(o, li.l_orderkey == o.o_orderkey).count()
    assert got == exp > 0
