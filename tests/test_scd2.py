"""SCD2 operator unit tests: each merge path exercised on a crafted frame."""

from __future__ import annotations

from pyspark.sql import functions as F

from chainhouse_spark.operators.scd2 import scd2_apply


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k long, v string, valid_from timestamp_ntz, valid_to timestamp_ntz"
    )


def test_scd2_paths(spark):
    import datetime as dt

    t0 = dt.datetime(2020, 1, 1)
    t_old = dt.datetime(2019, 1, 1)
    cur = _dim(
        spark,
        [
            (1, "a", t0, None),       # will change
            (2, "b", t0, None),       # no-op update
            (3, "c", t0, None),       # not in updates
            (1, "old", t_old, t0),    # closed history row -> untouched
        ],
    )
    upd = spark.createDataFrame(
        [(1, "a2"), (2, "b"), (9, "new")], "k long, v string"
    )
    out = scd2_apply(cur, upd, keys=["k"], attrs=["v"], effective_ts="2021-06-01 00:00:00")
    rows = {(r.k, r.v, r.valid_to is None) for r in out.collect()}
    assert out.count() == 6
    assert (1, "old", False) in rows          # history preserved
    assert (1, "a", False) in rows            # changed row closed
    assert (1, "a2", True) in rows            # new version opened
    assert (2, "b", True) in rows             # no-op stays open
    assert (3, "c", True) in rows             # untouched key stays open
    assert (9, "new", True) in rows           # fresh insert
    # point-in-time reconstruction: as of 2020-06-01, key 1 must read "a"
    asof = out.filter(
        (F.col("valid_from") <= F.expr("TIMESTAMP_NTZ '2020-06-01 00:00:00'"))
        & (
            F.col("valid_to").isNull()
            | (F.col("valid_to") > F.expr("TIMESTAMP_NTZ '2020-06-01 00:00:00'"))
        )
    )
    assert {(r.k, r.v) for r in asof.collect()} == {(1, "a"), (2, "b"), (3, "c")}


def test_scd2_null_attrs_are_nullsafe(spark):
    cur = _dim(spark, [(1, None, __import__("datetime").datetime(2020, 1, 1), None)])
    upd = spark.createDataFrame([(1, None)], "k long, v string")
    out = scd2_apply(cur, upd, keys=["k"], attrs=["v"], effective_ts="2021-01-01 00:00:00")
    # NULL == NULL under null-safe compare -> no-op, not close-and-reopen
    assert out.count() == 1 and out.collect()[0].valid_to is None
