"""Hex/binary ergonomics: round trips, NULL safety, predicate pushdown of
binary literals, and exact wei->eth decimals."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from chainhouse_spark.functions.bytes import (
    eq_hex,
    from_hex,
    in_hex,
    is_address,
    is_hash32,
    to_hex,
    wei_to_eth,
)


@pytest.fixture(scope="module")
def bdf(spark):
    rows = [
        (1, bytes.fromhex("deadbeef" * 8), bytes.fromhex("ab" * 20)),
        (2, bytes.fromhex("00" * 32), bytes.fromhex("cd" * 20)),
        (3, None, None),
    ]
    return spark.createDataFrame(rows, "id long, h binary, addr binary")


def test_hex_round_trip(bdf):
    got = bdf.select("id", from_hex(to_hex("h")).alias("rt"), "h").collect()
    for r in got:
        assert (bytes(r.rt) if r.rt is not None else None) == (
            bytes(r.h) if r.h is not None else None
        )


def test_hex_views_and_case(spark):
    df = spark.createDataFrame([("0xDEADbeef",), ("cafe",), (None,)], "s string")
    got = [bytes(r.b) if r.b is not None else None
           for r in df.select(from_hex("s").alias("b")).collect()]
    assert got == [bytes.fromhex("deadbeef"), bytes.fromhex("cafe"), None]


def test_eq_hex_matches_and_pushes_down(spark, tmp_path, bdf):
    p = str(tmp_path / "b")
    bdf.write.mode("overwrite").parquet(p)
    df = spark.read.parquet(p)
    q = df.filter(eq_hex("h", "0x" + "deadbeef" * 8))
    assert [r.id for r in q.collect()] == [1]
    from chainhouse_spark.plans.audit import plan_facts

    assert plan_facts(q).pushed_filters, "binary literal must reach the scan"


def test_in_hex_and_validators(bdf):
    got = bdf.filter(in_hex("h", ["0x" + "00" * 32, "0x" + "11" * 32])).collect()
    assert [r.id for r in got] == [2]
    flags = bdf.select("id", is_address("addr").alias("a"), is_hash32("h").alias("h32")).collect()
    assert all(r.a for r in flags if r.id in (1, 2))
    assert all(r.h32 for r in flags if r.id in (1, 2))


def test_wei_to_eth_exact(spark):
    df = spark.createDataFrame(
        [(Decimal(10**18),), (Decimal(1500000000000000000),), (Decimal(1),)],
        "wei decimal(38,0)",
    )
    got = [r.eth for r in df.select(wei_to_eth("wei").alias("eth")).collect()]
    assert got == [
        Decimal("1.000000000000000000"),
        Decimal("1.500000000000000000"),
        Decimal("0.000000000000000001"),
    ]


def test_odd_hex_literal_rejected():
    with pytest.raises(ValueError):
        eq_hex("h", "0xabc")


def test_word_u120_decode_known_values(spark):
    """ABI-word decode: known amounts round-trip through the 2-chunk
    conv() path, including values above 64 bits."""
    from chainhouse_spark.functions.bytes import word_u120_sql

    from decimal import Decimal

    vals = [0, 1, 255, 2**64 - 1, 2**64, 123456789012345678901234567, 2**120 - 1]
    rows = [(i, v.to_bytes(32, "big")) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "i int, data binary")
    got = {r.i: r.v for r in df.selectExpr("i", f"{word_u120_sql('data', 0)} AS v").collect()}
    for i, v in enumerate(vals):
        assert got[i] == Decimal(v), f"value {v} decoded as {got[i]}"


def test_word_u120_second_word(spark):
    from chainhouse_spark.functions.bytes import word_u120_sql

    from decimal import Decimal

    data = (7).to_bytes(32, "big") + (99).to_bytes(32, "big")
    df = spark.createDataFrame([(data,)], "data binary")
    r = df.selectExpr(
        f"{word_u120_sql('data', 0)} AS w0", f"{word_u120_sql('data', 1)} AS w1"
    ).collect()[0]
    assert (r.w0, r.w1) == (Decimal(7), Decimal(99))
