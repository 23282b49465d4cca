"""Vectorized hex-quantity codecs: boundary values, NULL safety, overflow
policy, and padding semantics."""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from chainhouse_spark.functions.u256 import hex_to_bytes_udf, hex_to_decimal


def test_hex_to_decimal_boundaries(spark):
    rows = [("0x0",), ("0x1",), ("0xff",), (hex(10**38 - 1),), (None,)]
    df = spark.createDataFrame(rows, "h string")
    got = [r.d for r in df.select(hex_to_decimal("h").alias("d")).collect()]
    assert got == [Decimal(0), Decimal(1), Decimal(255), Decimal(10**38 - 1), None]


def test_hex_to_decimal_overflow_raises(spark):
    df = spark.createDataFrame([("0x" + "ff" * 32,)], "h string")
    with pytest.raises(Exception, match="Decimal\\(38,0\\)"):
        df.select(hex_to_decimal("h").alias("d")).collect()


def test_hex_to_bytes_padding_and_roundtrip(spark):
    conv = hex_to_bytes_udf(32)
    rows = [("0x1",), ("0x" + "ab" * 32,), (None,)]
    df = spark.createDataFrame(rows, "h string")
    got = [bytes(r.b) if r.b is not None else None
           for r in df.select(conv("h").alias("b")).collect()]
    assert got[0] == b"\x00" * 31 + b"\x01"
    assert got[1] == bytes.fromhex("ab" * 32)
    assert got[2] is None
    # full 256-bit value survives where decimal cannot
    assert int.from_bytes(got[1], "big") == int("ab" * 32, 16)


def test_hex_to_bytes_width_guard(spark):
    conv = hex_to_bytes_udf(20)
    df = spark.createDataFrame([("0x" + "ff" * 21,)], "h string")
    with pytest.raises(Exception, match="wider than 20"):
        df.select(conv("h").alias("b")).collect()


def test_arrow_batching_in_plan(spark):
    # the conversion must be a single ArrowEvalPython stage, not per-row.
    from chainhouse_spark.plans.audit import plan_facts

    df = spark.createDataFrame([("0x1",)], "h string").select(
        hex_to_decimal("h").alias("d")
    )
    f = plan_facts(df)
    assert f.python_evals == 1
