"""ETL transform tests — the FIXTURES.md §B invariants plus the edge-case
behaviors called out in SURVEY.md §5 (positional join alignment, NULL
propagation across eras, dedup/idempotency contract K8).
"""

from __future__ import annotations

from decimal import Decimal

import pytest
from pyspark.sql import functions as F

from chainhouse_spark.schemas import DEDUP_KEYS, TABLES
from chainhouse_spark.sources.fixtures import generate_raw_blocks, raw_blocks_df
from chainhouse_spark.transforms import all_tables_from_raw

N_BLOCKS = 6


@pytest.fixture(scope="module")
def raw(spark):
    return raw_blocks_df(spark, n_blocks=N_BLOCKS, seed=42).cache()


@pytest.fixture(scope="module")
def tables(raw):
    return all_tables_from_raw(raw)


def test_output_schemas_match_declared(tables):
    for name, df in tables.items():
        assert df.schema == TABLES[name], f"{name} schema drift"


def test_row_counts_match_fixture(raw, tables):
    fix = generate_raw_blocks(N_BLOCKS, seed=42)
    assert tables["blocks"].count() == N_BLOCKS
    assert tables["transactions"].count() == sum(len(b["transactions"]) for b in fix)
    assert tables["events"].count() == sum(
        len(l["logs"]) for b in fix for l in b["receipts"]
    )
    assert tables["withdraws"].count() == sum(
        len(b["withdrawals"] or []) for b in fix
    )
    # the empty block contributes 1 blocks row and 0 child rows
    assert len(fix[0]["transactions"]) == 0


def test_positional_join_alignment(tables):
    """F2: every tx row carries ITS OWN receipt (matched by position, which
    the fixture guarantees equals matching by hash)."""
    tx = tables["transactions"]
    assert tx.filter(F.col("cumulativeGasUsed").isNull()).count() == 0
    # cumulativeGasUsed is strictly increasing within a block — misalignment
    # would scramble it
    rows = tx.select("blockNumber", "transactionIndex", "cumulativeGasUsed").collect()
    per_block: dict[int, list] = {}
    for r in rows:
        per_block.setdefault(r.blockNumber, []).append(
            (r.transactionIndex, r.cumulativeGasUsed)
        )
    for _, lst in per_block.items():
        lst.sort()
        cums = [c for _, c in lst]
        assert cums == sorted(cums) and len(set(cums)) == len(cums)


def test_parent_denormalization(tables):
    """FIXTURES §B: child foreign keys + blockTimestamp equal the parent's."""
    blocks = tables["blocks"].select(
        "hash", F.col("number").alias("bn"), F.col("timestamp").alias("bts")
    )
    for child, fk in [
        ("transactions", "blockHash"),
        ("events", "blockHash"),
        ("withdraws", "blockHash"),
    ]:
        c = tables[child]
        joined = c.join(blocks, c[fk] == blocks["hash"], "left")
        assert joined.filter(F.col("bn").isNull()).count() == 0, f"{child} orphan"
        assert (
            joined.filter(
                (F.col("blockNumber") != F.col("bn"))
                | (F.col("blockTimestamp") != F.col("bts"))
            ).count()
            == 0
        ), f"{child} parent attrs drift"


def test_era_null_propagation(tables):
    tx = tables["transactions"]
    blocks = tables["blocks"]
    # pre-EIP-1559 blocks (0,1): no baseFeePerGas; later blocks have it
    assert blocks.filter((F.col("number") <= 1) & F.col("baseFeePerGas").isNotNull()).count() == 0
    assert blocks.filter((F.col("number") >= 2) & F.col("baseFeePerGas").isNull()).count() == 0
    # pre-EIP-658 receipts (block 1, legacy): root set, status NULL; post: reverse
    legacy = tx.filter(F.col("blockNumber") == 1)
    assert legacy.filter(F.col("status").isNotNull()).count() == 0
    assert legacy.filter(F.col("root").isNull()).count() == 0
    modern = tx.filter(F.col("blockNumber") >= 2)
    assert modern.filter(F.col("status").isNull()).count() == 0
    assert modern.filter(F.col("root").isNotNull()).count() == 0
    # legacy txs: no chainId / maxFeePerGas
    assert legacy.filter(F.col("maxFeePerGas").isNotNull()).count() == 0
    # contract creations: to NULL iff contractAddress set
    assert tx.filter(F.col("to").isNull() & F.col("contractAddress").isNull()).count() == 0
    assert tx.filter(F.col("to").isNotNull() & F.col("contractAddress").isNotNull()).count() == 0
    assert tx.filter(F.col("to").isNull()).count() > 0  # the case exists
    # type-2 with accessList exists and is valid JSON-ish
    al = tx.filter(F.col("accessList").isNotNull())
    assert al.count() > 0
    assert al.filter(~F.col("accessList").startswith("[")).count() == 0


def test_withdrawals_only_post_shanghai(tables):
    w = tables["withdraws"]
    assert w.count() > 0
    assert w.filter(F.col("blockNumber") < N_BLOCKS - 2).count() == 0
    blocks = tables["blocks"]
    # withdrawlsRoot (reference spelling) NULL exactly where era pre-Shanghai
    assert blocks.filter(
        (F.col("number") < N_BLOCKS - 2) & F.col("withdrawlsRoot").isNotNull()
    ).count() == 0


def test_event_context_from_enclosing_tx(raw, tables):
    """F6: events carry the enclosing tx's hash/index (src/main.rs:261-262)."""
    ev = tables["events"]
    tx = tables["transactions"].select(
        F.col("hash").alias("transactionHash"),
        F.col("transactionIndex").alias("ti"),
    )
    j = ev.join(tx, "transactionHash", "left")
    assert j.filter(F.col("ti").isNull()).count() == 0
    assert j.filter(F.col("transactionIndex") != F.col("ti")).count() == 0


def test_binary_widths(tables):
    """Hashes 32B, addresses 20B, block nonce 8B (FIXTURES conventions)."""
    b = tables["blocks"]
    assert b.filter(F.length("hash") != 32).count() == 0
    assert b.filter(F.length("miner") != 20).count() == 0
    assert b.filter(F.length("nonce") != 8).count() == 0
    tx = tables["transactions"]
    assert tx.filter(F.length("r") != 32).count() == 0
    assert tx.filter(F.col("to").isNotNull() & (F.length("to") != 20)).count() == 0


def test_dedup_idempotency(spark, raw):
    """K8: re-ingesting an overlapping range changes nothing (the exact
    strengthening of ReplacingMergeTree)."""
    # blocks 0..2 again — sliced from the SAME generation (era assignment
    # depends on n_blocks, so generating 3 fresh blocks would not overlap)
    from chainhouse_spark.schemas import RAW_BLOCK

    overlap = spark.createDataFrame(
        generate_raw_blocks(N_BLOCKS, seed=42)[:3], RAW_BLOCK
    )
    doubled = all_tables_from_raw(raw.unionByName(overlap))
    base = all_tables_from_raw(raw)
    for name in TABLES:
        assert doubled[name].count() == base[name].count(), name
        keys = DEDUP_KEYS[name]
        assert (
            doubled[name].groupBy(*keys).count().filter(F.col("count") > 1).count() == 0
        ), f"{name} keys not unique"


def test_deterministic_fixture():
    a = generate_raw_blocks(4, seed=42)
    b = generate_raw_blocks(4, seed=42)
    assert a == b
    c = generate_raw_blocks(4, seed=7)
    assert a != c


def test_analytics_on_pipeline_output(spark, raw):
    """SURVEY §7.3's end-to-end slice: an analytical query over the
    transactions table produced by the pipeline."""
    tx = all_tables_from_raw(raw)["transactions"]
    tx.createOrReplaceTempView("eth_transactions")
    res = spark.sql(
        """
        SELECT blockNumber, CAST(SUM(gasUsed) AS DECIMAL(38,0)) AS total_gas,
               COUNT(*) AS n_tx
        FROM eth_transactions GROUP BY blockNumber ORDER BY blockNumber
        """
    ).collect()
    assert len(res) == N_BLOCKS - 1  # empty block has no txs
    fix = generate_raw_blocks(N_BLOCKS, seed=42)
    for row in res:
        expected = sum(int(r["gasUsed"]) for r in fix[row.blockNumber]["receipts"])
        assert int(row.total_gas) == expected
