"""Single-source-of-truth schemas for the Ethereum ETL (SURVEY.md §1).

The reference declares its data model twice — SQL DDL (reference
src/main.rs:56-161) and Rust row structs (src/schema.rs:3-83). Here each
table is declared once as a StructType; DDL for external sinks derives from
it (sinks/clickhouse.py).

Type mapping (SURVEY.md §1.2): 32/20/8-byte hashes/addresses/nonces ->
BinaryType; UInt64 -> LongType (values « 2^63); UInt256 arithmetic columns
-> DecimalType(38,0) (real-world values fit); full-range-required columns
(tx signature r/s) -> 32-byte BinaryType. `withdrawlsRoot` keeps the
reference's spelling (src/main.rs:83) for parity; the raw input uses the
canonical `withdrawalsRoot`.
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DecimalType,
    LongType,
    StringType,
    StructField,
    StructType,
)

U256 = DecimalType(38, 0)
BIN = BinaryType()


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


# ---------------------------------------------------------------------------
# Raw input: one row per block, as fetched by the two RPCs the reference
# makes per height — eth_getBlockByNumber(n, true) merged with
# eth_getBlockReceipts(n) (src/main.rs:173-174). receipts[i] aligns
# positionally with transactions[i] (the positional join at src/main.rs:210).
# ---------------------------------------------------------------------------

RAW_TRANSACTION = StructType(
    [
        _f("hash", BIN),
        _f("transactionIndex", LongType()),
        _f("chainId", U256),
        _f("type", LongType()),
        _f("from", BIN),
        _f("to", BIN),
        _f("value", U256),
        _f("nonce", U256),
        _f("input", BIN),
        _f("gas", U256),
        _f("gasPrice", U256),
        _f("maxFeePerGas", U256),
        _f("maxPriorityFeePerGas", U256),
        _f("r", BIN),
        _f("s", BIN),
        _f("v", LongType()),
        _f("accessList", StringType()),
    ]
)

RAW_LOG = StructType(
    [
        _f("address", BIN),
        _f("logIndex", U256),
        _f("removed", BooleanType()),
        _f("topics", ArrayType(BIN)),
        _f("data", BIN),
    ]
)

RAW_RECEIPT = StructType(
    [
        _f("transactionHash", BIN),
        _f("contractAddress", BIN),
        _f("cumulativeGasUsed", U256),
        _f("effectiveGasPrice", U256),
        _f("gasUsed", U256),
        _f("logsBloom", BIN),
        _f("root", BIN),
        _f("status", LongType()),
        _f("logs", ArrayType(RAW_LOG)),
    ]
)

RAW_WITHDRAWAL = StructType(
    [
        _f("index", LongType()),
        _f("validatorIndex", LongType()),
        _f("address", BIN),
        _f("amount", U256),
    ]
)

RAW_BLOCK = StructType(
    [
        _f("hash", BIN),
        _f("number", LongType()),
        _f("parentHash", BIN),
        _f("uncles", ArrayType(BIN)),
        _f("sha3Uncles", BIN),
        _f("totalDifficulty", U256),
        _f("miner", BIN),
        _f("difficulty", U256),
        _f("nonce", BIN),
        _f("mixHash", BIN),
        _f("baseFeePerGas", U256),
        _f("gasLimit", U256),
        _f("gasUsed", U256),
        _f("stateRoot", BIN),
        _f("transactionsRoot", BIN),
        _f("receiptsRoot", BIN),
        _f("logsBloom", BIN),
        _f("withdrawalsRoot", BIN),
        _f("extraData", BIN),
        _f("timestamp", U256),
        _f("size", U256),
        _f("transactions", ArrayType(RAW_TRANSACTION)),
        _f("receipts", ArrayType(RAW_RECEIPT)),
        _f("withdrawals", ArrayType(RAW_WITHDRAWAL)),
    ]
)

# ---------------------------------------------------------------------------
# Output tables — grain, columns and dedup keys per the reference DDL.
# ---------------------------------------------------------------------------

# ethereum.blocks — 1 row/block — key (hash, number) — DDL src/main.rs:64-89
BLOCKS = StructType(
    [
        _f("hash", BIN),
        _f("number", LongType()),
        _f("parentHash", BIN),
        _f("uncles", ArrayType(BIN)),
        _f("sha3Uncles", BIN),
        _f("totalDifficulty", U256),
        _f("miner", BIN),
        _f("difficulty", U256),
        _f("nonce", BIN),
        _f("mixHash", BIN),
        _f("baseFeePerGas", U256),
        _f("gasLimit", U256),
        _f("gasUsed", U256),
        _f("stateRoot", BIN),
        _f("transactionsRoot", BIN),
        _f("receiptsRoot", BIN),
        _f("logsBloom", BIN),
        _f("withdrawlsRoot", BIN),  # reference's spelling, src/main.rs:83
        _f("extraData", BIN),
        _f("timestamp", U256),
        _f("size", U256),
    ]
)

# ethereum.transactions — 1 row/tx, pre-joined with its receipt —
# key (hash) — DDL src/main.rs:93-124, struct src/schema.rs:29-58
TRANSACTIONS = StructType(
    [
        _f("hash", BIN),
        _f("blockHash", BIN),
        _f("blockNumber", LongType()),
        _f("blockTimestamp", U256),
        _f("transactionIndex", LongType()),
        _f("chainId", U256),
        _f("type", LongType()),
        _f("from", BIN),
        _f("to", BIN),
        _f("value", U256),
        _f("nonce", U256),
        _f("input", BIN),
        _f("gas", U256),
        _f("gasPrice", U256),
        _f("maxFeePerGas", U256),
        _f("maxPriorityFeePerGas", U256),
        _f("r", BIN),
        _f("s", BIN),
        _f("v", LongType()),
        _f("accessList", StringType()),
        _f("contractAddress", BIN),
        _f("cumulativeGasUsed", U256),
        _f("effectiveGasPrice", U256),
        _f("gasUsed", U256),
        _f("logsBloom", BIN),
        _f("root", BIN),
        _f("status", LongType()),
    ]
)

# ethereum.events — 1 row/log — key (transactionHash, logIndex) —
# DDL src/main.rs:125-144, struct src/schema.rs:60-72
EVENTS = StructType(
    [
        _f("address", BIN),
        _f("blockHash", BIN),
        _f("blockNumber", LongType()),
        _f("blockTimestamp", U256),
        _f("transactionHash", BIN),
        _f("transactionIndex", LongType()),
        _f("logIndex", U256),
        _f("removed", BooleanType()),
        _f("topics", ArrayType(BIN)),
        _f("data", BIN),
    ]
)

# ethereum.withdraws — 1 row/withdrawal — key (blockHash, index) —
# DDL src/main.rs:145-161, struct src/schema.rs:74-83
WITHDRAWS = StructType(
    [
        _f("blockHash", BIN),
        _f("blockNumber", LongType()),
        _f("blockTimestamp", U256),
        _f("index", LongType()),
        _f("validatorIndex", LongType()),
        _f("address", BIN),
        _f("amount", U256),
    ]
)

# Dedup keys replacing ClickHouse ReplacingMergeTree ORDER BY semantics
# (src/main.rs:87-88, 122-123, 139-140, 156-157) — SURVEY.md §2.4 K8.
DEDUP_KEYS: dict[str, list[str]] = {
    "blocks": ["hash", "number"],
    "transactions": ["hash"],
    "events": ["transactionHash", "logIndex"],
    "withdraws": ["blockHash", "index"],
}

TABLES: dict[str, StructType] = {
    "blocks": BLOCKS,
    "transactions": TRANSACTIONS,
    "events": EVENTS,
    "withdraws": WITHDRAWS,
}
