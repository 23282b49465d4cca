"""Ethereum ETL pipeline queries — the reference-parity dataflow run
end-to-end (deterministic fixture blocks -> transforms -> four tables ->
analytics).

Oracle strategy: the raw fixture blocks are ALSO serialized as JSONL (pure
Python, at import time), and each oracle makes DuckDB independently replay
the flatten from the nested JSON — read_json -> parallel (positional)
unnest of transactions/receipts (the F2 join, reference src/main.rs:210) ->
aggregate. That cross-checks the flatten/denormalize core (SURVEY.md §2.3
F1-F6) against a second engine, not just the final aggregates.
`eth_blocks_table` (21-column full dump, binary columns compared as 0x-hex
views) and the ABI decode are oracled the same way — the decode oracle
re-parses the hex data words with a strpos-fold (DuckDB has no 128-bit
conv()), so the u120 amounts cross-check exactly. Goldens in
tests/test_transforms.py and test_bytes_functions.py pin the binary forms.

sf_dir is accepted per the driver contract but unused — block count scales
with nothing here; the live-source path (sources/rpc.py) is where volume
comes from in production.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.functions.rounding import round9
from chainhouse_spark.queries.registry import register
from chainhouse_spark.sources.fixtures import raw_blocks_df, write_raw_blocks_jsonl
from chainhouse_spark.transforms import all_tables_from_raw

_N_BLOCKS = 8
_JSONL_PATH = os.path.join(
    tempfile.gettempdir(), f"chainhouse_eth_raw_blocks_{_N_BLOCKS}_42.jsonl"
)
try:  # written at import so the oracle file exists whichever side runs first
    write_raw_blocks_jsonl(_JSONL_PATH, n_blocks=_N_BLOCKS, seed=42)
except OSError:  # tmp unwritable: queries still run, oracles would fail loudly
    pass

# DuckDB view of the raw nested blocks. u256-ish values travel as digit
# strings (JSON int64 would overflow) and are cast back to DECIMAL in each
# oracle; hashes/addresses are 0x-lowercase-hex strings, the same encoding
# functions/bytes.py::to_hex emits.
_RAW = f"""
    read_json('{_JSONL_PATH}', format='newline_delimited', columns={{
      'number': 'BIGINT',
      'hash': 'VARCHAR',
      'timestamp': 'VARCHAR',
      'transactions': 'STRUCT("hash" VARCHAR, "transactionIndex" BIGINT,
         "type" BIGINT, "from" VARCHAR, "to" VARCHAR, "value" VARCHAR,
         "gas" VARCHAR, "gasPrice" VARCHAR, "maxFeePerGas" VARCHAR,
         "maxPriorityFeePerGas" VARCHAR, "nonce" VARCHAR, "v" BIGINT,
         "chainId" VARCHAR, "accessList" VARCHAR)[]',
      'receipts': 'STRUCT("transactionHash" VARCHAR,
         "contractAddress" VARCHAR, "cumulativeGasUsed" VARCHAR,
         "effectiveGasPrice" VARCHAR, "gasUsed" VARCHAR, "root" VARCHAR,
         "status" BIGINT, "logs" STRUCT("address" VARCHAR,
         "logIndex" VARCHAR, "removed" BOOLEAN, "topics" VARCHAR[],
         "data" VARCHAR)[])[]',
      'withdrawals': 'STRUCT("index" BIGINT, "validatorIndex" BIGINT,
         "address" VARCHAR, "amount" VARCHAR)[]'
    }})
"""


def _tables(spark: SparkSession):
    return all_tables_from_raw(raw_blocks_df(spark, n_blocks=_N_BLOCKS, seed=42))


# Block-header view of the same JSONL (the _RAW spec only parses the nested
# arrays; this one parses the 21 header fields — read_json ignores the rest).
_RAW_HEADERS = f"""
    read_json('{_JSONL_PATH}', format='newline_delimited', columns={{
      'hash': 'VARCHAR', 'number': 'BIGINT', 'parentHash': 'VARCHAR',
      'uncles': 'VARCHAR[]', 'sha3Uncles': 'VARCHAR',
      'totalDifficulty': 'VARCHAR', 'miner': 'VARCHAR',
      'difficulty': 'VARCHAR', 'nonce': 'VARCHAR', 'mixHash': 'VARCHAR',
      'baseFeePerGas': 'VARCHAR', 'gasLimit': 'VARCHAR', 'gasUsed': 'VARCHAR',
      'stateRoot': 'VARCHAR', 'transactionsRoot': 'VARCHAR',
      'receiptsRoot': 'VARCHAR', 'logsBloom': 'VARCHAR',
      'withdrawalsRoot': 'VARCHAR', 'extraData': 'VARCHAR',
      'timestamp': 'VARCHAR', 'size': 'VARCHAR'
    }})
"""

_BLOCK_U256_COLS = (
    "totalDifficulty", "difficulty", "baseFeePerGas", "gasLimit", "gasUsed",
    "timestamp", "size",
)
_BLOCK_BIN_COLS = (
    "hash", "parentHash", "sha3Uncles", "miner", "nonce", "mixHash",
    "stateRoot", "transactionsRoot", "receiptsRoot", "logsBloom", "extraData",
)


@register(
    "eth_blocks_table",
    oracle=f"""
    -- u256 columns stay digit-string VARCHARs: wide DECIMALs degrade to
    -- float64 through pandas; Spark Decimal(38,0) canonicalizes to the
    -- same digit string (the eth_gas_by_block pattern).
    SELECT hash, number, parentHash,
           -- DuckDB array_to_string([]) is NULL, Spark array_join([]) is ''
           coalesce(array_to_string(uncles, ','), '') AS uncles, sha3Uncles,
           totalDifficulty, miner, difficulty, nonce, mixHash,
           baseFeePerGas, gasLimit, gasUsed,
           stateRoot, transactionsRoot, receiptsRoot, logsBloom,
           withdrawalsRoot AS withdrawlsRoot,
           extraData, timestamp, size
    FROM {_RAW_HEADERS}
    """,
)
def eth_blocks_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The blocks table itself (21 cols, reference DDL src/main.rs:64-89),
    binary columns projected to their 0x-hex views so the oracle (which
    reads the raw JSONL's hex encoding directly) compares the full dump
    value-for-value. The canonical BinaryType table stays the stored form;
    this is the human/oracle view over it (functions/bytes.py)."""
    from chainhouse_spark.functions.bytes import to_hex

    b = _tables(spark)["blocks"]
    cols = []
    for f in b.schema.fields:
        if f.name in _BLOCK_BIN_COLS or f.name == "withdrawlsRoot":
            cols.append(to_hex(f.name).alias(f.name))
        elif f.name == "uncles":
            # array columns serialize to a canonical string: the driver's
            # canonicalizer pandas-sorts every output column and dies on
            # unhashable lists (CORRECTNESS_r04 eth_blocks_table err).
            cols.append(
                F.array_join(
                    F.transform(
                        "uncles", lambda x: F.concat(F.lit("0x"), F.lower(F.hex(x)))
                    ),
                    ",",
                ).alias("uncles")
            )
        elif f.name in {
            "totalDifficulty", "difficulty", "baseFeePerGas",
            "gasLimit", "gasUsed", "timestamp", "size",
        }:
            # STRING to match the oracle, which reads these straight from
            # the raw JSONL as VARCHAR decimal digits (u256-capable fields):
            # output dtype class must agree across engines
            # (tests/test_oracle_parity.py dtype-parity rule).
            cols.append(F.col(f.name).cast("string").alias(f.name))
        else:
            cols.append(F.col(f.name))
    return b.select(*cols)


@register(
    "eth_gas_by_block",
    oracle=f"""
    WITH rb AS (SELECT number, unnest(receipts) AS r FROM {_RAW})
    SELECT number AS blockNumber,
           CAST(SUM(CAST(r.gasUsed AS DECIMAL(38,0))) AS VARCHAR) AS total_gas,
           COUNT(*) AS n_tx,
           COUNT(*) FILTER (WHERE r.status = 1) AS n_success
    FROM rb GROUP BY number
    """,
)
def eth_gas_by_block(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §7.3's end-to-end slice: per-block gas totals over the
    pipeline's transactions table."""
    tx = _tables(spark)["transactions"]
    return (
        tx.groupBy("blockNumber")
        .agg(
            # STRING to match the oracle's VARCHAR (u256-safe sums degrade
            # to float64 via pandas on the DuckDB side): the output dtype
            # class must agree across engines (tests/test_oracle_parity.py).
            F.sum("gasUsed").cast("decimal(38,0)").cast("string").alias("total_gas"),
            F.count(F.lit(1)).alias("n_tx"),
            F.sum(F.when(F.col("status") == 1, 1).otherwise(0)).alias("n_success"),
        )
        .orderBy("blockNumber")
    )


@register(
    "eth_event_topics",
    oracle=f"""
    WITH lg AS (
        SELECT unnest(r.logs) AS l
        FROM (SELECT unnest(receipts) AS r FROM {_RAW})
    )
    SELECT CAST(len(l.topics) AS INT) AS n_topics,
           COUNT(*) AS n_events,
           COUNT(DISTINCT CASE WHEN len(l.topics) > 0
                               THEN upper(substr(l.topics[1], 3)) END)
             AS n_distinct_topic0
    FROM lg GROUP BY 1
    """,
)
def eth_event_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event analytics: rows per topic-count, hex-encoded first topic
    (P2's hex ergonomics, SURVEY §1.2)."""
    ev = _tables(spark)["events"]
    return (
        ev.select(
            F.size("topics").alias("n_topics"),
            F.when(F.size("topics") > 0, F.hex(F.element_at("topics", 1))).alias(
                "topic0_hex"
            ),
        )
        .groupBy("n_topics")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("topic0_hex").alias("n_distinct_topic0"),
        )
        .orderBy("n_topics")
    )


@register(
    "eth_withdrawal_totals",
    oracle=f"""
    WITH wd AS (SELECT number, unnest(withdrawals) AS w FROM {_RAW})
    SELECT number AS blockNumber,
           CAST(SUM(CAST(w.amount AS DECIMAL(38,0))) AS VARCHAR) AS total_amount,
           COUNT(*) AS n_withdrawals
    FROM wd GROUP BY number
    """,
)
def eth_withdrawal_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block withdrawal totals (post-Shanghai blocks only, F4)."""
    w = _tables(spark)["withdraws"]
    return (
        w.groupBy("blockNumber")
        .agg(
            F.sum("amount").cast("decimal(38,0)").cast("string").alias("total_amount"),
            F.count(F.lit(1)).alias("n_withdrawals"),
        )
        .orderBy("blockNumber")
    )


@register(
    "eth_top_senders",
    oracle=f"""
    WITH txr AS (SELECT unnest(transactions) AS t, unnest(receipts) AS r FROM {_RAW}),
    agg AS (
        SELECT t."from" AS sender_hex,
               SUM(CAST(t."value" AS DECIMAL(38,0))) AS total_wei,
               COUNT(*) AS n_tx,
               SUM(CAST(r.gasUsed AS DECIMAL(38,0))) AS total_gas
        FROM txr GROUP BY 1
    )
    SELECT sender_hex, CAST(total_eth AS VARCHAR) AS total_eth, n_tx,
           CAST(total_gas AS VARCHAR) AS total_gas
    FROM (
        SELECT sender_hex,
               CAST(CAST(CAST(total_wei AS HUGEINT) // 1000000000000000000 AS DECIMAL(38,18))
                    + CAST(CAST(total_wei AS HUGEINT) % 1000000000000000000 AS DECIMAL(20,0))
                      * CAST('0.000000000000000001' AS DECIMAL(18,18))
                 AS DECIMAL(38,18)) AS total_eth,
               n_tx,
               total_gas
        FROM agg
        ORDER BY total_eth DESC, sender_hex ASC
        LIMIT 20
    )
    """,
)
def eth_top_senders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top senders by total transferred value: binary address shown as
    0x-hex (functions.bytes), wei totals as exact Decimal(38,18) ether."""
    from chainhouse_spark.functions.bytes import to_hex, wei_to_eth

    tx = _tables(spark)["transactions"]
    return (
        tx.groupBy(F.col("from").alias("sender"))
        .agg(
            F.sum(F.col("value")).cast("decimal(38,0)").alias("total_wei"),
            F.count(F.lit(1)).alias("n_tx"),
            F.sum("gasUsed").cast("decimal(38,0)").alias("total_gas"),
        )
        .select(
            to_hex("sender").alias("sender_hex"),
            wei_to_eth("total_wei").alias("total_eth"),
            "n_tx",
            "total_gas",
        )
        .orderBy(F.desc("total_eth"), F.asc("sender_hex"))
        .limit(20)
        # Stringify AFTER the ordered limit so the sort stays numeric;
        # dtype-class parity with the oracle's VARCHAR output columns.
        .withColumn("total_eth", F.col("total_eth").cast("string"))
        .withColumn("total_gas", F.col("total_gas").cast("string"))
    )


@register(
    "eth_contract_creations",
    oracle=f"""
    WITH txr AS (SELECT number, unnest(transactions) AS t, unnest(receipts) AS r
                 FROM {_RAW})
    SELECT number AS blockNumber,
           t.hash AS tx_hash,
           r.contractAddress AS contract_hex,
           CAST(CAST(r.gasUsed AS DECIMAL(38,0)) AS VARCHAR) AS gas_used
    FROM txr
    WHERE t."to" IS NULL AND r.contractAddress IS NOT NULL
    """,
)
def eth_contract_creations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contract-creation transactions (`to` NULL, contractAddress set —
    src/main.rs:221,242-244 semantics), one row per creation."""
    from chainhouse_spark.functions.bytes import to_hex

    tx = _tables(spark)["transactions"]
    return (
        tx.filter(F.col("to").isNull() & F.col("contractAddress").isNotNull())
        .select(
            "blockNumber",
            to_hex("hash").alias("tx_hash"),
            to_hex("contractAddress").alias("contract_hex"),
            F.col("gasUsed").cast("decimal(38,0)").cast("string").alias("gas_used"),
        )
        .orderBy("blockNumber", "tx_hash")
    )


@register(
    "eth_type2_fee_stats",
    oracle=f"""
    WITH tx AS (SELECT number, unnest(transactions) AS t FROM {_RAW})
    SELECT number AS blockNumber,
           COUNT(*) AS n_tx,
           COUNT(*) FILTER (WHERE t."type" = 2) AS n_type2,
           CAST(MAX(CAST(t.maxPriorityFeePerGas AS DECIMAL(38,0))) AS VARCHAR)
             AS max_priority_fee,
           (ROUND((CAST(COUNT(*) FILTER (WHERE t."type" = 2) AS DOUBLE) / COUNT(*)
             ) * 1e9) / 1e9 + 0.0) AS type2_share
    FROM tx GROUP BY number
    """,
)
def eth_type2_fee_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EIP-1559 adoption per block: type-2 share and priority-fee stats
    where present (pre/post-1559 era mix from the fixtures, P4)."""
    tx = _tables(spark)["transactions"]
    t2 = F.when(F.col("`type`") == 2, 1).otherwise(0)
    return (
        tx.groupBy("blockNumber")
        .agg(
            F.count(F.lit(1)).alias("n_tx"),
            F.sum(t2).alias("n_type2"),
            F.max(F.col("maxPriorityFeePerGas").cast("decimal(38,0)"))
            .cast("string")
            .alias("max_priority_fee"),
        )
        .withColumn(
            "type2_share",
            round9(F.col("n_type2").cast("double") / F.col("n_tx")),
        )
        .orderBy("blockNumber")
    )


@register(
    "eth_log_address_activity",
    oracle=f"""
    WITH lg AS (
        SELECT r.transactionHash AS txh, unnest(r.logs) AS l
        FROM (SELECT unnest(receipts) AS r FROM {_RAW})
    )
    SELECT l.address AS address_hex,
           COUNT(*) AS n_logs,
           COUNT(DISTINCT CASE WHEN len(l.topics) > 0 THEN l.topics[1] END)
             AS n_topic0,
           COUNT(DISTINCT txh) AS n_txs
    FROM lg GROUP BY 1
    ORDER BY n_logs DESC, address_hex ASC
    LIMIT 20
    """,
)
def eth_log_address_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most active log-emitting contracts with their distinct topic0 count —
    the event-indexing workload shape."""
    from chainhouse_spark.functions.bytes import to_hex

    ev = _tables(spark)["events"]
    return (
        ev.groupBy(F.col("address").alias("addr"))
        .agg(
            F.count(F.lit(1)).alias("n_logs"),
            F.countDistinct(
                F.when(F.size("topics") > 0, F.element_at("topics", 1))
            ).alias("n_topic0"),
            F.countDistinct("transactionHash").alias("n_txs"),
        )
        .select(to_hex("addr").alias("address_hex"), "n_logs", "n_topic0", "n_txs")
        .orderBy(F.desc("n_logs"), F.asc("address_hex"))
        .limit(20)
    )


def _duck_hex_int(col: str, start: int, nchars: int) -> str:
    """DuckDB SQL: parse `nchars` lowercase hex chars of `col` starting at
    1-based `start` into an integer via a strpos fold (DuckDB's conv-less
    equivalent of Spark's conv(hex, 16, 10); literal powers keep every term
    integer-exact)."""
    terms = [
        f"(strpos('0123456789abcdef', substr({col}, {start + i}, 1)) - 1)"
        f" * {16 ** (nchars - 1 - i)}"
        for i in range(nchars)
    ]
    return "(" + " + ".join(terms) + ")"


@register(
    "eth_erc20_transfer_decode",
    oracle=f"""
    WITH lg AS (
        SELECT r.transactionHash AS transactionHash, unnest(r.logs) AS l
        FROM (SELECT unnest(receipts) AS r FROM {_RAW})
    )
    SELECT l.logIndex AS logIndex,
           transactionHash,
           l.address AS token,
           '0x' || substr(l.topics[2], 27, 40) AS from_addr,
           '0x' || substr(l.topics[3], 27, 40) AS to_addr,
           -- word 0 low 15 bytes: bytes 18-24 (hi7) and 25-32 (lo8, split
           -- into two 4-byte chunks so every fold stays in BIGINT range);
           -- data is '0x'-prefixed, so byte k starts at hex char 2k+1.
           -- VARCHAR result: wide DECIMALs degrade to float64 via pandas.
           CAST({_duck_hex_int("l.data", 37, 14)} * 18446744073709551616
                + (CAST({_duck_hex_int("l.data", 51, 8)} AS HUGEINT) * 4294967296
                   + {_duck_hex_int("l.data", 59, 8)})
                AS VARCHAR) AS amount_u120
    FROM lg
    WHERE len(l.topics) = 3
    """,
)
def eth_erc20_transfer_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABI-decode Transfer-shaped events (3 topics): emitting contract,
    from/to addresses from the indexed topics, amount from the data word —
    all JVM-side (`functions/bytes.py::word_u120_sql`), no Python.

    In production the filter is `topics[0] = keccak('Transfer(address,
    address,uint256)')`; the deterministic fixtures carry random topics, so
    shape (exactly 3 topics) stands in for the signature match — the decode
    mechanics are identical. The oracle re-decodes the same hex words in
    DuckDB with a strpos fold; exact decode values on crafted words are
    additionally pinned by tests/test_bytes_functions.py.
    """
    from chainhouse_spark.functions.bytes import to_hex, topic_address_hex, word_u120_sql

    ev = _tables(spark)["events"]
    return (
        ev.filter(F.size("topics") == 3)
        .select(
            # STRING: the oracle reads logIndex from the raw fixture where it
            # is VARCHAR (decimal digits) — same dtype-class-parity rule.
            F.col("logIndex").cast("string"),
            to_hex("transactionHash").alias("transactionHash"),
            F.concat(F.lit("0x"), F.lower(F.hex(F.col("address")))).alias("token"),
            topic_address_hex(F.element_at("topics", 2)).alias("from_addr"),
            topic_address_hex(F.element_at("topics", 3)).alias("to_addr"),
            # STRING on BOTH sides: the oracle emits VARCHAR (wide DuckDB
            # decimals degrade to float64 via pandas), and a driver
            # canonicalizer that treats numerics differently from strings
            # would otherwise mismatch this one column (r04/r05 red row).
            F.expr(word_u120_sql("data", 0)).cast("string").alias("amount_u120"),
        )
        .orderBy("transactionHash", "logIndex")
    )


@register(
    "eth_reorg_canonical",
    oracle="""
    SELECT i AS number, md5('blk' || i) AS hash
    FROM range(0, 100) t(i)
    """,
)
def eth_reorg_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reorg canonicalization (operators/reorg.py) on a deterministic
    synthetic chain: 100 md5-hash-linked blocks plus a 3-deep stale fork at
    heights 50-52. The canonical result must be exactly the base chain —
    the oracle regenerates it from the same md5 construction, so a walk
    that ever follows a fork link hash-mismatches. The reference's
    ReplacingMergeTree keyed by (hash, number) (src/main.rs:87-88) keeps
    stale fork rows forever; this is the query its users needed.
    """
    from chainhouse_spark.operators.reorg import canonical_chain

    base = spark.range(100).select(
        F.col("id").alias("number"),
        F.md5(F.concat(F.lit("blk"), F.col("id"))).alias("hash"),
        F.md5(F.concat(F.lit("blk"), F.col("id") - 1)).alias("parentHash"),
    )
    fork = spark.range(50, 53).select(
        F.col("id").alias("number"),
        F.md5(F.concat(F.lit("fork"), F.col("id"))).alias("hash"),
        F.when(
            F.col("id") == 50, F.md5(F.lit("blk49"))
        ).otherwise(F.md5(F.concat(F.lit("fork"), F.col("id") - 1))).alias(
            "parentHash"
        ),
    )
    return canonical_chain(base.unionAll(fork))


@register(
    "eth_fee_burn",
    oracle=f"""
    -- header u256 fields are digit-string VARCHARs in the JSONL (the
    -- eth_blocks_table convention); wei math stays exact DECIMAL
    SELECT number AS blockNumber,
           CAST(CAST(baseFeePerGas AS DECIMAL(19,0)) AS VARCHAR) AS base_fee,
           CAST(CAST(gasUsed AS DECIMAL(19,0)) AS VARCHAR) AS gas_used,
           CAST(CAST(baseFeePerGas AS DECIMAL(19,0))
                * CAST(gasUsed AS DECIMAL(19,0)) AS VARCHAR) AS burned_wei
    FROM {_RAW_HEADERS}
    WHERE baseFeePerGas IS NOT NULL
    """,
)
def eth_fee_burn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EIP-1559 burn per block: baseFeePerGas * gasUsed, exact DECIMAL
    arithmetic (never floats for wei). Pre-1559 blocks (NULL baseFee, P4
    nullability) are excluded — the era filter, not a default. Values
    compare as digit strings (u256 oracle idiom)."""
    b = _tables(spark)["blocks"]
    base = F.col("baseFeePerGas").cast("decimal(19,0)")
    gas = F.col("gasUsed").cast("decimal(19,0)")
    return (
        b.filter(F.col("baseFeePerGas").isNotNull())
        .select(
            F.col("number").alias("blockNumber"),
            base.cast("string").alias("base_fee"),
            gas.cast("string").alias("gas_used"),
            (base * gas).cast("string").alias("burned_wei"),
        )
        .orderBy("blockNumber")
    )


@register(
    "eth_address_net_flow",
    oracle=f"""
    WITH tx AS (SELECT unnest(transactions) AS t FROM {_RAW}),
    flows AS (
        SELECT t."from" AS addr,
               -CAST(t."value" AS DECIMAL(38,0)) AS delta,
               1 AS n_out, 0 AS n_in
        FROM tx
        UNION ALL
        SELECT t."to" AS addr,
               CAST(t."value" AS DECIMAL(38,0)) AS delta,
               0, 1
        FROM tx WHERE t."to" IS NOT NULL
    )
    SELECT addr AS address_hex,
           CAST(SUM(delta) AS VARCHAR) AS net_wei,
           CAST(SUM(n_out) AS BIGINT) AS n_sent,
           CAST(SUM(n_in) AS BIGINT) AS n_received
    FROM flows GROUP BY addr
    ORDER BY SUM(delta) DESC, addr ASC
    LIMIT 20
    """,
)
def eth_address_net_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-address net wei flow — the balance-delta ledger a reference user
    derives from the transactions table (value out as sender, value in as
    recipient; contract creations have no recipient row). The union is two
    map-side projections of the same scan; ONE shuffle on address. At 100 TB
    the address key space is large but unskewed (hot exchanges are the
    exception — AQE skew-join handles the groupBy spill); wei stays exact
    DECIMAL(38,0), never floats (u256 digit-string idiom for the compare)."""
    from chainhouse_spark.functions.bytes import to_hex

    tx = _tables(spark)["transactions"]
    val = F.col("value").cast("decimal(38,0)")
    out_ = tx.select(
        F.col("from").alias("addr"),
        (-val).alias("delta"),
        F.lit(1).alias("n_out"),
        F.lit(0).alias("n_in"),
    )
    in_ = tx.filter(F.col("to").isNotNull()).select(
        F.col("to").alias("addr"),
        val.alias("delta"),
        F.lit(0).alias("n_out"),
        F.lit(1).alias("n_in"),
    )
    return (
        out_.unionByName(in_)
        .groupBy("addr")
        .agg(
            F.sum("delta").cast("decimal(38,0)").alias("net"),
            F.sum("n_out").alias("n_sent"),
            F.sum("n_in").alias("n_received"),
        )
        .orderBy(F.desc("net"), F.asc(to_hex("addr")))
        .limit(20)
        .select(
            to_hex("addr").alias("address_hex"),
            F.col("net").cast("string").alias("net_wei"),
            "n_sent",
            "n_received",
        )
    )


@register(
    "eth_block_fullness",
    oracle=f"""
    SELECT number,
           CAST(CAST(gasUsed AS DECIMAL(38,0)) AS VARCHAR) AS gas_used,
           (ROUND((CAST(CAST(gasUsed AS DOUBLE) / CAST(gasLimit AS DOUBLE) AS DOUBLE)
             ) * 1e9) / 1e9 + 0.0) AS fullness,
           CASE
             WHEN CAST(gasUsed AS DECIMAL(38,0)) = 0 THEN 'empty'
             WHEN CAST(gasUsed AS DOUBLE) / CAST(gasLimit AS DOUBLE) < 0.3
               THEN 'low'
             WHEN CAST(gasUsed AS DOUBLE) / CAST(gasLimit AS DOUBLE) < 0.9
               THEN 'normal'
             ELSE 'full'
           END AS utilization
    FROM {_RAW_HEADERS}
    ORDER BY number
    """,
)
def eth_block_fullness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Block gas utilization — the capacity dashboard query (gasUsed /
    gasLimit with an ops-style bucket label). Map-only over the blocks
    table; the ratio is the one deliberate double (both engines divide the
    same exact integers, so the float is bit-identical)."""
    b = _tables(spark)["blocks"]
    used_d = F.col("gasUsed").cast("decimal(38,0)").cast("double")
    lim_d = F.col("gasLimit").cast("decimal(38,0)").cast("double")
    ratio = used_d / lim_d
    return (
        b.select(
            "number",
            F.col("gasUsed").cast("decimal(38,0)").cast("string").alias("gas_used"),
            round9(ratio).alias("fullness"),
            F.when(F.col("gasUsed").cast("decimal(38,0)") == 0, "empty")
            .when(ratio < 0.3, "low")
            .when(ratio < 0.9, "normal")
            .otherwise("full")
            .alias("utilization"),
        )
        .orderBy("number")
    )


@register(
    "eth_effective_gas_price_stats",
    oracle=f"""
    WITH rc AS (SELECT number, unnest(receipts) AS r FROM {_RAW})
    SELECT number AS blockNumber,
           COUNT(*) AS n_tx,
           CAST(MIN(CAST(r.effectiveGasPrice AS DECIMAL(38,0))) AS VARCHAR)
             AS min_price,
           CAST(MAX(CAST(r.effectiveGasPrice AS DECIMAL(38,0))) AS VARCHAR)
             AS max_price,
           CAST(SUM(CAST(r.effectiveGasPrice AS DECIMAL(38,0))) AS VARCHAR)
             AS sum_price
    FROM rc GROUP BY number
    ORDER BY number
    """,
)
def eth_effective_gas_price_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-block effective-gas-price spread (the fee-market view over the
    pre-joined tx⨝receipt table). min/max/sum stay exact DECIMAL — the
    mean is sum/n_tx computed by the consumer, keeping the compare
    float-free (u256 digit-string idiom)."""
    tx = _tables(spark)["transactions"]
    p = F.col("effectiveGasPrice").cast("decimal(38,0)")
    return (
        tx.groupBy("blockNumber")
        .agg(
            F.count(F.lit(1)).alias("n_tx"),
            F.min(p).cast("string").alias("min_price"),
            F.max(p).cast("string").alias("max_price"),
            F.sum(p).cast("decimal(38,0)").cast("string").alias("sum_price"),
        )
        .orderBy("blockNumber")
    )


@register(
    "eth_log_payload_stats",
    oracle=f"""
    WITH lg AS (
        SELECT unnest(r.logs) AS l
        FROM (SELECT unnest(receipts) AS r FROM {_RAW})
    )
    SELECT l.address AS address_hex,
           COUNT(*) AS n_logs,
           CAST(SUM((len(l.data) - 2) // 2) AS BIGINT) AS total_data_bytes,
           CAST(MAX(len(l.topics)) AS INT) AS max_topics
    FROM lg GROUP BY 1
    ORDER BY total_data_bytes DESC, address_hex ASC
    LIMIT 20
    """,
)
def eth_log_payload_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-payload footprint per emitting contract: total log `data`
    bytes and max topic count — the storage-planning query for an event
    indexer. BinaryType length is byte length on the Spark side; the
    oracle recomputes it from the 0x-hex JSONL encoding ((len-2)/2)."""
    from chainhouse_spark.functions.bytes import to_hex

    ev = _tables(spark)["events"]
    return (
        ev.groupBy(F.col("address").alias("addr"))
        .agg(
            F.count(F.lit(1)).alias("n_logs"),
            F.sum(F.length("data")).alias("total_data_bytes"),
            F.max(F.size("topics")).alias("max_topics"),
        )
        .orderBy(F.desc("total_data_bytes"), F.asc(to_hex("addr")))
        .limit(20)
        .select(
            to_hex("addr").alias("address_hex"),
            "n_logs",
            "total_data_bytes",
            "max_topics",
        )
    )


@register(
    "eth_nonce_gaps",
    oracle=f"""
    WITH txr AS (SELECT unnest(transactions) AS t FROM {_RAW}),
    agg AS (
        SELECT t."from" AS sender_hex,
               CAST(COUNT(*) AS BIGINT) AS n_tx,
               CAST(COUNT(DISTINCT CAST(t.nonce AS DECIMAL(38,0))) AS BIGINT)
                   AS n_distinct_nonces,
               CAST(MIN(CAST(t.nonce AS DECIMAL(38,0))) AS VARCHAR) AS min_nonce,
               CAST(MAX(CAST(t.nonce AS DECIMAL(38,0))) AS VARCHAR) AS max_nonce,
               CAST(CAST(MAX(CAST(t.nonce AS DECIMAL(38,0)))
                         - MIN(CAST(t.nonce AS DECIMAL(38,0))) + 1 AS BIGINT)
                    - COUNT(DISTINCT CAST(t.nonce AS DECIMAL(38,0)))
                    AS BIGINT) AS n_gaps,
               CAST(COUNT(*)
                    - COUNT(DISTINCT CAST(t.nonce AS DECIMAL(38,0)))
                    AS BIGINT) AS n_replacements
        FROM txr GROUP BY 1
    )
    SELECT * FROM agg
    """,
)
def eth_nonce_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-sender nonce accounting over the ingested range: missing nonces
    (gaps = span - distinct, the dropped-transaction indicator a mempool /
    indexer health check watches) and same-nonce replacements (count -
    distinct, fee-bump/RBF events). One partial-agg shuffle on the sender
    address; nonces stay exact DECIMAL(38,0) (u256 per SURVEY §1.2). The
    oracle replays the flatten from the raw JSONL independently."""
    from chainhouse_spark.functions.bytes import to_hex

    tx = _tables(spark)["transactions"]
    nonce = F.col("nonce").cast("decimal(38,0)")
    return (
        tx.groupBy(F.col("from").alias("sender"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tx"),
            F.countDistinct(nonce).cast("bigint").alias("n_distinct_nonces"),
            F.min(nonce).cast("string").alias("min_nonce"),
            F.max(nonce).cast("string").alias("max_nonce"),
            (
                (F.max(nonce) - F.min(nonce) + 1).cast("bigint")
                - F.countDistinct(nonce)
            )
            .cast("bigint")
            .alias("n_gaps"),
            (F.count(F.lit(1)) - F.countDistinct(nonce))
            .cast("bigint")
            .alias("n_replacements"),
        )
        .select(
            to_hex("sender").alias("sender_hex"),
            "n_tx",
            "n_distinct_nonces",
            "min_nonce",
            "max_nonce",
            "n_gaps",
            "n_replacements",
        )
    )


@register(
    "eth_miner_tips",
    oracle=f"""
    WITH txr AS (SELECT number, unnest(transactions) AS t, unnest(receipts) AS r
                 FROM {_RAW}),
    hdr AS (SELECT hash, miner, baseFeePerGas FROM {_RAW_HEADERS}),
    blk AS (SELECT number, hash FROM {_RAW}),
    j AS (
        SELECT hdr.miner AS miner_hex,
               (CAST(r.effectiveGasPrice AS DECIMAL(38,0))
                - CAST(hdr.baseFeePerGas AS DECIMAL(38,0)))
               * CAST(r.gasUsed AS DECIMAL(38,0)) AS tip_wei
        FROM txr
        JOIN blk ON blk.number = txr.number
        JOIN hdr ON hdr.hash = blk.hash
        WHERE hdr.baseFeePerGas IS NOT NULL
    )
    SELECT miner_hex,
           CAST(COUNT(*) AS BIGINT) AS n_tx,
           CAST(SUM(tip_wei) AS VARCHAR) AS total_tip_wei
    FROM j GROUP BY miner_hex
    """,
)
def eth_miner_tips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-1559 miner/proposer revenue: the priority tip per transaction is
    (effectiveGasPrice - block baseFeePerGas) * gasUsed — the part of the
    fee NOT burned (eth_fee_burn's complement). Transactions join their
    block header on blockNumber/hash: a BROADCAST join (headers are tiny
    next to transactions at any scale); pre-1559 blocks (NULL baseFee) are
    excluded. Wei stays exact DECIMAL(38,0) end-to-end, rendered as digit
    strings."""
    from chainhouse_spark.functions.bytes import to_hex

    t = _tables(spark)
    tx = t["transactions"].select(
        "blockHash",
        F.col("effectiveGasPrice").cast("decimal(38,0)").alias("egp"),
        F.col("gasUsed").cast("decimal(38,0)").alias("gu"),
    )
    blocks = t["blocks"].select(
        F.col("hash").alias("blockHash"),
        "miner",
        F.col("baseFeePerGas").cast("decimal(38,0)").alias("base_fee"),
    ).filter(F.col("baseFeePerGas").isNotNull())
    j = tx.join(F.broadcast(blocks), "blockHash")
    return (
        j.groupBy("miner")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_tx"),
            F.sum((F.col("egp") - F.col("base_fee")) * F.col("gu"))
            .cast("decimal(38,0)")
            .cast("string")
            .alias("total_tip_wei"),
        )
        .select(to_hex("miner").alias("miner_hex"), "n_tx", "total_tip_wei")
    )


@register(
    "eth_base_fee_projection",
    oracle=f"""
    WITH hdr AS (
        SELECT number,
               CAST(baseFeePerGas AS BIGINT) AS base,
               CAST(gasUsed AS BIGINT) AS used,
               CAST(gasLimit AS BIGINT) AS lim
        FROM {_RAW_HEADERS}
        WHERE baseFeePerGas IS NOT NULL
    ),
    proj AS (
        SELECT number, base, used, lim // 2 AS tgt,
               CASE
                 WHEN used = lim // 2 THEN base
                 WHEN used > lim // 2 THEN base + GREATEST(
                     1, (base * (used - lim // 2)) // ((lim // 2) * 8))
                 ELSE base - (base * (lim // 2 - used)) // ((lim // 2) * 8)
               END AS projected_next
        FROM hdr
    )
    SELECT p.number AS blockNumber,
           CAST(p.base AS VARCHAR) AS base_fee,
           CAST(p.used AS VARCHAR) AS gas_used,
           CAST(p.projected_next AS VARCHAR) AS projected_next_base_fee,
           CAST(n.base AS VARCHAR) AS actual_next_base_fee,
           CAST(n.base - p.projected_next AS BIGINT) AS deviation_wei
    FROM proj p JOIN hdr n ON n.number = p.number + 1
    """,
)
def eth_base_fee_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EIP-1559 base-fee recursion, spec-exact: next_base_fee from
    (base, gasUsed, gasLimit) with elasticity 2 and denominator 8 —
    target = gasLimit/2; over-target blocks raise the fee by
    max(1, base*(used-target) // (target*8)), under-target blocks lower it
    by the mirror term (all floor divisions on non-negative integers, so
    Spark's DIV and DuckDB's // agree). Projection is compared against the
    chain's actual next-block base fee via an equi-join on number+1 —
    never a global lag window, so the block table can be any size. The
    deterministic fixtures draw base fees randomly, so deviation_wei is
    the interesting column (on real mainnet headers it is 0 by consensus).
    Wei fields compare as digit strings (u256 oracle idiom); fixture
    magnitudes (base ~2e9, gas 3e7) keep every product far inside BIGINT.

    Reference capability: the reference ships raw headers to ClickHouse
    and delegates exactly this kind of fee analytics to SQL
    (/root/reference/src/main.rs:57-161)."""
    b = _tables(spark)["blocks"].filter(F.col("baseFeePerGas").isNotNull())
    hdr = b.select(
        "number",
        F.col("baseFeePerGas").cast("bigint").alias("base"),
        F.col("gasUsed").cast("bigint").alias("used"),
        F.col("gasLimit").cast("bigint").alias("lim"),
    )
    proj = hdr.select(
        "number",
        "base",
        "used",
        F.expr(
            """CASE
                 WHEN used = lim DIV 2 THEN base
                 WHEN used > lim DIV 2 THEN base + GREATEST(
                     1L, (base * (used - lim DIV 2)) DIV ((lim DIV 2) * 8))
                 ELSE base - (base * (lim DIV 2 - used)) DIV ((lim DIV 2) * 8)
               END"""
        ).alias("projected_next"),
    )
    nxt = hdr.select(
        (F.col("number") - 1).alias("number"), F.col("base").alias("next_base")
    )
    return (
        proj.join(nxt, "number")
        .select(
            F.col("number").alias("blockNumber"),
            F.col("base").cast("string").alias("base_fee"),
            F.col("used").cast("string").alias("gas_used"),
            F.col("projected_next").cast("string").alias(
                "projected_next_base_fee"
            ),
            F.col("next_base").cast("string").alias("actual_next_base_fee"),
            (F.col("next_base") - F.col("projected_next"))
            .cast("bigint")
            .alias("deviation_wei"),
        )
        .orderBy("blockNumber")
    )


# Minimal raw view for tx calldata: _RAW's struct spec omits `input`
# (the other tx oracles never read it); read_json ignores unlisted fields,
# so this spec parses just what the selector histogram needs.
_RAW_TX_INPUT = f"""
    read_json('{_JSONL_PATH}', format='newline_delimited', columns={{
      'transactions': 'STRUCT("hash" VARCHAR, "input" VARCHAR)[]'
    }})
"""


@register(
    "eth_selector_histogram",
    oracle=f"""
    WITH tx AS (SELECT unnest(transactions) AS t FROM {_RAW_TX_INPUT})
    SELECT lower(substr(t.input, 3, 8)) AS selector,
           CAST(COUNT(*) AS BIGINT) AS n_calls
    FROM tx
    WHERE length(t.input) >= 10
    GROUP BY 1
    ORDER BY n_calls DESC, selector ASC
    LIMIT 20
    """,
)
def eth_selector_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Function-selector histogram over tx calldata: the first 4 bytes of
    `input` are the ABI method id (keccak prefix of the signature) — the
    standard 'what are people calling' contract-usage readout. Selector
    extraction is a map-side substring of the BINARY column; one count
    shuffle of (4-byte key); top-20 via ordered limit. The fixtures'
    random calldata gives a flat histogram — the shape check is the
    contract, the skew shows on real chains (where AQE skew handling and
    the salted-agg recipe apply).

    Reference capability: calldata lands in ClickHouse as the `input`
    String column (/root/reference/src/main.rs:105, src/schema.rs:37);
    selector rollups are exactly the delegated-SQL surface."""
    tx = _tables(spark)["transactions"]
    return (
        tx.filter(F.length("input") >= 4)
        .select(F.lower(F.hex(F.expr("substring(input, 1, 4)"))).alias("selector"))
        .groupBy("selector")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_calls"))
        .orderBy(F.desc("n_calls"), F.asc("selector"))
        .limit(20)
    )


@register(
    "eth_uncle_rate",
    oracle=f"""
    WITH hdr AS (
        SELECT number, len(uncles) AS n_uncles
        FROM read_json('{_JSONL_PATH}', format='newline_delimited',
                       columns={{'number': 'BIGINT', 'uncles': 'VARCHAR[]'}})
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_blocks,
           CAST(SUM(n_uncles) AS BIGINT) AS n_uncles,
           CAST(SUM(CASE WHEN n_uncles > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blocks_with_uncles,
           CAST(SUM(n_uncles) AS DOUBLE) / COUNT(*) AS uncles_per_block,
           CAST(MAX(n_uncles) AS BIGINT) AS max_uncles
    FROM hdr
    """,
)
def eth_uncle_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncle (ommer) rate over the chain: blocks carrying uncles, uncles
    per block, max per block — the pre-merge network-latency health
    metric (and a parity checkpoint for the blocks table's ARRAY column,
    P5's array-of-hash projection applied to headers). Map-side
    array-length projection, one scalar gather."""
    b = _tables(spark)["blocks"]
    n_unc = F.size(F.col("uncles"))
    return b.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_blocks"),
        F.sum(n_unc).cast("bigint").alias("n_uncles"),
        F.sum(F.when(n_unc > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_blocks_with_uncles"),
        (F.sum(n_unc).cast("double") / F.count(F.lit(1))).alias(
            "uncles_per_block"
        ),
        F.max(n_unc).cast("bigint").alias("max_uncles"),
    )


@register(
    "eth_access_list_stats",
    oracle=f"""
    WITH tx AS (SELECT unnest(transactions) AS t FROM {_RAW}),
    parsed AS (
        SELECT json_transform(t.accessList,
                 '[{{"address":"VARCHAR","storageKeys":["VARCHAR"]}}]') AS al
        FROM tx WHERE t.accessList IS NOT NULL
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_txs_with_list,
           CAST(SUM(len(al)) AS BIGINT) AS total_entries,
           CAST(SUM(list_sum(list_transform(al, e -> len(e.storageKeys))))
                AS BIGINT) AS total_storage_keys,
           CAST(COUNT(DISTINCT al[1].address) AS BIGINT)
             AS n_distinct_first_addresses
    FROM parsed
    """,
)
def eth_access_list_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EIP-2930 access-list analytics: entry and storage-key counts plus
    distinct warmed addresses — the gas-optimization readout (access lists
    pre-warm state; how much do senders actually use them). The pipeline
    stores accessList as a JSON string (P6, reference
    /root/reference/src/main.rs:238-241 serializes it the same way), so
    this is the oracle-checked proof of that column's round-trip: Spark
    re-parses with from_json into a typed array-of-structs, DuckDB with
    json_transform — both then count structurally. Map-side parse, one
    scalar gather."""
    tx = _tables(spark)["transactions"]
    al_type = "array<struct<address:string,storageKeys:array<string>>>"
    parsed = tx.filter(F.col("accessList").isNotNull()).select(
        F.from_json(F.col("accessList"), al_type).alias("al")
    )
    return parsed.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_txs_with_list"),
        F.sum(F.size("al")).cast("bigint").alias("total_entries"),
        F.sum(
            F.expr(
                "aggregate(al, 0, (acc, e) -> acc + size(e.storageKeys))"
            )
        )
        .cast("bigint")
        .alias("total_storage_keys"),
        # try_element_at: NULL out of bounds even under Spark 4's default
        # ANSI mode (a bare al[0] would throw INVALID_ARRAY_INDEX on an
        # empty accessList '[]'), matching DuckDB's al[1] NULL semantics.
        F.countDistinct(F.try_element_at("al", F.lit(1)).getField("address"))
        .cast("bigint")
        .alias("n_distinct_first_addresses"),
    )


@register(
    "eth_block_interval_stats",
    oracle=f"""
    WITH hdr AS (
        SELECT number, CAST(timestamp AS DECIMAL(38,0)) AS ts
        FROM {_RAW_HEADERS}
    ),
    gaps AS (
        SELECT b.number,
               CAST(b.ts - a.ts AS BIGINT) AS interval_sec
        FROM hdr a JOIN hdr b ON b.number = a.number + 1
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_intervals,
           CAST(MIN(interval_sec) AS BIGINT) AS min_interval,
           CAST(MAX(interval_sec) AS BIGINT) AS max_interval,
           ROUND(CAST(SUM(interval_sec) AS DOUBLE) / COUNT(*), 9)
             AS avg_interval,
           CAST(COUNT(CASE WHEN interval_sec > 13 THEN 1 END) AS BIGINT)
             AS n_slow
    FROM gaps
    """,
)
def eth_block_interval_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-block time distribution: consecutive-header self-join on
    number+1 (equivalently parentHash = hash — the reference's chain walk
    at /root/reference/src/main.rs:60-66 follows numbers the same way),
    timestamp deltas as exact integers. The chain-liveness dashboard:
    post-merge Ethereum slots are 12 s, so n_slow counts missed slots.
    The self-join is number-keyed and the block-header table is tiny
    relative to any body table — at 100 TB of chain data headers are
    still ~1 row per 12 s, so this stays a broadcast join; the aggregate
    is one scalar gather of partials."""
    b = _tables(spark)["blocks"]
    hdr = b.select(
        "number", F.col("timestamp").cast("decimal(38,0)").alias("ts")
    )
    a = hdr.alias("a")
    nxt = hdr.alias("b")
    gaps = a.join(
        F.broadcast(nxt), F.col("b.number") == F.col("a.number") + 1
    ).select(
        (F.col("b.ts") - F.col("a.ts")).cast("bigint").alias("interval_sec")
    )
    return gaps.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
        F.min("interval_sec").cast("bigint").alias("min_interval"),
        F.max("interval_sec").cast("bigint").alias("max_interval"),
        F.round(
            F.sum("interval_sec").cast("double") / F.count(F.lit(1)), 9
        ).alias("avg_interval"),
        F.count(F.when(F.col("interval_sec") > 13, 1))
        .cast("bigint")
        .alias("n_slow"),
    )


@register(
    "eth_value_gini",
    oracle=f"""
    WITH tx AS (SELECT unnest(transactions) AS t FROM {_RAW}),
    v AS (
        SELECT CAST(CAST(t.value AS DECIMAL(38,0)) // 1000000000 AS BIGINT)
                 AS gwei,
               t.hash AS h
        FROM tx
    ),
    ranked AS (
        SELECT gwei,
               ROW_NUMBER() OVER (ORDER BY gwei, h) AS rk,
               COUNT(*) OVER () AS n
        FROM v
    )
    SELECT CAST(MIN(n) AS BIGINT) AS n_txs,
           CAST(SUM(gwei) AS BIGINT) AS total_gwei,
           ROUND(CAST(2 * SUM(rk * gwei) - (MIN(n) + 1) * SUM(gwei)
                      AS DOUBLE) / (MIN(n) * SUM(gwei)), 9) AS gini
    FROM ranked
    """,
)
def eth_value_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of transferred value across transactions — the
    whale-concentration readout (G->1: all value moves in a few txs).
    Same exact-rank formulation as stat_gini_concentration; values
    quantize to integer gwei (u256 wei div 1e9) so every product fits in
    BIGINT and both engines sum identical integers. The global rank runs
    through the distributed exact-rank operator (range partition +
    per-partition offsets, operators/ranking.py) — never a single-task
    window; tie-break on tx hash pins cross-engine order."""
    from chainhouse_spark.operators.ranking import global_row_number

    tx = _tables(spark)["transactions"]
    v = tx.select(
        (F.col("value").cast("decimal(38,0)") / F.lit(1000000000))
        .cast("decimal(38,0)")
        .cast("bigint")
        .alias("gwei_raw"),
        F.col("hash").alias("h"),
    ).select(F.col("gwei_raw").alias("gwei"), "h")
    # materialize_input (round-12 W9): the gwei projection is MAP-ONLY off
    # the transactions scan, so the range-sampling job would re-run the
    # scan + u256 decimal division per call otherwise.
    ranked = global_row_number(
        v, [F.asc("gwei"), F.asc("h")], "rk", materialize_input=True
    )
    return ranked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_txs"),
        F.sum("gwei").cast("bigint").alias("total_gwei"),
        F.round(
            (
                2 * F.sum(F.col("rk") * F.col("gwei"))
                - (F.count(F.lit(1)) + 1) * F.sum("gwei")
            ).cast("double")
            / (F.count(F.lit(1)) * F.sum("gwei")),
            9,
        ).alias("gini"),
    )


@register(
    "eth_topic0_entropy",
    oracle=f"""
    WITH lg AS (
        SELECT unnest(r.logs) AS l
        FROM (SELECT unnest(receipts) AS r FROM {_RAW})
    ),
    cnt AS (
        SELECT l.topics[1] AS topic0, CAST(COUNT(*) AS BIGINT) AS c
        FROM lg WHERE len(l.topics) > 0
        GROUP BY l.topics[1]
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM cnt)
    SELECT
        CAST((SELECT COUNT(*) FROM cnt) AS BIGINT) AS n_signatures,
        CAST((SELECT n FROM tot) AS BIGINT) AS n_logs,
        CAST(SUM(CAST(ROUND(
            -(CAST(c AS DOUBLE) / (SELECT n FROM tot))
              * LN(CAST(c AS DOUBLE) / (SELECT n FROM tot)) / LN(2.0), 6)
          AS DECIMAL(20,6))) AS DOUBLE) AS entropy_bits,
        ROUND(CAST(MAX(c) AS DOUBLE) / (SELECT n FROM tot), 9)
          AS top_signature_share
    FROM cnt
    """,
)
def eth_topic0_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the event-signature (topic0) distribution — how
    diverse is on-chain activity (H -> 0 means one contract event, e.g. a
    single token's Transfer, dominates the chain). Counts are exact; each
    -p*log2(p) term rounds to 6 decimals BEFORE the decimal sum (the
    stat_entropy recipe: absorbs libm-vs-JVM LN ulps and float order).
    One signature-keyed aggregate, then math over |signatures| rows."""
    logs = _tables(spark)["events"]
    topic0 = F.concat(
        F.lit("0x"), F.lower(F.hex(F.col("topics").getItem(0)))
    )
    cnt = (
        logs.filter(F.size("topics") > 0)
        .groupBy(topic0.alias("topic0"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    tot = cnt.agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_signatures"),
    )
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(-p * F.log(p) / F.log(F.lit(2.0)), 6).cast("decimal(20,6)")
    return (
        cnt.crossJoin(F.broadcast(tot))
        .agg(
            F.min("n_signatures").cast("bigint").alias("n_signatures"),
            F.min("n").cast("bigint").alias("n_logs"),
            F.sum(term).cast("double").alias("entropy_bits"),
            F.round(F.max("c").cast("double") / F.min("n"), 9).alias(
                "top_signature_share"
            ),
        )
    )


@register(
    "eth_basefee_fullness_corr",
    oracle=f"""
    WITH pts AS (
        SELECT CAST(CAST(baseFeePerGas AS DECIMAL(38,0)) // 1000000000
                    AS BIGINT) AS fee_gwei,
               CAST(ROUND(1000000.0 * CAST(gasUsed AS DECIMAL(38,0))
                          / CAST(gasLimit AS DECIMAL(38,0)), 0) AS BIGINT)
                 AS full_ppm
        FROM {_RAW_HEADERS}
    ),
    m AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(fee_gwei) AS BIGINT) AS sx,
               CAST(SUM(full_ppm) AS BIGINT) AS sy,
               CAST(SUM(fee_gwei * fee_gwei) AS DECIMAL(38,0)) AS sxx,
               CAST(SUM(full_ppm * full_ppm) AS DECIMAL(38,0)) AS syy,
               CAST(SUM(fee_gwei * full_ppm) AS DECIMAL(38,0)) AS sxy
        FROM pts
    )
    SELECT n AS n_blocks,
           ROUND((n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
                 / (SQRT(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
                    * SQRT(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)),
                 9) AS fee_fullness_corr
    FROM m
    """,
)
def eth_basefee_fullness_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EIP-1559 fee-market elasticity check: correlation between a block's
    base fee and its fullness. The protocol raises the base fee after
    full blocks, so a healthy fee market shows positive correlation at
    congestion — the monitoring readout behind gas-price UX. Fees
    quantize to gwei and fullness to ppm (integer moments, exact sums in
    any order); the Pearson expansion is the one shared float. Map-side
    quantization + a single scalar aggregate."""
    b = _tables(spark)["blocks"]
    pts = b.select(
        (F.col("baseFeePerGas").cast("decimal(38,0)") / F.lit(1000000000))
        .cast("decimal(38,0)")
        .cast("bigint")
        .alias("fee_gwei"),
        F.round(
            F.lit(1000000.0)
            * F.col("gasUsed").cast("decimal(38,0)").cast("double")
            / F.col("gasLimit").cast("decimal(38,0)").cast("double"),
            0,
        )
        .cast("bigint")
        .alias("full_ppm"),
    )
    m = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("fee_gwei").cast("bigint").alias("sx"),
        F.sum("full_ppm").cast("bigint").alias("sy"),
        F.sum(F.col("fee_gwei") * F.col("fee_gwei"))
        .cast("decimal(38,0)")
        .alias("sxx"),
        F.sum(F.col("full_ppm") * F.col("full_ppm"))
        .cast("decimal(38,0)")
        .alias("syy"),
        F.sum(F.col("fee_gwei") * F.col("full_ppm"))
        .cast("decimal(38,0)")
        .alias("sxy"),
    )
    n = F.col("n")
    corr = (
        n * F.col("sxy").cast("double") - F.col("sx").cast("double") * F.col("sy")
    ) / (
        F.sqrt(n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx"))
        * F.sqrt(n * F.col("syy").cast("double") - F.col("sy").cast("double") * F.col("sy"))
    )
    return m.select(
        n.alias("n_blocks"), F.round(corr, 9).alias("fee_fullness_corr")
    )
