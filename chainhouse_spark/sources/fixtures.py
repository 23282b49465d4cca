"""Deterministic raw-block fixture generator (FIXTURES.md §A).

Produces the merged shape of the reference's two RPCs per height —
eth_getBlockByNumber(n, true) + eth_getBlockReceipts(n)
(src/main.rs:173-174) — as rows of schemas.RAW_BLOCK, covering every edge
case the reference's code paths handle:

- pre/post EIP-1559  (baseFeePerGas / maxFeePerGas NULL vs set,
  src/main.rs:191-193)
- pre/post EIP-658   (receipt root vs status, src/main.rs:251-252)
- pre/post Shanghai  (withdrawals + withdrawalsRoot NULL vs set,
  src/main.rs:200-202, 277)
- contract creation  (to NULL + contractAddress set, src/main.rs:221, 242)
- type-2 tx with JSON accessList (src/main.rs:238-241)
- txs with 0 and ≥3 logs; topics arrays of length 0–4; empty block; uncles.

All content derives from sha256 of (seed, role, index) — bit-stable across
runs and machines.
"""

from __future__ import annotations

import hashlib
import json
import os
import tempfile
from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession

from chainhouse_spark.schemas import RAW_BLOCK

GENESIS_TS = 1_600_000_000


def _h(seed: int, role: str, i: int, nbytes: int = 32) -> bytes:
    out = b""
    c = 0
    while len(out) < nbytes:
        out += hashlib.sha256(f"{seed}:{role}:{i}:{c}".encode()).digest()
        c += 1
    return out[:nbytes]


def _u(seed: int, role: str, i: int, mod: int) -> int:
    return int.from_bytes(_h(seed, role, i, 8), "big") % mod


def _make_tx(seed: int, block_num: int, idx: int, era: str) -> tuple[dict, dict]:
    """One (transaction, receipt) pair. `era` in {legacy, eip1559, shanghai}."""
    key = block_num * 1000 + idx
    txhash = _h(seed, "txh", key)
    is_create = era != "legacy" and idx % 4 == 3  # contract creation
    is_type2 = era != "legacy" and idx % 2 == 0
    gas_used = 21000 + _u(seed, "gasu", key, 200_000)

    tx = {
        "hash": txhash,
        "transactionIndex": idx,
        "chainId": Decimal(1) if era != "legacy" else None,
        "type": 2 if is_type2 else 0,
        "from": _h(seed, "from", key, 20),
        "to": None if is_create else _h(seed, "to", key, 20),
        "value": Decimal(_u(seed, "val", key, 10**20)),
        "nonce": Decimal(_u(seed, "nonce", key, 10_000)),
        "input": _h(seed, "input", key, 4 + _u(seed, "ilen", key, 64)),
        "gas": Decimal(gas_used + _u(seed, "gpad", key, 50_000)),
        "gasPrice": Decimal(10**9 + _u(seed, "gp", key, 10**10)),
        "maxFeePerGas": Decimal(2 * 10**9 + _u(seed, "mf", key, 10**10))
        if is_type2
        else None,
        "maxPriorityFeePerGas": Decimal(10**8 + _u(seed, "mp", key, 10**9))
        if is_type2
        else None,
        "r": _h(seed, "sig_r", key),
        "s": _h(seed, "sig_s", key),
        "v": _u(seed, "v", key, 2) + 27,
        "accessList": json.dumps(
            [
                {
                    "address": "0x" + _h(seed, "al", key, 20).hex(),
                    "storageKeys": ["0x" + _h(seed, "alk", key).hex()],
                }
            ]
        )
        if is_type2 and idx % 4 == 0
        else None,
    }

    n_logs = [0, 3, 1, 4, 2][idx % 5]
    logs = [
        {
            "address": _h(seed, "lga", key * 10 + j, 20),
            "logIndex": Decimal(idx * 10 + j),
            "removed": False,
            "topics": [_h(seed, "top", key * 100 + j * 10 + t) for t in range(j % 5)],
            "data": _h(seed, "lgd", key * 10 + j, 32 * (1 + j % 3)),
        }
        for j in range(n_logs)
    ]
    receipt = {
        "transactionHash": txhash,
        "contractAddress": _h(seed, "ca", key, 20) if is_create else None,
        "cumulativeGasUsed": Decimal(gas_used),  # fixed up to a running sum by the caller
        "effectiveGasPrice": Decimal(10**9 + _u(seed, "egp", key, 10**10)),
        "gasUsed": Decimal(gas_used),
        "logsBloom": _h(seed, "rbloom", key, 256),
        # pre-EIP-658: state root set, status NULL; post: the reverse
        "root": _h(seed, "rroot", key) if era == "legacy" else None,
        "status": None if era == "legacy" else _u(seed, "status", key, 10) % 2,
        "logs": logs,
    }
    return tx, receipt


def generate_raw_blocks(n_blocks: int = 5, seed: int = 42) -> list[dict]:
    """`n_blocks` consecutive blocks: 0 = empty pre-1559; 1 = legacy
    (pre-658 receipts, uncles); 2+ = post-1559; last two = post-Shanghai."""
    blocks = []
    prev_hash = b"\x00" * 32
    for n in range(n_blocks):
        era = "legacy" if n <= 1 else ("shanghai" if n >= n_blocks - 2 else "eip1559")
        n_txs = 0 if n == 0 else 3 + (n * 2) % 6
        pairs = [_make_tx(seed, n, i, era) for i in range(n_txs)]
        running = 0
        for _, r in pairs:
            running += int(r["gasUsed"])
            r["cumulativeGasUsed"] = Decimal(running)
        gas_used = running

        withdrawals = (
            [
                {
                    "index": n * 16 + k,
                    "validatorIndex": _u(seed, "vidx", n * 16 + k, 1_000_000),
                    "address": _h(seed, "wadr", n * 16 + k, 20),
                    "amount": Decimal(_u(seed, "wamt", n * 16 + k, 10**13)),
                }
                for k in range(2 + n % 3)
            ]
            if era == "shanghai"
            else None
        )
        blk_hash = _h(seed, "blk", n)
        blocks.append(
            {
                "hash": blk_hash,
                "number": n,
                "parentHash": prev_hash,
                "uncles": [_h(seed, "unc", n * 10 + u) for u in range(n % 3)],
                "sha3Uncles": _h(seed, "shu", n),
                "totalDifficulty": Decimal(10**15 + n),
                "miner": _h(seed, "miner", n, 20),
                "difficulty": Decimal(2**40 + _u(seed, "diff", n, 10**9)),
                "nonce": _h(seed, "bnonce", n, 8),
                "mixHash": _h(seed, "mix", n),
                "baseFeePerGas": None
                if era == "legacy"
                else Decimal(10**9 + _u(seed, "bf", n, 10**9)),
                "gasLimit": Decimal(30_000_000),
                "gasUsed": Decimal(gas_used),
                "stateRoot": _h(seed, "sroot", n),
                "transactionsRoot": _h(seed, "troot", n),
                "receiptsRoot": _h(seed, "rcroot", n),
                "logsBloom": _h(seed, "bloom", n, 256),
                "withdrawalsRoot": _h(seed, "wroot", n) if era == "shanghai" else None,
                "extraData": _h(seed, "extra", n, 1 + n % 32),
                "timestamp": Decimal(GENESIS_TS + n * 12),
                "size": Decimal(500 + gas_used // 100),
                "transactions": [t for t, _ in pairs],
                "receipts": [r for _, r in pairs],
                "withdrawals": withdrawals,
            }
        )
        prev_hash = blk_hash
    return blocks


def raw_blocks_df(
    spark: SparkSession, n_blocks: int = 5, seed: int = 42
) -> DataFrame:
    return spark.createDataFrame(generate_raw_blocks(n_blocks, seed), RAW_BLOCK)


def _json_safe(v):
    """JSON encoding of a raw block: bytes -> 0x-hex, Decimal -> digit string
    (u256 values overflow JSON readers' int64 path; strings round-trip)."""
    if isinstance(v, bytes):
        return "0x" + v.hex()
    if isinstance(v, Decimal):
        return str(int(v))
    if isinstance(v, list):
        return [_json_safe(x) for x in v]
    if isinstance(v, dict):
        return {k: _json_safe(x) for k, x in v.items()}
    return v


def write_raw_blocks_jsonl(path: str, n_blocks: int = 5, seed: int = 42) -> str:
    """Serialize the deterministic raw fixture blocks as JSONL so an
    independent engine (DuckDB read_json) can replay the flatten pipeline
    as an oracle — see queries/ethereum.py.

    Written atomically (temp file + os.replace) and skipped when the bytes
    are already on disk: the path is shared across concurrently-importing
    processes (builder replay + driver harness), and an unconditional
    in-place rewrite can tear a reader mid-overwrite — the one plausible
    cause of round 4's single eth_erc20_transfer_decode hash flake."""
    payload = "".join(
        json.dumps(_json_safe(b)) + "\n" for b in generate_raw_blocks(n_blocks, seed)
    ).encode()
    try:
        with open(path, "rb") as f:
            if f.read() == payload:
                return path
    except OSError:
        pass
    fd, tmp = tempfile.mkstemp(
        dir=os.path.dirname(path) or ".", prefix=os.path.basename(path) + ".tmp"
    )
    try:
        with os.fdopen(fd, "wb") as f:
            f.write(payload)
        os.replace(tmp, path)
    except BaseException:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        raise
    return path
