"""Chain-reorg canonicalization: mid-chain forks, tip forks, no-fork
identity, and the bounded-iteration contract."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chainhouse_spark.operators.reorg import canonical_chain, reorged_out


def _mk(spark, rows):
    return spark.createDataFrame(rows, ["number", "hash", "parentHash"])


def _chain(n, pref="c"):
    return [
        (i, f"{pref}{i}", f"{pref}{i - 1}" if i > 0 else "genesis")
        for i in range(n)
    ]


def test_no_fork_is_identity(spark):
    blocks = _mk(spark, _chain(10))
    canon = canonical_chain(blocks)
    assert canon.count() == 10
    assert reorged_out(blocks).count() == 0


def test_mid_chain_fork_resolved_by_parent_walk(spark):
    rows = _chain(10)
    # stale fork at heights 5-7, anchored at canonical height 4
    rows += [(5, "f5", "c4"), (6, "f6", "f5"), (7, "f7", "f6")]
    blocks = _mk(spark, rows)
    canon = {(r.number, r.hash) for r in canonical_chain(blocks).collect()}
    assert canon == {(i, f"c{i}") for i in range(10)}
    out = {(r.number, r.hash) for r in reorged_out(blocks).collect()}
    assert out == {(5, "f5"), (6, "f6"), (7, "f7")}


def test_tip_fork_resolved_by_max_hash_then_walk(spark):
    rows = _chain(8)  # canonical 0..7
    # two competing tips at 8-9: 'z' branch wins the max-hash tiebreak and
    # drags its whole fork in by parent links
    rows += [(8, "a8", "c7"), (9, "a9", "a8")]
    rows += [(8, "z8", "c7"), (9, "z9", "z8")]
    blocks = _mk(spark, rows)
    canon = {(r.number, r.hash) for r in canonical_chain(blocks).collect()}
    assert canon == {(i, f"c{i}") for i in range(8)} | {(8, "z8"), (9, "z9")}
    out = {(r.number, r.hash) for r in reorged_out(blocks).collect()}
    assert out == {(8, "a8"), (9, "a9")}


def test_two_separate_forks_resolve_in_parallel(spark):
    rows = _chain(20)
    rows += [(3, "f3", "c2")]
    rows += [(10, "g10", "c9"), (11, "g11", "g10")]
    blocks = _mk(spark, rows)
    out = {(r.number, r.hash) for r in reorged_out(blocks).collect()}
    assert out == {(3, "f3"), (10, "g10"), (11, "g11")}


def test_deep_run_exceeding_max_depth_raises(spark):
    rows = _chain(8)
    rows += [(i, f"f{i}", f"f{i - 1}" if i > 4 else "c3") for i in range(4, 8)]
    blocks = _mk(spark, rows)
    with pytest.raises(ValueError, match="max_depth"):
        canonical_chain(blocks, max_depth=2)


def test_duplicate_ingest_rows_are_harmless(spark):
    # the follower re-fetching a height must not create phantom ambiguity
    rows = _chain(6) + _chain(6)  # every row twice
    blocks = _mk(spark, rows)
    assert canonical_chain(blocks).count() == 6
    assert reorged_out(blocks).count() == 0


def test_streaming_follower_heals_reorg(spark, tmp_path):
    """Two micro-batches: the chain, then a deeper fork that wins by tip.
    The canonical table must converge to the fork chain — stale blocks
    evicted — and a full replay must be a no-op."""
    import pandas as pd

    from chainhouse_spark.streaming.reorg_follower import run_reorg_aware_ingest

    landing = str(tmp_path / "landing")
    raw_dir = str(tmp_path / "raw")
    canon_dir = str(tmp_path / "canon")

    cols = ["number", "hash", "parentHash"]
    batch1 = [(i, f"c{i}", f"c{i - 1}" if i else "genesis") for i in range(7)]
    # reorg: heights 5-6 re-mined, fork extends to a new tip at 8
    batch2 = [(5, "f5", "c4"), (6, "f6", "f5"), (7, "f7", "f6"), (8, "f8", "f7")]
    import os

    os.makedirs(landing, exist_ok=True)
    pd.DataFrame(batch1, columns=cols).to_parquet(f"{landing}/b1.parquet")
    pd.DataFrame(batch2, columns=cols).to_parquet(f"{landing}/b2.parquet")

    schema = spark.read.parquet(landing).schema

    def drain(ckpt: str) -> None:
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(landing)
        )
        q = run_reorg_aware_ingest(stream, raw_dir, canon_dir, str(tmp_path / ckpt))
        q.awaitTermination(180)

    drain("ckpt1")
    got = {(r.number, r.hash) for r in spark.read.parquet(canon_dir).collect()}
    want = {(i, f"c{i}") for i in range(5)} | {
        (5, "f5"), (6, "f6"), (7, "f7"), (8, "f8")
    }
    assert got == want
    # raw keeps everything (append-only history)
    assert spark.read.parquet(raw_dir).drop("epoch").dropDuplicates(
        ["number", "hash"]
    ).count() == len(batch1) + len(batch2)

    drain("ckpt2")  # full replay, fresh checkpoint: epoch guard + overwrite
    got2 = {(r.number, r.hash) for r in spark.read.parquet(canon_dir).collect()}
    assert got2 == want


def test_broken_parent_linkage_fails_loudly(spark):
    # two hashes at height 5, neither matching the anchor's parentHash:
    # the walk cannot resolve the height and must raise, not silently drop
    rows = [(i, f"c{i}", f"c{i - 1}") for i in (0, 1, 2, 3, 4, 6, 7)]
    rows += [(5, "x5", "c4"), (5, "y5", "c4")]  # c6.parent = c5 matches neither
    blocks = _mk(spark, rows)
    with pytest.raises(ValueError, match="incomplete"):
        canonical_chain(blocks)


def test_canonicalize_warehouse_evicts_fork_and_children(spark, tmp_path):
    """A stale fork block (same height, different hash) and the child rows
    it parented are evicted from all four tables; canonical rows and
    unrelated children survive untouched."""
    from chainhouse_spark.sinks.parquet import (
        canonicalize_warehouse,
        read_table,
        write_all,
    )
    from chainhouse_spark.sources.fixtures import raw_blocks_df
    from chainhouse_spark.transforms import all_tables_from_raw

    t = all_tables_from_raw(raw_blocks_df(spark, n_blocks=6, seed=42))
    fake = b"\xff" * 32
    stale_block = t["blocks"].filter(F.col("number") == 3).withColumn(
        "hash", F.lit(fake)
    )
    stale_tx = t["transactions"].filter(F.col("blockNumber") == 3).withColumn(
        "blockHash", F.lit(fake)
    )
    n_stale_tx = stale_tx.count()
    assert n_stale_tx > 0
    warehouse = {
        "blocks": t["blocks"].unionByName(stale_block),
        "transactions": t["transactions"].unionByName(stale_tx),
        "events": t["events"],
        "withdraws": t["withdraws"],
    }
    base = str(tmp_path / "wh")
    write_all(warehouse, base)

    # Default confirmation window (64) >> the 6-block fixture: the fork at
    # height 3 is near-tip, so nothing may be evicted — an in-flight reorg
    # could make the "stale" side the true chain.
    assert set(canonicalize_warehouse(spark, base).values()) == {0}
    assert read_table(spark, "blocks", base).count() == 7

    evicted = canonicalize_warehouse(spark, base, confirmation_depth=0)
    assert evicted["blocks"] == 1
    assert evicted["transactions"] == n_stale_tx
    assert evicted["events"] == 0 and evicted["withdraws"] == 0

    blocks = read_table(spark, "blocks", base)
    assert blocks.count() == 6
    assert blocks.filter(F.col("hash") == F.lit(fake)).count() == 0
    tx = read_table(spark, "transactions", base)
    assert tx.count() == t["transactions"].count()
    assert tx.filter(F.col("blockHash") == F.lit(fake)).count() == 0

    # idempotent: a second pass evicts nothing
    assert set(
        canonicalize_warehouse(spark, base, confirmation_depth=0).values()
    ) == {0}


def test_compact_targeted_buckets(spark, tmp_path):
    """Targeted compaction (dynamic partition overwrite) dedups ONLY the
    named block_buckets; untouched buckets' files stay byte-identical."""
    import os

    from chainhouse_spark.sinks.parquet import (
        compact_table,
        read_table,
        write_table,
    )
    from chainhouse_spark.sources.fixtures import raw_blocks_df
    from chainhouse_spark.transforms import all_tables_from_raw

    t = all_tables_from_raw(raw_blocks_df(spark, n_blocks=8, seed=7))
    base = str(tmp_path / "wh")
    # bucket_size=4 -> blocks 0-3 in bucket 0, 4-7 in bucket 1
    write_table(t["blocks"], "blocks", base, bucket_size=4)
    # re-ingest a slice covering bucket 1 only -> duplicates at rest there
    dup = t["blocks"].filter(F.col("number") >= 4)
    write_table(dup, "blocks", base, bucket_size=4, mode="append")
    assert read_table(spark, "blocks", base).count() == 12

    def file_state(bucket):
        d = f"{base}/blocks/block_bucket={bucket}"
        return sorted(
            (f, os.path.getmtime(os.path.join(d, f)), os.path.getsize(os.path.join(d, f)))
            for f in os.listdir(d)
            if f.endswith(".parquet")
        )

    before_b0 = file_state(0)
    compact_table(spark, "blocks", base, bucket_size=4, buckets=[1])
    # bucket 1 deduped, bucket 0 rows intact, total back to 8
    healed = read_table(spark, "blocks", base)
    assert healed.count() == 8
    assert healed.filter("block_bucket = 1").count() == 4
    # bucket 0 files untouched byte-for-byte (name, mtime, size)
    assert file_state(0) == before_b0
    # no-op call
    compact_table(spark, "blocks", base, bucket_size=4, buckets=[])
    assert read_table(spark, "blocks", base).count() == 8
