"""Reorg-aware streaming block ingest: the follower loop that HEALS.

The reference's follower (src/main.rs:167-239) appends whatever the node
returns; after a reorg its ClickHouse keeps both the stale and the
canonical block at the affected heights forever (ReplacingMergeTree keyed
by hash — see operators/reorg.py). This foreachBatch loop maintains, next
to the append-only raw landing, a `canonical/` table that always holds
exactly one block per height — the parentHash-consistent chain — by
re-deriving it with `canonical_chain` after every micro-batch.

Crash-safety is the established state-swap idiom (streaming/rollup.py):
  - the raw append is epoch-partitioned (`raw/epoch=N`) and written with
    overwrite, so an at-least-once replay rewrites its own slice instead
    of duplicating rows;
  - the canonical table is write-temp-then-rename, with the last applied
    epoch recorded alongside the swap — a replayed epoch is a no-op.

Scale note: the canonicalization input is the BLOCKS table (one row per
height per fork — thousands of rows per day, not the transaction volume),
so the per-batch re-derivation is cheap absolutely. When even that
matters, the frozen prefix is immutable: restrict the walk to heights
above `tip - reorg_window` and union the prefix unchanged — the operator
already touches only ambiguous heights, so the extra win is just scan
pruning on the raw read.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame

from chainhouse_spark.operators.reorg import canonical_chain


def run_reorg_aware_ingest(
    blocks_stream: DataFrame,
    raw_dir: str,
    canon_dir: str,
    checkpoint: str,
    hash_col: str = "hash",
    number_col: str = "number",
    parent_col: str = "parentHash",
) -> "StreamingQuery":  # noqa: F821
    """Land every fetched block under `raw_dir` (append-only, epoch
    slices) and keep `canon_dir` = the full block rows of the current
    canonical chain. Read the healed view any time with
    `spark.read.parquet(canon_dir)`."""
    marker = canon_dir.rstrip("/") + ".last_epoch"

    def _apply(batch: DataFrame, epoch: int) -> None:
        if os.path.isfile(marker) and int(open(marker).read()) >= epoch:
            return
        spark = batch.sparkSession
        batch.write.mode("overwrite").parquet(
            os.path.join(raw_dir, f"epoch={epoch}")
        )
        raw = spark.read.parquet(raw_dir).drop("epoch")
        canon = canonical_chain(raw, hash_col, number_col, parent_col)
        healed = raw.dropDuplicates([number_col, hash_col]).join(
            canon.withColumnRenamed("number", number_col).withColumnRenamed(
                "hash", hash_col
            ),
            [number_col, hash_col],
            "left_semi",
        )
        tmp = canon_dir.rstrip("/") + ".tmp"
        healed.write.mode("overwrite").parquet(tmp)
        old = canon_dir.rstrip("/") + ".old"
        if os.path.isdir(canon_dir):
            os.rename(canon_dir, old)
        os.rename(tmp, canon_dir)
        with open(marker, "w") as fh:
            fh.write(str(epoch))
        shutil.rmtree(old, ignore_errors=True)

    return (
        blocks_stream.writeStream.foreachBatch(_apply)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
