"""Streaming continuous-aggregate maintenance: the TimescaleDB continuous
aggregate / ClickHouse AggregatingMergeTree materialized-view loop, built
from `operators/incremental.py` state algebra + foreachBatch.

Each micro-batch computes a PARTIAL aggregate state for only its own rows
(one narrow pass), merges it with the persisted state table (a union +
group-by over |keys| state rows, not |fact| rows), and atomically swaps the
state directory. Because every combine function is associative and
commutative over exact types, the maintained state is bit-identical to a
from-scratch aggregation of everything ingested so far — batch boundaries
cannot show through. That is the 100 TB contract: history is never
rescanned, the nightly cost is one pass over the new slice plus a
key-cardinality-sized merge.

The swap is write-temp-then-rename (same crash-safety pattern as
`sinks/parquet.py::compact_table`): a failed batch leaves the previous state intact and
the checkpoint replays the batch; the merge is idempotent per epoch because
it rebuilds new-state from (old-state, batch) rather than appending.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame

from chainhouse_spark.operators.incremental import merge_states, partial_state


def run_incremental_rollup(
    stream: DataFrame,
    state_dir: str,
    checkpoint: str,
    keys: list[str],
    measure: Column,
) -> "StreamingQuery":  # noqa: F821
    """Maintain a per-key aggregate state table under `state_dir` from a
    stream. Read the live rollup any time with
    `finalize(spark.read.parquet(state_dir))`."""

    marker = state_dir.rstrip("/") + ".last_epoch"

    def _merge(batch: DataFrame, epoch: int) -> None:
        # Exactly-once merge from at-least-once delivery: a replayed epoch
        # (state swapped but the checkpoint commit was lost) must not merge
        # twice, so the last applied epoch is recorded WITH the state swap.
        if os.path.isfile(marker) and int(open(marker).read()) >= epoch:
            return
        spark = batch.sparkSession
        new = partial_state(batch, keys, measure)
        states = [new]
        if os.path.isdir(state_dir):
            states.append(spark.read.parquet(state_dir))
        merged = merge_states(states, keys)
        tmp = state_dir.rstrip("/") + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        old = state_dir.rstrip("/") + ".old"
        if os.path.isdir(state_dir):
            os.rename(state_dir, old)
        os.rename(tmp, state_dir)
        with open(marker, "w") as fh:
            fh.write(str(epoch))
        shutil.rmtree(old, ignore_errors=True)

    return (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
