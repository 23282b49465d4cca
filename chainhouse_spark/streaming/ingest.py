"""Streaming ingest — the reference's batch range loop (src/main.rs:172)
re-expressed as a continuous pipeline (SURVEY.md §7.8, optional extension
made first-class).

Topology:

    landing zone (raw block files)  --readStream-->  RAW_BLOCK rows
        -> the SAME batch transforms (they are narrow projections/explodes,
           so they lift to streaming unchanged)
        -> streaming dedup within a watermark (the K8 contract under
           unbounded input: exact within the lateness horizon, which is
           strictly stronger than ReplacingMergeTree's "eventually")
        -> sinks (parquet append / foreachBatch -> JDBC) or windowed aggs.

Event time is the block timestamp; late blocks beyond the watermark are
dropped from windowed aggregates (they still land in the raw tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.schemas import RAW_BLOCK
from chainhouse_spark.transforms import transactions_from_raw


def stream_raw_blocks(
    spark: SparkSession, landing_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream of raw blocks (one parquet file per micro-batch
    slice in tests; a cloud landing bucket in production)."""
    reader = spark.readStream.schema(RAW_BLOCK)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    return reader.parquet(landing_dir)


def stream_transactions(
    raw_stream: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """The batch transform lifted to streaming, with event-time and
    watermarked exact dedup on the K8 key.

    `watermark` is the lateness horizon: how far behind the max seen block
    timestamp a block may arrive and still be deduped/aggregated exactly.
    """
    tx = transactions_from_raw(raw_stream, dedup=False)
    return (
        tx.withColumn(
            "event_time",
            F.expr("CAST(timestamp_seconds(CAST(blockTimestamp AS BIGINT)) AS TIMESTAMP)"),
        )
        .withWatermark("event_time", watermark)
        .dropDuplicatesWithinWatermark(["hash"])
    )


def windowed_gas(tx_stream: DataFrame, window: str = "1 minute") -> DataFrame:
    """Per-window gas totals with late-data handling — the canonical
    streaming aggregation (watermark bounds state; append-mode emits each
    window once it is final)."""
    return (
        tx_stream.groupBy(F.window("event_time", window).alias("w"))
        .agg(
            F.sum(F.col("gasUsed").cast("long")).alias("total_gas"),
            F.count(F.lit(1)).alias("n_tx"),
            F.approx_count_distinct("from").alias("n_senders"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "total_gas",
            "n_tx",
            "n_senders",
        )
    )


def run_to_memory(
    df: DataFrame, name: str, output_mode: str = "append"
) -> "StreamingQuery":  # noqa: F821
    """Drain all available input into an in-memory table (tests/inspection)."""
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    return q


def run_to_parquet(
    df: DataFrame, path: str, checkpoint: str
) -> "StreamingQuery":  # noqa: F821
    """Continuous append to the at-rest layout with exactly-once file-sink
    semantics via the checkpoint (the streaming K4/K7)."""
    return (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def stream_blocks(raw_stream: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """The blocks transform lifted to streaming with event time."""
    from chainhouse_spark.transforms import blocks_from_raw

    b = blocks_from_raw(raw_stream, dedup=False)
    return b.withColumn(
        "b_event_time",
        F.expr("CAST(timestamp_seconds(CAST(`timestamp` AS BIGINT)) AS TIMESTAMP)"),
    ).withWatermark("b_event_time", watermark)


def stream_stream_tx_block_join(
    tx_stream: DataFrame, block_stream: DataFrame, interval: str = "5 minutes"
) -> DataFrame:
    """Stream-stream inner join: each transaction matched to its block row.

    Both sides are watermarked, and the time-range predicate bounds the join
    state: a buffered row is dropped once the other side's watermark passes
    its event time + interval. Output: one row per tx with block gas stats —
    the streaming twin of the batch F2/F5 denormalization.
    """
    b = block_stream.select(
        F.col("hash").alias("b_hash"),
        F.col("gasUsed").alias("block_gasUsed"),
        F.col("gasLimit").alias("block_gasLimit"),
        "b_event_time",
    )
    t = tx_stream.select("hash", "blockHash", "gasUsed", "event_time")
    return t.join(
        b,
        F.expr(
            f"""
            blockHash = b_hash AND
            event_time >= b_event_time - INTERVAL {interval} AND
            event_time <= b_event_time + INTERVAL {interval}
            """
        ),
        "inner",
    )


def stream_static_enrich(tx_stream: DataFrame, labels: DataFrame) -> DataFrame:
    """Stream-static join: enrich each transaction with a slowly-changing
    dimension (address labels). The static side is re-resolved every
    micro-batch (picks up dimension updates without restart) and broadcast —
    per-batch cost is one broadcast of the dim, zero shuffle of the stream.
    At 100 TB/day stream rates the dim stays broadcast-sized (addresses with
    labels ≪ stream rows); if it ever outgrows that, pre-bucket both sides.
    """
    lab = F.broadcast(labels.select(F.col("address").alias("addr"), "label"))
    return tx_stream.join(lab, F.col("from") == F.col("addr"), "left").drop("addr")


def run_foreach_batch_upsert(
    df: DataFrame, target_dir: str, checkpoint: str, keys: list[str]
) -> "StreamingQuery":  # noqa: F821
    """foreachBatch idempotent upsert onto a non-transactional parquet target:
    each micro-batch dedups on the K8 keys, anti-joins what the target
    already holds, and appends only the remainder. Replayed batches
    (at-least-once delivery, checkpoint loss, operator re-runs) therefore
    never duplicate a row — the exactly-once MATERIALIZATION contract built
    from at-least-once delivery, mirroring the reference's idempotent
    ReplacingMergeTree loads (src/main.rs:87).

    Scale note: the anti-join probe reads only the key columns of the target
    (column pruning); partition the target by a key-derived prefix so the
    probe prunes to the partitions a batch can touch instead of the full
    history.
    """

    def _upsert(batch: DataFrame, _epoch: int) -> None:
        spark = batch.sparkSession
        out = batch.dropDuplicates(keys)
        try:
            existing = spark.read.parquet(target_dir).select(*keys)
            out = out.join(existing, keys, "left_anti")
        except Exception:
            pass  # first batch: target does not exist yet
        out.write.mode("append").parquet(target_dir)

    return (
        df.writeStream.foreachBatch(_upsert)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def dedup_within_watermark(
    stream: DataFrame,
    keys: list[str],
    event_time_col: str,
    delay: str = "10 minutes",
) -> DataFrame:
    """Streaming exact dedup with BOUNDED state:
    `dropDuplicatesWithinWatermark` keeps each key only until the watermark
    passes its event time + delay, so the state store holds one entry per
    key seen in the last `delay` — not one per key ever (the unbounded
    `dropDuplicates` failure mode on an infinite stream). Replays/retries
    inside the delay window (the at-least-once source reality) collapse to
    one row; duplicates farther apart than `delay` are by-contract distinct."""
    return stream.withWatermark(event_time_col, delay).dropDuplicatesWithinWatermark(
        keys
    )
