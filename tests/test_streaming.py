"""Streaming tests: file-source ingest -> transforms -> watermarked windows
(availableNow drain, memory sink), streaming == batch equivalence, and the
custom stateful sessionizer.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from chainhouse_spark.sources.fixtures import raw_blocks_df
from chainhouse_spark.streaming.ingest import (
    run_to_memory,
    stream_raw_blocks,
    stream_transactions,
    windowed_gas,
)
from chainhouse_spark.transforms import transactions_from_raw


@pytest.fixture(scope="module")
def landing(spark, tmp_path_factory):
    """Raw blocks written as multiple files — the streaming landing zone."""
    d = tmp_path_factory.mktemp("landing")
    raw = raw_blocks_df(spark, n_blocks=8, seed=42)
    raw.repartition(4).write.mode("overwrite").parquet(str(d / "raw"))
    return str(d / "raw")


def test_stream_matches_batch(spark, landing):
    raw_stream = stream_raw_blocks(spark, landing, max_files_per_trigger=1)
    assert raw_stream.isStreaming
    tx_stream = stream_transactions(raw_stream)
    q = run_to_memory(tx_stream.drop("event_time"), "tx_stream_t")
    q.awaitTermination(120)

    got = spark.table("tx_stream_t")
    batch = transactions_from_raw(raw_blocks_df(spark, n_blocks=8, seed=42))
    assert got.count() == batch.count()
    g = {r.hash for r in got.select("hash").collect()}
    b = {r.hash for r in batch.select("hash").collect()}
    assert g == b


def test_windowed_gas_aggregation(spark, tmp_path):
    """Append-mode windows emit once the watermark passes them. availableNow
    never runs a trailing no-data batch, so window closure is driven the way
    production drains do it: a later micro-batch (here: a checkpointed
    restart with a straggler file) advances the watermark and flushes."""
    from chainhouse_spark.schemas import RAW_BLOCK
    from chainhouse_spark.sources.fixtures import generate_raw_blocks

    fix = generate_raw_blocks(10, seed=42)
    # the last block arrives an hour later: its watermark advance closes
    # every earlier window without making anything late (2-min watermark ≫
    # the 96s span of blocks 0..8, so no drops)
    fix[9]["timestamp"] = fix[9]["timestamp"] + 3600
    landing = str(tmp_path / "raw")
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    spark.createDataFrame(fix[:9], RAW_BLOCK).repartition(4).write.mode(
        "overwrite"
    ).parquet(landing)

    def drain():
        raw_stream = stream_raw_blocks(spark, landing, max_files_per_trigger=1)
        agg = windowed_gas(
            stream_transactions(raw_stream, watermark="2 minutes"), window="1 minute"
        )
        from chainhouse_spark.streaming.ingest import run_to_parquet

        q = run_to_parquet(agg, out, ckpt)
        q.awaitTermination(120)

    drain()
    assert spark.read.parquet(out).count() == 0  # nothing closed yet
    spark.createDataFrame([fix[9]], RAW_BLOCK).write.mode("append").parquet(landing)
    drain()

    rows = spark.read.parquet(out).collect()
    assert len(rows) >= 2  # blocks 0..8 span two 1-minute windows
    batch = transactions_from_raw(
        spark.createDataFrame(fix, RAW_BLOCK)
    )
    for r in rows:
        exp = (
            batch.withColumn(
                "et", F.expr("timestamp_seconds(CAST(blockTimestamp AS BIGINT))")
            )
            .filter((F.col("et") >= r.window_start) & (F.col("et") < r.window_end))
            .agg(F.sum(F.col("gasUsed").cast("long")), F.count(F.lit(1)))
            .collect()[0]
        )
        assert (exp[0], exp[1]) == (r.total_gas, r.n_tx)


def test_sessionizer_logic():
    """The stateful core, exercised directly (deterministic, no stream):
    events with a >gap pause split into two sessions."""
    import datetime as dt

    import pandas as pd

    from chainhouse_spark.streaming.sessionize import make_sessionizer

    class FakeState:
        exists = False
        hasTimedOut = False

        def __init__(self):
            self.updated = None

        def update(self, v):
            self.updated = v

        def setTimeoutDuration(self, ms):
            pass

        def remove(self):
            self.updated = None

    fn = make_sessionizer(gap_seconds=60)
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    pdf = pd.DataFrame(
        {
            "user_id": [7] * 4,
            "ts": pd.to_datetime(
                [t0, t0 + dt.timedelta(seconds=30), t0 + dt.timedelta(seconds=45),
                 t0 + dt.timedelta(seconds=200)]  # > 60s gap -> new session
            ),
            "value": [1.0, 2.0, 3.0, 10.0],
        }
    )
    st = FakeState()
    out = list(fn((7,), iter([pdf]), st))
    assert len(out) == 1
    closed = out[0]
    assert len(closed) == 1
    assert closed.iloc[0]["n_events"] == 3 and closed.iloc[0]["sum_value"] == 6.0
    # open session carried in state: started at t0+200s with 1 event
    assert st.updated[2] == 1 and st.updated[3] == 10.0


def test_sessionizer_streaming(spark, tmp_path):
    """The operator inside a real streaming query (applyInPandasWithState)."""
    import datetime as dt

    rows = []
    t0 = dt.datetime(2024, 1, 1)
    for u in range(3):
        for k in range(5):
            rows.append((u, t0 + dt.timedelta(seconds=u * 7 + k * 20), 1.0))
        for k in range(2):
            rows.append((u, t0 + dt.timedelta(seconds=3600 + u * 7 + k * 20), 2.0))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    src = str(tmp_path / "events")
    df.repartition(3).write.mode("overwrite").parquet(src)

    from chainhouse_spark.streaming.sessionize import sessionized

    stream = spark.readStream.schema("user_id long, ts timestamp, value double").parquet(src)
    q = run_to_memory(sessionized(stream, gap_seconds=600), "sessions_t")
    q.awaitTermination(120)
    got = spark.table("sessions_t").collect()
    # the first 5-event session per user closes when the +1h burst arrives
    assert len(got) >= 3
    by_user = {r.user_id: r for r in got if r.n_events == 5}
    assert set(by_user) == {0, 1, 2}
    for u, r in by_user.items():
        assert r.sum_value == 5.0
        assert (r.session_end - r.session_start).total_seconds() == 80


def test_streaming_dedup_across_microbatches(spark, tmp_path):
    """K8 under unbounded input: the same blocks land twice (two files ->
    two micro-batches with maxFilesPerTrigger=1); dropDuplicatesWithinWatermark
    emits each tx hash exactly once — the streaming ReplacingMergeTree
    contract, exact instead of eventual."""
    from chainhouse_spark.schemas import RAW_BLOCK
    from chainhouse_spark.sources.fixtures import generate_raw_blocks

    fix = generate_raw_blocks(6, seed=42)
    landing = str(tmp_path / "raw")
    df = spark.createDataFrame(fix, RAW_BLOCK)
    df.coalesce(1).write.mode("overwrite").parquet(landing)
    df.coalesce(1).write.mode("append").parquet(landing)  # exact duplicates

    stream = stream_raw_blocks(spark, landing, max_files_per_trigger=1)
    q = run_to_memory(stream_transactions(stream).drop("event_time"), "tx_dedup_t")
    q.awaitTermination(120)

    got = spark.table("tx_dedup_t")
    batch = transactions_from_raw(spark.createDataFrame(fix, RAW_BLOCK))
    assert got.count() == batch.count()  # no duplicate emissions
    hashes = [r.hash for r in got.select("hash").collect()]
    assert len(hashes) == len(set(hashes))


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """Watermarked stream-stream join == the batch join on the same data."""
    from chainhouse_spark.schemas import RAW_BLOCK
    from chainhouse_spark.sources.fixtures import generate_raw_blocks
    from chainhouse_spark.streaming.ingest import (
        stream_blocks,
        stream_stream_tx_block_join,
    )
    from chainhouse_spark.transforms import blocks_from_raw

    fix = generate_raw_blocks(8, seed=42)
    landing = str(tmp_path / "raw")
    spark.createDataFrame(fix, RAW_BLOCK).repartition(4).write.mode(
        "overwrite"
    ).parquet(landing)

    raw1 = stream_raw_blocks(spark, landing, max_files_per_trigger=1)
    raw2 = stream_raw_blocks(spark, landing, max_files_per_trigger=1)
    joined = stream_stream_tx_block_join(
        stream_transactions(raw1), stream_blocks(raw2)
    )
    q = run_to_memory(joined.select("hash", "blockHash", "block_gasUsed"), "ss_join_t")
    q.awaitTermination(180)

    got = spark.table("ss_join_t")
    raw_b = spark.createDataFrame(fix, RAW_BLOCK)
    tx = transactions_from_raw(raw_b)
    bl = blocks_from_raw(raw_b).select(
        F.col("hash").alias("b_hash"), F.col("gasUsed").alias("block_gasUsed")
    )
    exp = tx.join(bl, tx.blockHash == bl.b_hash)
    assert got.count() == exp.count() > 0
    g = {(r.hash, r.block_gasUsed) for r in got.collect()}
    e = {(r.hash, r.block_gasUsed) for r in exp.select("hash", "block_gasUsed").collect()}
    assert g == e


def test_stream_static_enrich(spark, landing):
    """Stream-static broadcast join == the batch join on the same data."""
    from chainhouse_spark.streaming.ingest import stream_static_enrich

    batch_tx = transactions_from_raw(raw_blocks_df(spark, n_blocks=8, seed=42))
    some = [r["from"] for r in batch_tx.select("from").distinct().limit(3).collect()]
    labels = spark.createDataFrame(
        [(a, f"label_{i}") for i, a in enumerate(some)], "address binary, label string"
    )

    raw_stream = stream_raw_blocks(spark, landing, max_files_per_trigger=1)
    enriched = stream_static_enrich(stream_transactions(raw_stream), labels)
    q = run_to_memory(enriched.select("hash", "label"), "enrich_t")
    q.awaitTermination(120)

    got = spark.table("enrich_t")
    assert got.count() == batch_tx.count()  # left join preserves the stream
    exp_labeled = (
        batch_tx.join(labels, batch_tx["from"] == labels["address"]).count()
    )
    assert got.filter(F.col("label").isNotNull()).count() == exp_labeled > 0


def test_foreach_batch_upsert_idempotent(spark, tmp_path, landing):
    """A full replay (fresh checkpoint, same input) appends nothing new —
    the anti-join makes materialization idempotent under at-least-once."""
    from chainhouse_spark.streaming.ingest import run_foreach_batch_upsert

    target = str(tmp_path / "target")

    def drain(ckpt: str) -> None:
        raw_stream = stream_raw_blocks(spark, landing, max_files_per_trigger=1)
        tx = stream_transactions(raw_stream).drop("event_time")
        q = run_foreach_batch_upsert(tx, target, str(tmp_path / ckpt), keys=["hash"])
        q.awaitTermination(120)

    drain("ckpt1")
    n1 = spark.read.parquet(target).count()
    batch = transactions_from_raw(raw_blocks_df(spark, n_blocks=8, seed=42))
    assert n1 == batch.count() > 0

    drain("ckpt2")  # fresh checkpoint: the entire stream replays
    got = spark.read.parquet(target)
    assert got.count() == n1  # no duplicate rows appended
    hashes = [r.hash for r in got.select("hash").collect()]
    assert len(hashes) == len(set(hashes))


def test_funnel_tracker_logic():
    """The stateful funnel tracker, driven directly: advances only on
    in-order step events within the window, anchored at first signup."""
    import datetime as dt

    import pandas as pd

    from chainhouse_spark.streaming.funnel import make_funnel_tracker

    class FakeState:
        def __init__(self):
            self.exists = False
            self.hasTimedOut = False
            self._v = None

        @property
        def get(self):
            return self._v

        def update(self, v):
            self._v = v
            self.exists = True

        def setTimeoutDuration(self, ms):
            pass

        def remove(self):
            self.exists = False

    t0 = dt.datetime(2024, 1, 1)
    fn = make_funnel_tracker(window_days=14)
    state = FakeState()

    def feed(events):
        pdf = pd.DataFrame(
            {"ts": [e[0] for e in events], "event_type": [e[1] for e in events]}
        )
        return list(fn((7,), iter([pdf]), state))

    # view before signup is ignored; signup anchors; view advances
    out = feed([(t0, "view"), (t0 + dt.timedelta(hours=1), "signup"),
                (t0 + dt.timedelta(hours=2), "view")])
    got = pd.concat(out, ignore_index=True)
    assert list(got["step"]) == [1, 2]

    # purchase in a LATER batch advances from carried state
    out = feed([(t0 + dt.timedelta(hours=3), "purchase")])
    got = pd.concat(out, ignore_index=True)
    assert list(got["step"]) == [3]
    assert state.get[0] == 3

    # beyond the window: no advance for a fresh user
    state2 = FakeState()
    fn2 = make_funnel_tracker(window_days=14)
    pdf = pd.DataFrame(
        {
            "ts": [t0, t0 + dt.timedelta(days=20)],
            "event_type": ["signup", "view"],
        }
    )
    out = list(fn2((8,), iter([pdf]), state2))
    got = pd.concat(out, ignore_index=True)
    assert list(got["step"]) == [1]  # the late view must NOT advance


def test_funnel_streaming_matches_batch(spark, tmp_path):
    """The live funnel over two time-ordered micro-batches reaches the same
    per-step user counts as the batch funnel_steps query on the same data."""
    from chainhouse_spark.queries.funnel import funnel_steps
    from chainhouse_spark.streaming.funnel import funnel_advances
    from chainhouse_spark.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    e = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    cut = e.selectExpr("percentile(CAST(unix_seconds(CAST(ts AS TIMESTAMP)) AS DOUBLE), 0.5) p").collect()[0]["p"]
    src = str(tmp_path / "funnel_events")
    import pyspark.sql.functions as F  # noqa: N812

    epoch = F.unix_seconds(F.col("ts").cast("timestamp"))
    e.filter(epoch <= cut).coalesce(1).write.mode("overwrite").parquet(src)
    e.filter(epoch > cut).coalesce(1).write.mode("append").parquet(src)

    stream = spark.readStream.schema(
        "user_id long, ts timestamp_ntz, event_type string"
    ).option("maxFilesPerTrigger", "1").parquet(src)
    q = run_to_memory(funnel_advances(stream), "funnel_advances_t")
    q.awaitTermination(180)
    got = spark.table("funnel_advances_t").groupBy("step").count().collect()
    streamed = {r["step"]: r["count"] for r in got}

    batch = {
        r["step"]: r["n_users"] for r in funnel_steps(spark, sf_dir).collect()
    }
    assert streamed == batch


def test_dedup_within_watermark_collapses_replays(spark, tmp_path):
    """At-least-once replay: the same event rows delivered again in a later
    micro-batch (within the lateness horizon) must collapse to one row —
    with BOUNDED state, unlike plain dropDuplicates."""
    from chainhouse_spark.streaming.ingest import dedup_within_watermark
    from chainhouse_spark.tables import load_table

    e = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id")
        .orderBy("event_id")
        .limit(500)
    )
    src = str(tmp_path / "dup_events")
    # batch 1: all 500 rows; batch 2: the last 200 replayed verbatim
    e.coalesce(1).write.mode("overwrite").parquet(src)
    e.orderBy(F.desc("event_id")).limit(200).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    deduped = dedup_within_watermark(
        stream, keys=["event_id"], event_time_col="ts", delay="365 days"
    )
    q = run_to_memory(deduped, "dedup_replay_t")
    q.awaitTermination(120)

    got = spark.table("dedup_replay_t")
    assert got.count() == 500  # replayed rows collapsed
    assert got.select("event_id").distinct().count() == 500


def test_incremental_rollup_matches_batch(spark, tmp_path):
    """Continuous-aggregate maintenance: events streamed in 3 micro-batches,
    per-(minute, type) state merged incrementally per batch, finals read
    from the state table — must equal a from-scratch batch rollup of the
    same rows (the associativity contract: batch boundaries can't show)."""
    from chainhouse_spark.operators.incremental import finalize
    from chainhouse_spark.streaming.rollup import run_incremental_rollup
    from chainhouse_spark.tables import load_table

    sf_dir = "/root/testdata/sf0.001"
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("minute", F.col("ts").cast("timestamp")).alias("minute"),
        "event_type",
        F.col("value").cast("decimal(18,6)").alias("v"),
        "event_id",
    )
    src = str(tmp_path / "rollup_events")
    for i in range(3):
        e.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)

    stream = (
        spark.readStream.schema(
            "minute timestamp, event_type string, v decimal(18,6), event_id long"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    state_dir = str(tmp_path / "rollup_state")
    q = run_incremental_rollup(
        stream,
        state_dir,
        checkpoint=str(tmp_path / "ckpt"),
        keys=["minute", "event_type"],
        measure=F.col("v"),
    )
    q.awaitTermination(120)

    got = finalize(spark.read.parquet(state_dir)).toPandas()
    want = (
        finalize(
            e.groupBy("minute", "event_type").agg(
                F.count(F.lit(1)).alias("cnt"),
                F.sum("v").alias("sum_m"),
                F.min("v").alias("min_m"),
                F.max("v").alias("max_m"),
            )
        )
        .toPandas()
    )
    from tests.compare import compare_frames

    assert not compare_frames(got, want)


def _has_protobuf() -> bool:
    # transformWithStateInPandas spawns a protobuf-speaking driver worker;
    # without the protobuf wheel the runner exits -2 at init.
    # Install retried rounds 9 (2026-08-15), 11 and 12 (2026-08-16):
    # `pip install protobuf` fails with "no matching distribution" (no
    # network in the sandbox) — the two e2e tests below stay env-skipped;
    # the processor logic itself is unit-proven in
    # test_transform_with_state_processor_logic.
    try:
        from google.protobuf import descriptor  # noqa: F401
        return True
    except ImportError:
        return False


@pytest.mark.skipif(
    not _has_protobuf(),
    reason="transformWithStateInPandas needs the protobuf wheel in the "
    "Python workers (not shipped in this container)",
)
def test_transform_with_state_user_stats_matches_batch(spark, tmp_path):
    """Spark-4 transformWithStateInPandas: the per-user running-totals
    changelog, drained over two micro-batches, must end (last row per user)
    exactly at the batch groupBy aggregate of the same rows."""
    from chainhouse_spark.streaming.user_stats import user_stats_changelog
    from chainhouse_spark.tables import load_table

    e = (
        load_table(spark, "/root/testdata/sf0.001", "events")
        .select(
            "user_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("v_cents"),
            "event_id",
        )
        .filter(F.col("user_id") % 10 == 0)
    )
    src = str(tmp_path / "tws_events")
    e.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode("append").parquet(src)
    e.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema("user_id long, v_cents long, event_id long")
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = run_to_memory(user_stats_changelog(stream), "tws_user_stats_t")
    q.awaitTermination(180)

    got = spark.table("tws_user_stats_t")
    # changelog: keep the final (max n_events) row per user
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    final = (
        got.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1).drop("rn")
    )
    want = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v_cents").alias("sum_cents"),
        F.max("v_cents").alias("max_cents"),
    )
    from tests.compare import compare_frames

    assert not compare_frames(final.toPandas(), want.toPandas())


def test_user_stats_processor_logic():
    """The transformWithState processor driven directly (the runtime needs
    protobuf workers; the merge logic doesn't): totals accumulate across
    batches and the changelog row always reflects the running state."""
    import pandas as pd

    from chainhouse_spark.streaming.user_stats import UserStatsProcessor

    class FakeValueState:
        def __init__(self):
            self._v, self._exists = None, False

        def exists(self):
            return self._exists

        def get(self):
            return self._v

        def update(self, v):
            self._v, self._exists = v, True

    class FakeHandle:
        def __init__(self):
            self.state = FakeValueState()

        def getValueState(self, name, schema):
            return self.state

    proc = UserStatsProcessor()
    proc.init(FakeHandle())

    out1 = list(
        proc.handleInputRows((7,), iter([pd.DataFrame({"v_cents": [100, 250]})]), None)
    )
    assert out1[0].iloc[0].to_dict() == {
        "user_id": 7, "n_events": 2, "sum_cents": 350, "max_cents": 250,
    }
    out2 = list(
        proc.handleInputRows((7,), iter([pd.DataFrame({"v_cents": [50]})]), None)
    )
    assert out2[0].iloc[0].to_dict() == {
        "user_id": 7, "n_events": 3, "sum_cents": 400, "max_cents": 250,
    }


def test_registered_streaming_queries_match_batch(spark):
    # The driver-checkable streaming queries (queries/streaming_queries.py)
    # must equal their batch twins — micro-batch boundaries must not leak
    # into the result.
    from chainhouse_spark.queries import QUERIES
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")

    got = QUERIES["stream_tumbling_counts"](spark, sf)
    want = (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    assert got.exceptAll(want).count() == 0 and want.exceptAll(got).count() == 0

    keys = QUERIES["stream_dedup_keys"](spark, sf)
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    assert keys.count() == docs.select(F.md5("text")).distinct().count()


def test_rocksdb_state_store_matches_batch(spark, tmp_path):
    """The 100 TB state answer: the HDFS-backed default keeps every state
    row on the executor HEAP (bounded by memory); RocksDB spills state to
    local disk with changelog checkpointing. Same windowed aggregate, same
    result — proven by running the identical stream under the RocksDB
    provider and diffing against the batch aggregate."""
    import os

    from pyspark.sql import functions as F

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    path = f"{sf}/events.parquet"
    schema = spark.read.parquet(path).schema
    d = tmp_path / "landing"
    d.mkdir()
    os.symlink(os.path.abspath(path), str(d / "events.parquet"))
    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming."
        "state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming."
        "state.RocksDBStateStoreProvider",
    )
    try:
        agg_cols = lambda df: (  # noqa: E731
            df.select(F.col("ts").cast("timestamp").alias("ts"), "event_type")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg_cols(spark.readStream.schema(schema).parquet(str(d)))
            .writeStream.format("memory")
            .queryName("rocksdb_t")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {
            (r.window.start, r.event_type): r.n
            for r in spark.table("rocksdb_t").collect()
        }
        exp = {
            (r.window.start, r.event_type): r.n
            for r in agg_cols(spark.read.parquet(path)).collect()
        }
        assert got == exp and len(got) > 0
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_stream_source_partitioned_layout_fails_loudly(spark, tmp_path):
    """ADVICE r10: a table layout the top-level part-file listing cannot
    see (Hive-partitioned key=value subdirs, or an empty dir) must raise,
    not silently time an empty stream. Recursing is deliberately NOT done:
    partition-column values live in the directory names, so flattening
    would stream them as all-NULL."""
    import pytest as _pytest

    from chainhouse_spark.queries.streaming_queries import _stream_source

    part_dir = str(tmp_path / "sfdir")
    df = spark.range(10).selectExpr("id", "id % 2 AS k")
    df.write.partitionBy("k").parquet(f"{part_dir}/events.parquet")
    with _pytest.raises(FileNotFoundError, match="partitioned layout"):
        _stream_source(spark, part_dir, "events")

    empty_dir = str(tmp_path / "sfdir2")
    import os as _os

    _os.makedirs(f"{empty_dir}/events.parquet")
    with _pytest.raises(Exception, match="part-files|Unable to infer|empty"):
        _stream_source(spark, empty_dir, "events")
