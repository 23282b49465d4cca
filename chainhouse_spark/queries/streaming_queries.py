"""Driver-checkable Structured Streaming queries.

The streaming operators in `chainhouse_spark/streaming/` are pytest-proven
(stream-matches-batch on every one), but pytest is weaker evidence than the
driver's DuckDB oracle gate. These queries close that gap: each runs a REAL
streaming pipeline — file source -> stateful transformation -> memory sink,
`Trigger.AvailableNow` — to completion inside the standard
`(spark, sf_dir) -> DataFrame` contract, and each is constructed to be
batch-deterministic so a plain SQL oracle can hash-check it:

  - complete-mode aggregation: final state is a pure function of the input
    set, independent of micro-batch boundaries;
  - key-projected streaming dedup: the EMITTED ROW per duplicate key is
    arbitrary under append-mode dropDuplicates, so the query projects to
    the key first — the surviving key set is deterministic.

Everything is JVM-side (file source, window aggregate, dropDuplicates) —
no Python workers, so the pipeline runs in restricted sandboxes where
Python-worker sockets may not connect.

Scale notes: this is exactly the resident-ingest shape of the reference's
follower loop (src/main.rs:167-239 poll-new-blocks -> insert), re-expressed
as Structured Streaming. State is bounded: the tumbling aggregate holds
one row per (window, event_type); the dedup holds one 16-byte hash per
distinct doc (at 100 TB you bound it with a watermark over the ingest-time
column, as streaming/ingest.py::dedup_within_watermark does — unbounded
here because the oracle needs whole-corpus semantics).

Doubles are decimal-cast before SUM (registry.py gotcha): float addition
order across micro-batches would otherwise diverge from the oracle's.
"""

from __future__ import annotations

import itertools
import os
from chainhouse_spark.scratch import scratch_dir

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table

_sink_counter = itertools.count()


def _stream_source(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """File-source stream over a parquet table. The streaming file source
    requires a DIRECTORY to watch, so the data is exposed via symlinks
    inside a temp dir (zero copy) — on a real deployment this is just the
    landing directory new files arrive into. A Spark-written table is a
    DIRECTORY of part-files; those are symlinked individually, because the
    file stream lists only the watch dir itself (a symlinked subdirectory
    would read as ZERO files — the round-9 scale smokes of stream queries
    silently timed an empty stream this way; SCALE.md r10)."""
    path = os.path.abspath(f"{sf_dir}/{table}.parquet")
    schema = spark.read.parquet(path).schema
    d = scratch_dir(prefix=f"stream_{table}_")
    if os.path.isdir(path):
        parts = [f for f in os.listdir(path) if f.endswith(".parquet")]
        if not parts:
            # Fail LOUDLY (ADVICE r10): a layout this listing can't see —
            # e.g. a Hive-partitioned table nesting part-files under
            # key=value subdirectories — would otherwise reproduce exactly
            # the silent empty-stream artifact this symlink fan-out exists
            # to prevent (SCALE.md r10). Recursing is NOT the fix: the
            # partition-column VALUES live in the directory names, so
            # flat-symlinking nested files would stream those columns as
            # all-NULL (Spark null-fills missing parquet columns) — silent
            # wrongness instead of a silent empty stream.
            nested = sorted(
                os.path.relpath(os.path.join(r, f), path)
                for r, _dirs, files in os.walk(path)
                for f in files
                if f.endswith(".parquet")
            )
            detail = (
                f"part-files are nested ({nested[0]}, ... {len(nested)} "
                "total) — a partitioned layout; stream the unpartitioned "
                "form or point the watch dir at one leaf partition"
                if nested
                else "no .parquet part-files anywhere under the table dir"
            )
            raise FileNotFoundError(
                f"cannot expose {path!r} as a file-source stream: {detail}"
            )
        for i, f in enumerate(sorted(parts)):
            os.symlink(os.path.join(path, f), os.path.join(d, f"p{i}.parquet"))
    else:
        os.symlink(path, os.path.join(d, f"{table}.parquet"))
    return spark.readStream.schema(schema).parquet(d)


def _run_to_table(stream_df: DataFrame, mode: str) -> DataFrame:
    """Run a streaming DataFrame to completion (AvailableNow) into a memory
    sink; return the sink table. Unique sink name per call — the driver may
    invoke a query several times in one session."""
    name = f"_stream_sink_{next(_sink_counter)}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", scratch_dir(prefix="chk_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)


@register(
    "stream_tumbling_counts",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour (window, event_type) counts/sums computed BY A
    STREAMING QUERY (file source, complete-mode state, AvailableNow) and
    returned as its final state — bit-identical to the batch GROUP BY, so
    the oracle gate applies to the streaming engine itself."""
    stream = _stream_source(spark, sf_dir, "events")
    agg = (
        stream.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )
    out = _run_to_table(agg, "complete")
    return out.select(
        F.col("w.start").alias("window_start"), "event_type", "n", "total_value"
    )


@register(
    "stream_dedup_keys",
    oracle="SELECT DISTINCT md5(text) AS content_hash FROM documents",
)
def stream_dedup_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup (append-mode dropDuplicates state) over the
    document stream, projected to the content-hash key — the deterministic
    surface of K8-at-stream-time: which ROW survives per key is arbitrary,
    which KEYS survive is not."""
    stream = _stream_source(spark, sf_dir, "documents")
    deduped = (
        stream.select(F.md5(F.col("text")).alias("content_hash"))
        .dropDuplicates(["content_hash"])
    )
    return _run_to_table(deduped, "append")


@register(
    "stream_user_value_state",
    oracle="""
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18, 2))) AS DOUBLE) AS total_value,
           CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types
    FROM events
    GROUP BY user_id
    """,
)
def stream_user_value_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user running totals as complete-mode streaming state (count,
    decimal-exact value sum, distinct event types) — the per-key
    state-store shape of streaming/user_stats.py, here in the
    oracle-checkable complete-mode form."""
    stream = _stream_source(spark, sf_dir, "events")
    agg = stream.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        # COUNT(DISTINCT) is unsupported on streams; the per-key distinct
        # set is tiny (event types) so collect_set state is bounded.
        F.size(F.collect_set("event_type")).cast("bigint").alias("n_types"),
    )
    return _run_to_table(agg, "complete")


@register(
    "stream_click_purchase_join",
    oracle="""
    SELECT c.user_id, c.ts AS click_ts, p.ts AS purchase_ts
    FROM (SELECT user_id, ts FROM events WHERE event_type = 'click') c
    JOIN (SELECT user_id, ts FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id
     AND p.ts > c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
    """,
)
def stream_click_purchase_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STREAM inner join with watermarks and a time-range condition
    — the state-store join the pytest suite proves but the driver gate
    never saw: clicks and purchases arrive as two independent streams of
    the same source; each click joins the purchases of the same user
    within the following hour.

    Deterministic by construction: inner joins emit exactly the matching
    pair set once both sides drain, and the single-file AvailableNow
    sources run in one micro-batch, so the watermarks (which exist to
    bound join state in a resident deployment) never drop a row here. The
    emitted (user_id, click_ts, purchase_ts) rows equal the batch
    interval-join, so the DuckDB hash gate applies to the streaming join
    operator itself. At scale the 1-hour constraint + watermark is what
    keeps both state stores bounded to an hour of traffic."""
    # Watermarks demand TIMESTAMP (tz-aware); the tables carry
    # timestamp_ntz. The session TZ is UTC, so cast -> process -> cast
    # back is value-preserving and the output still hash-matches the
    # oracle's ntz timestamps.
    clicks = (
        _stream_source(spark, sf_dir, "events")
        .filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").cast("timestamp").alias("click_ts"))
        .withWatermark("click_ts", "2 hours")
    )
    purchases = (
        _stream_source(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").cast("timestamp").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "2 hours")
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR")),
        "inner",
    ).select("user_id", "click_ts", "purchase_ts")
    out = _run_to_table(joined, "append")
    return out.select(
        "user_id",
        F.col("click_ts").cast("timestamp_ntz").alias("click_ts"),
        F.col("purchase_ts").cast("timestamp_ntz").alias("purchase_ts"),
    )


def _lsh_full_oracle() -> str:
    """The batch dedup_minhash_lsh oracle, reused verbatim: the streaming
    epochs' union must equal the full-corpus LSH candidate set."""
    from chainhouse_spark.queries.llm_dedup import _DUCK_MINHASH, _DUCK_SHINGLES

    return (
        "WITH " + _DUCK_SHINGLES + ", " + _DUCK_MINHASH + """,
    sig AS (SELECT doc_id, ARRAY_AGG(h ORDER BY s) AS sig FROM mh GROUP BY doc_id),
    bands AS (
        SELECT doc_id, b.b AS band,
               md5(array_to_string(sig[b.b * 4 + 1 : b.b * 4 + 4], ',')) AS bh
        FROM sig, (SELECT UNNEST(range(0, 4)) AS b) b
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a
        JOIN bands b ON a.band = b.band AND a.bh = b.bh AND a.doc_id < b.doc_id
    )
    SELECT c.doc_a, c.doc_b,
           CAST(SUM(CASE WHEN ma.h = mb.h THEN 1 ELSE 0 END) AS DOUBLE) / 16
               AS est_jaccard
    FROM cand c
    JOIN mh ma ON ma.doc_id = c.doc_a
    JOIN mh mb ON mb.doc_id = c.doc_b AND mb.s = ma.s
    GROUP BY c.doc_a, c.doc_b
    """
    )


@register("stream_incremental_lsh_pairs", oracle=None)
def stream_incremental_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resident-ingest near-dedup: documents arrive as two 'crawl days'
    (even doc_ids, then odd), and each foreachBatch increment signs ONLY
    the new docs, unions the persisted signature store, and runs LSH in
    incremental mode — all-old buckets dropped before expansion, only
    delta-involving pairs emitted (operators/dedup.py lsh_candidate_pairs
    delta contract). Because every pair involves a newest-arrival doc in
    exactly one epoch, the epochs are disjoint and their union equals the
    full-corpus batch LSH candidate set — which is exactly what the DuckDB
    oracle (the dedup_minhash_lsh SQL, unfiltered) checks. The driver's
    hash gate therefore covers the streaming incremental path end to end.

    At a steady state the per-increment cost tracks the delta: signatures
    computed for new docs only, the store read is (doc_id, sig) rows (16
    BIGINTs per doc, never text), and bucket pruning drops the all-old
    buckets that dominate a mature corpus. Epoch output lands in
    epoch=N subdirs (idempotent overwrite per epoch — replays rewrite,
    never duplicate).
    """
    import glob as _glob

    from chainhouse_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    land = scratch_dir(prefix="lsh_land_")
    # Simulate two crawl days WITHOUT driver-collecting the corpus: write
    # each half via Spark, then symlink its part file into the landing dir.
    for i, pred in enumerate(["doc_id % 2 = 0", "doc_id % 2 = 1"]):
        d = scratch_dir(prefix=f"lsh_day{i}_")
        docs.filter(pred).coalesce(1).write.mode("overwrite").parquet(d)
        part = _glob.glob(os.path.join(d, "part-*.parquet"))[0]
        os.symlink(part, os.path.join(land, f"day{i}.parquet"))

    sig_store = scratch_dir(prefix="lsh_sigs_")
    out_dir = scratch_dir(prefix="lsh_pairs_")

    def handle(batch_df: DataFrame, epoch_id: int) -> None:
        delta = minhash_signatures(
            batch_df, num_hashes=16, shingle_words=3
        ).withColumn("is_delta", F.lit(True))
        stored = _glob.glob(os.path.join(sig_store, "epoch=*"))
        if stored:
            old = spark.read.parquet(*stored).withColumn("is_delta", F.lit(False))
            sigs = old.unionByName(delta)
        else:
            sigs = delta
        pairs = lsh_candidate_pairs(
            sigs, num_hashes=16, bands=4, delta_col="is_delta"
        )
        pairs.write.mode("overwrite").parquet(
            os.path.join(out_dir, f"epoch={int(epoch_id)}")
        )
        delta.drop("is_delta").write.mode("overwrite").parquet(
            os.path.join(sig_store, f"epoch={int(epoch_id)}")
        )

    schema = docs.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(land)
    )
    q = (
        stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", scratch_dir(prefix="chk_lsh_"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    epochs = _glob.glob(os.path.join(out_dir, "epoch=*"))
    return spark.read.parquet(*epochs).select("doc_a", "doc_b", "est_jaccard")


# Attach the oracle after definition: it needs llm_dedup's CTE fragments,
# and register(oracle=...) runs at import time before that module may be
# loaded when this module is imported standalone.
from chainhouse_spark.queries.registry import ORACLES as _ORACLES  # noqa: E402

_ORACLES["stream_incremental_lsh_pairs"] = _lsh_full_oracle()


@register(
    "stream_static_enrichment",
    oracle="""
    WITH dim AS (
        SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
        FROM events GROUP BY user_id
    )
    SELECT CAST(dim.first_day AS TIMESTAMP) AS cohort_day,
           e.event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(e.value AS DECIMAL(18, 2))) AS DOUBLE) AS total_value
    FROM events e JOIN dim ON e.user_id = dim.user_id
    GROUP BY 1, 2
    """,
)
def stream_static_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAM-STATIC join — the dimension-enrichment shape every resident
    pipeline runs (stream fact rows against a broadcastable dim table):
    the event stream joins a batch-computed per-user first-seen-day
    dimension, then aggregates (cohort_day, event_type) in complete mode.
    The static side re-evaluates per micro-batch in real deployments
    (picking up dim updates); here it is fixed, which is exactly what
    makes the final state equal the batch join — so the DuckDB gate
    covers the streaming join operator itself. All JVM-side (no Python
    workers)."""
    dim = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .groupBy("user_id")
        .agg(F.min(F.col("ts").cast("date")).alias("first_day"))
    )
    stream = _stream_source(spark, sf_dir, "events")
    enriched = stream.join(dim, "user_id")
    agg = enriched.groupBy(
        F.col("first_day").cast("timestamp_ntz").alias("cohort_day"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
    )
    return _run_to_table(agg, "complete")


@register(
    "stream_session_window",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    isl AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM isl GROUP BY user_id, sid
    """,
)
def stream_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Built-in session_window aggregation ON A STREAM (30-minute gap,
    complete mode): Spark merges overlapping session candidates inside the
    streaming state store; the final state is a pure function of the input
    set, so the batch gaps-and-islands oracle (ts_session_window_builtin's)
    hash-checks the streaming session-merge machinery itself. State is one
    row per open session; at scale a watermark bounds it — complete mode
    here because the oracle needs whole-input semantics."""
    stream = _stream_source(spark, sf_dir, "events")
    agg = (
        stream.select("user_id", F.col("ts").cast("timestamp").alias("ts"))
        .groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_table(agg, "complete")
    return out.select(
        "user_id",
        F.col("session_window.start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_window.end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
    )


@register(
    "stream_sessionize_custom_state",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    isl AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sid
        FROM ordered
    ),
    sess AS (
        SELECT user_id, sid,
               MIN(ts) AS session_start,
               MAX(ts) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(sid) OVER (PARTITION BY user_id) AS max_sid
        FROM isl GROUP BY user_id, sid
    )
    SELECT user_id, session_start, session_end, n_events
    FROM sess WHERE sid < max_sid
    """,
)
def stream_sessionize_custom_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CUSTOM stateful streaming operator (applyInPandasWithState,
    streaming/sessionize.py) under the external oracle gate — the §2.6
    'custom stateful op' row's first driver-checkable surface. The
    operator emits a session only when a LATER event of the same user
    closes it (open sessions wait for the processing-time timeout, which
    an AvailableNow run never reaches) — so the deterministic output is
    exactly 'every session except each user's last', which the oracle
    states via gaps-and-islands + max-island exclusion. session_end is
    the last event (the operator's contract), not last+gap.

    sum_value is part of the operator schema but deliberately NOT part of
    this surface: its Python float accumulation order under tied
    timestamps is the one nondeterminism the hash gate would see."""
    from chainhouse_spark.streaming.sessionize import sessionized

    stream = (
        _stream_source(spark, sf_dir, "events")
        # watermark needs tz-aware TIMESTAMP; tables carry ntz (UTC session
        # makes the cast lossless; cast back below for the hash)
        .select(
            "user_id", F.col("ts").cast("timestamp").alias("ts"), "value"
        )
    )
    # use_timeout=False: a registered ProcessingTimeTimeout would keep the
    # AvailableNow trigger scheduling empty micro-batches forever (the query
    # never terminates); without it the run drains in one batch and the
    # output is exactly the oracle's "all but each user's last session".
    ses = sessionized(stream, gap_seconds=1800, use_timeout=False)
    out = _run_to_table(ses, "append")
    return out.select(
        "user_id",
        F.col("session_start").cast("timestamp_ntz").alias("session_start"),
        F.col("session_end").cast("timestamp_ntz").alias("session_end"),
        "n_events",
    )


@register(
    "stream_watermark_advisor",
    oracle="""
    WITH base AS (
        SELECT event_type, event_id, epoch_us(ts) AS t_us,
               epoch_us(ts)
                 + ((event_id * 2654435761) % 3600) * 1000000 AS arr_us
        FROM events
    ),
    run AS (
        SELECT event_type, event_id, t_us,
               MAX(t_us) OVER (PARTITION BY event_type
                               ORDER BY arr_us, event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - t_us AS late_us
        FROM base
    ),
    ranked AS (
        SELECT event_type, late_us,
               ROW_NUMBER() OVER (PARTITION BY event_type
                                  ORDER BY late_us, event_id) AS rk,
               COUNT(*) OVER (PARTITION BY event_type) AS n
        FROM run
    )
    SELECT event_type,
           CAST(MIN(n) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_out_of_order,
           CAST(MAX(late_us) // 1000000 AS BIGINT) AS max_late_s,
           CAST(MAX(CASE WHEN rk = (n * 95 + 99) // 100 THEN late_us END)
                // 1000000 AS BIGINT) AS p95_late_s,
           CAST(MAX(CASE WHEN rk = (n * 99 + 99) // 100 THEN late_us END)
                // 1000000 AS BIGINT) AS p99_late_s,
           CAST((MAX(CASE WHEN rk = (n * 99 + 99) // 100 THEN late_us END)
                 + 59999999) // 60000000 AS BIGINT) AS watermark_minutes
    FROM ranked
    GROUP BY event_type
    """,
)
def stream_watermark_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-delay advisor: replay each event type in ARRIVAL order
    and measure event-time lateness against the running
    event-time maximum — exactly the disorder a Structured Streaming
    watermark must absorb. Emits out-of-order counts, max / exact-rank
    p95 / p99 lateness, and the p99 rounded UP to whole minutes as the
    recommended `withWatermark` delay — the config every streaming
    deployment otherwise guesses. Arrival order models bounded network jitter deterministically (each event delayed by a multiplicative-hash 0-119 s — the testdata's feed is otherwise perfectly ordered and the lateness path would be untested). All integer microseconds (ceil-rank
    percentiles via (n*99+99)//100, no float); the running-max and rank
    windows and the final group all share the event_type partitioning."""
    from pyspark.sql import Window

    base = load_table(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t_us"),
    ).withColumn(
        "arr_us",
        F.col("t_us")
        + (F.col("event_id") * F.lit(2654435761)) % 3600 * 1000000,
    )
    wp = Window.partitionBy("event_type")
    run = base.withColumn(
        "late_us",
        F.max("t_us").over(
            wp.orderBy(F.asc("arr_us"), F.asc("event_id")).rowsBetween(
                Window.unboundedPreceding, 0
            )
        )
        - F.col("t_us"),
    )
    ranked = run.select(
        "event_type",
        "late_us",
        F.row_number()
        .over(wp.orderBy(F.asc("late_us"), F.asc("event_id")))
        .alias("rk"),
        F.count(F.lit(1)).over(wp).alias("n"),
    )
    def at_rank(pct: int):
        k = F.expr(f"(n * {pct} + 99) div 100")
        return F.max(F.when(F.col("rk") == k, F.col("late_us")))

    return ranked.groupBy("event_type").agg(
        F.min("n").cast("bigint").alias("n_events"),
        F.sum(F.when(F.col("late_us") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_out_of_order"),
        F.expr("MAX(late_us) div 1000000").cast("bigint").alias("max_late_s"),
        (at_rank(95) / 1000000).cast("bigint").alias("p95_late_s"),
        (at_rank(99) / 1000000).cast("bigint").alias("p99_late_s"),
        ((at_rank(99) + 59999999) / 60000000)
        .cast("bigint")
        .alias("watermark_minutes"),
    )


@register(
    "stream_hourly_distinct_users",
    oracle="""
    SELECT date_trunc('hour', ts) AS window_start,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events
    GROUP BY 1
    """,
)
def stream_hourly_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly DISTINCT-user counts from a STREAMING QUERY. Streaming
    forbids exact COUNT(DISTINCT) (only approx_count_distinct), so the
    stream keeps the standard exact rewrite's state instead: complete-mode
    counts per (hour-window, user) — the expensive distinct set itself,
    one state row per active (window, user) key. The distinct count is
    then a pure function of the FINAL state (one batch rollup of the sink
    table), so the batch SQL oracle hash-checks the streaming engine's
    state, not a lossy sketch. At 100 TB you'd bound the state with a
    watermark (evict closed windows) or accept approx_count_distinct."""
    stream = _stream_source(spark, sf_dir, "events")
    per_user = stream.groupBy(
        F.window("ts", "1 hour").alias("w"), F.col("user_id")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    state = _run_to_table(per_user, "complete")
    return state.groupBy(F.col("w.start").alias("window_start")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("n").cast("bigint").alias("n_events"),
    )


@register(
    "stream_sliding_topk",
    oracle="""
    WITH expanded AS (
        SELECT event_type,
               to_timestamp((epoch_us(ts) // 900000000 - j) * 900) AS window_start
        FROM events
        CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS j)
    ),
    counts AS (
        SELECT window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n
        FROM expanded GROUP BY 1, 2
    ),
    ranked AS (
        SELECT window_start, event_type, n,
               ROW_NUMBER() OVER (PARTITION BY window_start
                                  ORDER BY n DESC, event_type) AS rk
        FROM counts
    )
    SELECT CAST(window_start AS TIMESTAMP) AS window_start,
           event_type, n, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 3
    """,
)
def stream_sliding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 event types per SLIDING window (1 h wide, 15 min slide) from a
    STREAMING QUERY: the stream maintains per-(window, type) counts —
    Spark's window() duplicates each event into its 4 overlapping
    windows, the standard sliding-state shape — and the top-k rank runs
    as a BATCH pass over the final state (|windows| x |types| rows, so
    the rank window is bounded and partitioned by window start). The
    oracle replays the window assignment arithmetic: with slide 900 s the
    4 starts are (floor(t/900) - j) * 900, j in 0..3 — exactly Spark's
    assignment. At 100 TB the state stays bounded by a watermark evicting
    closed windows; counts-only state is what makes sliding top-k cheap
    (no per-event retention)."""
    from pyspark.sql import Window

    stream = _stream_source(spark, sf_dir, "events")
    counts = stream.groupBy(
        F.window("ts", "1 hour", "15 minutes").alias("w"), F.col("event_type")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    state = _run_to_table(counts, "complete")
    ranked = state.select(
        F.col("w.start").alias("window_start"), "event_type", "n"
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("window_start").orderBy(
                F.desc("n"), F.asc("event_type")
            )
        ),
    )
    return ranked.filter(F.col("rk") <= 3).select(
        "window_start", "event_type", "n", F.col("rk").cast("int").alias("rk")
    )


@register(
    "stream_psi_drift",
    oracle="""
    WITH base AS (
        SELECT source,
               ((instr('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 2)
                 AS snap,
               CAST(LEAST(n_chars // 64, 9) AS INT) AS bin
        FROM documents
    ),
    cells AS (
        SELECT source, snap, bin, CAST(COUNT(*) AS BIGINT) AS c
        FROM base GROUP BY source, snap, bin
    ),
    spine AS (
        SELECT s.source, CAST(sn AS INT) AS snap, CAST(b AS INT) AS bin
        FROM (SELECT DISTINCT source FROM cells) s,
             UNNEST(range(0, 2)) t1(sn), UNNEST(range(0, 10)) t2(b)
    ),
    full_cells AS (
        SELECT spine.source, spine.snap, spine.bin, COALESCE(cells.c, 0) AS c
        FROM spine LEFT JOIN cells
          ON spine.source = cells.source AND spine.snap = cells.snap
         AND spine.bin = cells.bin
    ),
    tot AS (
        SELECT source, bin,
               SUM(CASE WHEN snap = 0 THEN c ELSE 0 END) AS c0,
               SUM(CASE WHEN snap = 1 THEN c ELSE 0 END) AS c1,
               SUM(SUM(CASE WHEN snap = 0 THEN c ELSE 0 END))
                 OVER (PARTITION BY source) AS n0,
               SUM(SUM(CASE WHEN snap = 1 THEN c ELSE 0 END))
                 OVER (PARTITION BY source) AS n1
        FROM full_cells GROUP BY source, bin
    ),
    term AS (
        SELECT source, n0, n1,
               CAST(c0 + 1 AS DOUBLE) / (n0 + 10) AS p0,
               CAST(c1 + 1 AS DOUBLE) / (n1 + 10) AS p1
        FROM tot
    )
    SELECT source,
           CAST(MIN(n0) AS BIGINT) AS n_base,
           CAST(MIN(n1) AS BIGINT) AS n_cur,
           CAST(SUM(CAST(ROUND((p1 - p0) * LN(p1 / p0), 6)
                    AS DECIMAL(20,6))) AS DOUBLE) AS psi
    FROM term GROUP BY source
    """,
)
def stream_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PSI drift monitor RUNNING ON THE STREAM: the per-(source, snap,
    bin) count cube is maintained as complete-mode streaming aggregation
    state over the document stream (file source, AvailableNow) — the shape
    of a resident ingest pipeline that alerts on distribution shift as new
    crawl files land — and the PSI math runs once on the final cube
    (<= |sources| x 20 rows). Complete-mode counts are a pure function of
    the input set (micro-batch-boundary-independent), so the batch PSI
    oracle hash-checks the streaming engine itself. Same fixed bins,
    Laplace smoothing, and rounded-then-DECIMAL-summed terms as
    drift_psi_by_source; empty cells enter via a 20-way conditional pivot
    over the cube, never a corpus re-scan. At 100 TB the state is
    sources x 20 longs — constant; swap the md5-bit snapshot for an
    ingest-time watermark column in production."""
    stream = _stream_source(spark, sf_dir, "documents")
    cells = (
        stream.select(
            "source",
            # md5-bit snapshot split (id parity is constant per source in
            # this data — see drift_psi_by_source)
            F.expr(
                "(CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 1), 16, 10)"
                " AS INT) % 2)"
            ).alias("snap"),
            F.least(F.col("n_chars") / F.lit(64), F.lit(9))
            .cast("int")
            .alias("bin"),
        )
        .groupBy("source", "snap", "bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    )
    cube = _run_to_table(cells, "complete")

    def _c(snap: int, b: int):
        return (
            F.sum(
                F.when(
                    (F.col("snap") == snap) & (F.col("bin") == b), F.col("c")
                ).otherwise(0)
            )
            .cast("bigint")
            .alias(f"b{b}_{snap}")
        )

    agg = cube.groupBy("source").agg(
        *[_c(sn, b) for sn in (0, 1) for b in range(10)]
    )
    arr0 = F.array(*[F.col(f"b{b}_0") for b in range(10)])
    arr1 = F.array(*[F.col(f"b{b}_1") for b in range(10)])
    tot = (
        agg.select(
            "source",
            sum(
                [F.col(f"b{b}_0") for b in range(10)], F.lit(0).cast("bigint")
            ).alias("n0"),
            sum(
                [F.col(f"b{b}_1") for b in range(10)], F.lit(0).cast("bigint")
            ).alias("n1"),
            arr0.alias("a0"),
            arr1.alias("a1"),
            F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bin"),
        )
        .select(
            "source",
            F.element_at("a0", F.col("bin") + 1).alias("c0"),
            F.element_at("a1", F.col("bin") + 1).alias("c1"),
            "n0",
            "n1",
        )
    )
    p0 = (F.col("c0") + 1).cast("double") / (F.col("n0") + 10)
    p1 = (F.col("c1") + 1).cast("double") / (F.col("n1") + 10)
    return (
        tot.select(
            "source",
            "n0",
            "n1",
            p0.alias("p0"),
            p1.alias("p1"),
        )
        .groupBy("source")
        .agg(
            F.min("n0").cast("bigint").alias("n_base"),
            F.min("n1").cast("bigint").alias("n_cur"),
            F.expr(
                "CAST(SUM(CAST(ROUND((p1 - p0) * LN(p1 / p0), 6)"
                " AS DECIMAL(20,6))) AS DOUBLE)"
            ).alias("psi"),
        )
    )


@register(
    "stream_decontaminate_bloom",
    oracle=None,  # assigned below — identical filter to the batch query
)
def stream_decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom decontamination RUNNING ON THE STREAM: training documents
    arrive as a file-source stream (the landing-directory shape of a
    resident ingest pipeline), probe the held-out split's broadcast
    64 Ki-bit filter via a stream-static join, and the per-(doc, shingle)
    positive-probe counts are the ONE streaming aggregation (complete
    mode). The doc-level verdict — all k positions set, then hits per doc
    — is a pure batch rollup of that final state, the
    stream_hourly_distinct_users pattern for "the stream may not chain
    aggregations".

    Two structural differences from the batch operator, both forced by
    streaming's one-stateful-operator budget AND by what the 100x scale
    smoke found (SCALE.md r10): (1) per-document shingle dedup happens
    MAP-SIDE via array_distinct on each document's shingle array (all of a
    doc's shingles live in its one row), and (2) the filter ships as the
    PACKED bitset the bloom.py docstring describes as the alternative
    representation — 1024 longs inlined as an array literal — probed with
    a map-side forall over each shingle's k positions. The first draft
    joined against the set-bit-position table and kept per-(doc, shingle)
    counts as streaming state; at 100x the filter saturates (every
    training shingle goes positive — real Bloom behavior for a filter
    sized at build time) and that state is corpus x shingles ≈ 10^8 rows:
    the smoke OOMed the heap.

    Round-12 optimization (guide §2.4): the per-doc positive count needs
    NO streaming aggregation at all — every shingle of a doc lives in the
    doc's own row, so the count is an in-row size(filter(...)) and the
    query is fully STATELESS: zero shuffles, zero state-store
    read/write/checkpoint per micro-batch (the previous form paid a
    32-partition complete-mode state store), append-mode memory sink.
    Each doc emits at most one row, in whichever micro-batch carries it —
    identical rows to the complete-mode aggregate's final state.

    Semantics are identical to the batch operator, and its DuckDB oracle
    hash-checks the streaming engine bit-for-bit (same deterministic
    Carter-Wegman positions, same false positives).

    At 100 TB: the broadcast is 8 KiB regardless of test-set size,
    per-micro-batch work is pure map, and there is no streaming state at
    all — contamination verdicts stream out as data streams in."""
    from chainhouse_spark.operators.bloom import (
        BLOOM_BITS,
        BLOOM_HASHES,
        shingle_positions,
    )
    from chainhouse_spark.functions.text import word_shingles_sql

    test_static = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 97 == 0)
    )
    # Bounded collect: <= BLOOM_BITS distinct positions (65536) — the
    # filter's fixed size, independent of test-set size by construction.
    set_bits = [
        r.pos for r in shingle_positions(test_static).select("pos").distinct().collect()
    ]
    words = [0] * (BLOOM_BITS // 64)
    for p in set_bits:
        words[p // 64] |= 1 << (p % 64)
    # Pack to signed 64-bit for the BIGINT array literal.
    mask_sql = "array(" + ",".join(
        f"{w - (1 << 64) if w >= (1 << 63) else w}L" for w in words
    ) + ")"
    # Per-shingle probe, evaluated IN-ROW over the doc's shingle array:
    # h1/h2 are materialized once per shingle (struct step), then forall
    # tests the k Carter-Wegman positions against the packed literal —
    # the same arithmetic the exploded form ran, now with no explode, no
    # shuffle and no state store.
    probe_positive = (
        f"forall(transform(sequence(0, {BLOOM_HASHES - 1}), "
        f"j -> CAST((h.h1 + CAST(j AS BIGINT) * h.h2) % {BLOOM_BITS} AS INT)), "
        f"p -> (element_at({mask_sql}, CAST(p DIV 64 AS INT) + 1) "
        f"& shiftleft(1L, CAST(p % 64 AS INT))) != 0)"
    )
    train = _stream_source(spark, sf_dir, "documents").filter(
        F.col("doc_id") % 97 != 0
    )
    hits = (
        train.select(
            "doc_id",
            F.expr(
                "transform(transform("
                + "array_distinct(" + word_shingles_sql("text") + "), "
                "s -> md5(s)), "
                "m -> named_struct("
                "'h1', CAST(conv(substring(m, 1, 8), 16, 10) AS BIGINT), "
                "'h2', CAST(conv(substring(m, 9, 8), 16, 10) AS BIGINT)))"
            ).alias("hh"),
        )
        # Round-12: the hit-count is computed ONCE and the doc-level
        # predicate applied via explode(filter(array(n), ...)) instead of
        # .filter() on the projected column — the optimizer pushes such a
        # filter below the projection and DUPLICATES the whole
        # shingle+md5+probe pipeline into the Filter node (guide §4.4's
        # double evaluation, here with pure SQL expressions; ~94% of docs
        # pass, so the map ran ~2x). Generate evaluates its generator
        # exactly once per row; an empty array drops the row — identical
        # rows, one evaluation. Batch-twin measurement: 1.587 -> 0.879 s.
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    f"filter(array(size(filter(hh, h -> {probe_positive}))),"
                    " n -> n > 0)"
                )
            ).alias("n_bloom_hits"),
        )
        .select("doc_id", F.col("n_bloom_hits").cast("bigint"))
    )
    return _run_to_table(hits, "append")


def _stream_bloom_oracle() -> str:
    from chainhouse_spark.operators.bloom import BLOOM_HASHES
    from chainhouse_spark.queries.llm_advanced import _DUCK_BLOOM_POS

    return f"""
    WITH {_DUCK_BLOOM_POS},
    bits AS (SELECT DISTINCT pos FROM pos WHERE doc_id % 97 = 0),
    hits AS (
        SELECT p.doc_id, p.m, COUNT(*) AS n_set
        FROM pos p JOIN bits USING (pos)
        WHERE p.doc_id % 97 <> 0
        GROUP BY p.doc_id, p.m
        HAVING COUNT(*) = {BLOOM_HASHES}
    )
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bloom_hits
    FROM hits GROUP BY doc_id
    """


_ORACLES["stream_decontaminate_bloom"] = _stream_bloom_oracle()
