"""Training-set export operators: deterministic global shuffle/sharding,
weighted sampling without replacement, and length-bucketed batch packing —
the last mile between a cleaned corpus (llm_pipeline.py / llm_sampling.py)
and what a trainer's data loader actually reads.

Like the samplers, everything here is HASH-deterministic (md5 — identical
hex in Spark and DuckDB): a shuffle order or sample membership must not
change between re-runs, engine swaps, or corpus append, or training becomes
unreproducible.

Scale notes (100 TB):
  - The shuffle shard is a pure per-row function (one md5, map-only); the
    within-shard ordering is ONE window per shard — shards bound the sort
    so no global ORDER BY over the corpus ever runs; at export time shard =
    output-file unit (`repartitionByRange(shard).sortWithinPartitions` —
    1000 executors each sort their own shards).
  - Weighted reservoir (Efraimidis–Spirakis A-ES) needs only a global
    top-k by key: partial TakeOrderedAndProject per partition, k rows to
    the driver-side final — never a full sort.
  - Batch packing buckets by fixed-width length ranges FIRST, so the
    row_number window partitions by bucket (bounded shuffle keys), not a
    single global ordering; padding-waste accounting is a per-batch agg on
    exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table

# md5 of a purpose-prefixed key: shuffle order must be independent of the
# split/sample hashes used elsewhere (reusing one hash correlates the
# artifacts — a doc's shard would predict its train/test split).
_SHUF = "md5(concat('shuffle-', CAST(doc_id AS STRING)))"
_SHUF_DUCK = "md5(concat('shuffle-', CAST(doc_id AS VARCHAR)))"


def _duck_hex_fold(expr: str, start: int, n: int) -> str:
    """DuckDB: `n` lowercase hex chars of `expr` from 1-based `start` ->
    BIGINT (strpos fold — the conv()-less mirror of Spark's
    conv(substring(e, start, n), 16, 10)). n <= 15 keeps the fold < 2^60."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr({expr}, {start + i}, 1)) - 1)"
            f" * {16 ** (n - 1 - i)}"
            for i in range(n)
        )
        + ")"
    )


N_SHARDS = 8


@register(
    "corpus_shuffle_shards",
    oracle=f"""
    SELECT doc_id,
           {_duck_hex_fold(_SHUF_DUCK, 1, 8)} % {N_SHARDS} AS shard,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY {_duck_hex_fold(_SHUF_DUCK, 1, 8)} % {N_SHARDS}
               ORDER BY {_SHUF_DUCK}, doc_id) AS BIGINT) AS pos
    FROM documents
    """,
)
def corpus_shuffle_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global corpus shuffle into N_SHARDS training shards:
    shard = h32 % N, position-in-shard = rank of the full md5 within the
    shard. The (shard, pos) pair IS the epoch-0 data order — reproducible
    across engines and stable per doc under corpus append (existing docs
    keep their shard; only in-shard positions shift).

    The window partitions by shard, so each sort is corpus/N and the
    shuffle carries (doc_id, 16-byte hash) only — no text moves. At export
    this ordering maps 1:1 onto `repartitionByRange("shard")` +
    `sortWithinPartitions(hash)` parquet writes.
    """
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        F.expr(_SHUF).alias("h"),
        F.expr(
            f"CAST(conv(substring({_SHUF}, 1, 8), 16, 10) AS BIGINT) % {N_SHARDS}"
        ).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return h.select(
        "doc_id", "shard", F.row_number().over(w).cast("long").alias("pos")
    )


_RESERVOIR_K = 50
# 15 hex chars -> uniform in (0, 1]: (h + 1) / 2^60. Exact in both engines
# (h < 2^60 is exactly representable; one correctly-rounded division).
_U_SPARK = (
    "(CAST(conv(substring(md5(concat('wsample-', CAST(doc_id AS STRING))), 1, 15),"
    " 16, 10) AS DOUBLE) + 1.0) / 1152921504606846976.0"
)
_U_DUCK = (
    "(CAST("
    + _duck_hex_fold("md5(concat('wsample-', CAST(doc_id AS VARCHAR)))", 1, 15)
    + " AS DOUBLE) + 1.0) / 1152921504606846976.0"
)


@register(
    "sample_weighted_reservoir",
    oracle=f"""
    SELECT doc_id, n_chars
    FROM (
        SELECT doc_id, n_chars,
               CAST(FLOOR(LN({_U_DUCK}) / n_chars * 1048576.0) AS BIGINT) AS kq
        FROM documents
        WHERE n_chars > 0
    )
    ORDER BY kq DESC, doc_id
    LIMIT {_RESERVOIR_K}
    """,
)
def sample_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement (Efraimidis–Spirakis A-ES,
    'Weighted random sampling with a reservoir', IPL 2006): each doc draws
    a deterministic uniform u from md5 and gets key u^(1/w) with w =
    n_chars; the top-k keys are the sample. Long documents are
    proportionally more likely, yet every doc has a chance — the classic
    trainer's length-weighted corpus subset.

    Determinism across engines: ranking uses ln(u)/w (monotone in
    u^(1/w)) QUANTIZED to a 2^-20 grid and tie-broken by doc_id — the
    only cross-engine float risk is a last-ulp ln() difference, which can
    flip an order only when a key lies within 1 ulp of a grid line
    (~1e-10 per row); ties on the grid are resolved identically by doc_id.

    Scale: the key is map-only per row; top-k is TakeOrderedAndProject
    (per-partition partial top-k, k rows per partition to the final) — no
    global sort, no corpus-sized shuffle.
    """
    docs = load_table(spark, sf_dir, "documents").filter("n_chars > 0")
    keyed = docs.select(
        "doc_id",
        "n_chars",
        F.expr(
            f"CAST(FLOOR(LN({_U_SPARK}) / n_chars * 1048576.0) AS BIGINT)"
        ).alias("kq"),
    )
    return (
        keyed.orderBy(F.desc("kq"), F.asc("doc_id"))
        .limit(_RESERVOIR_K)
        .select("doc_id", "n_chars")
    )


_BUCKET_W = 64  # tokens per length bucket
_BATCH_SZ = 8  # docs per batch


@register(
    "batch_by_length_buckets",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    ),
    assigned AS (
        SELECT doc_id, n_tok, n_tok // {_BUCKET_W} AS bucket,
               (ROW_NUMBER() OVER (PARTITION BY n_tok // {_BUCKET_W}
                                   ORDER BY doc_id) - 1) // {_BATCH_SZ} AS batch_id
        FROM tok
    )
    SELECT bucket, CAST(batch_id AS BIGINT) AS batch_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MAX(n_tok) AS max_tokens,
           CAST(SUM(n_tok) AS BIGINT) AS sum_tokens,
           CAST(MAX(n_tok) * COUNT(*) - SUM(n_tok) AS BIGINT) AS pad_waste,
           (ROUND((CAST(SUM(n_tok) AS DOUBLE) / (MAX(n_tok) * COUNT(*))) * 1e9) / 1e9 + 0.0) AS utilization
    FROM assigned
    GROUP BY bucket, batch_id
    ORDER BY bucket, batch_id
    """,
)
def batch_by_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-bucketed batch packing with padding-waste accounting: docs
    bucket by token count (fixed 64-token ranges — exact integer
    division, no float log2), batch 8-at-a-time within each
    bucket, and every batch reports its padding utilization
    (sum_tokens / (max_tokens * n_docs) — what fraction of the padded
    batch tensor is real data). This is the standard curriculum/bucketing
    step that keeps a trainer from padding a 40-token doc out to the
    4000-token outlier in its batch.

    Scale: one tokenize pass (map-only), a row_number window partitioned
    by bucket (shuffle key cardinality = n_buckets, rows carry (doc_id,
    n_tok) only), then a hash agg on (bucket, batch). All counts exact
    integers; the single float op is the final utilization division.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    bucketed = tok.withColumn("bucket", F.expr(f"n_tok div {_BUCKET_W}"))
    w = Window.partitionBy("bucket").orderBy("doc_id")
    assigned = bucketed.withColumn(
        "batch_id",
        F.floor((F.row_number().over(w) - F.lit(1)) / _BATCH_SZ).cast("long"),
    )
    return (
        assigned.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.max("n_tok").alias("max_tokens"),
            F.sum("n_tok").alias("sum_tokens"),
        )
        .select(
            "bucket",
            "batch_id",
            "n_docs",
            "max_tokens",
            "sum_tokens",
            (F.col("max_tokens") * F.col("n_docs") - F.col("sum_tokens")).alias(
                "pad_waste"
            ),
            F.round(
                F.col("sum_tokens").cast("double")
                / (F.col("max_tokens") * F.col("n_docs")),
                9,
            ).alias("utilization"),
        )
        .orderBy("bucket", "batch_id")
    )


@register(
    "export_training_shards",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id,
               {_duck_hex_fold(_SHUF_DUCK, 1, 8)} % {N_SHARDS} AS shard,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id))
               AS checksum
    FROM assigned
    GROUP BY shard
    ORDER BY shard
    """,
)
def export_training_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PHYSICAL last mile of corpus_shuffle_shards: write the corpus
    to shard-partitioned parquet, read the files back, and emit the
    export manifest per shard — doc count, token count, and an md5
    checksum of the sorted doc-id list. The oracle recomputes every
    manifest value from the SOURCE table, so a write that dropped,
    duplicated, or cross-assigned a single row breaks the hash gate:
    the driver is verifying the round-trip through the filesystem, not
    just the assignment arithmetic.

    Scale: the write is repartition(shard) + partitionBy (one shuffle,
    each executor streams its shards); the manifest is a per-shard agg
    over (doc_id, n_tok) — the checksum's collect_list is per-shard
    (corpus/N ids of 8 bytes), the standard manifest-builder cost."""
    from chainhouse_spark.scratch import scratch_dir

    docs = load_table(spark, sf_dir, "documents")
    assigned = docs.select(
        "doc_id",
        "text",
        F.expr(
            f"CAST(conv(substring({_SHUF}, 1, 8), 16, 10) AS BIGINT) % {N_SHARDS}"
        ).alias("shard"),
    )
    out = scratch_dir(prefix="shards_")
    (
        assigned.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out)
    )
    reloaded = spark.read.parquet(out)
    return (
        reloaded.select(
            "shard",
            "doc_id",
            F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            # sort the LONGS, then render: sorting rendered strings would
            # order "10" before "2" and break the oracle's numeric ORDER BY
            F.md5(
                F.expr(
                    "concat_ws(',', transform(array_sort(collect_list(doc_id)),"
                    " x -> CAST(x AS STRING)))"
                )
            ).alias("checksum"),
        )
        .orderBy("shard")
    )


@register(
    "curriculum_difficulty_order",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               ROUND(CAST(n_chars AS DOUBLE)
                     / len(string_split(text, ' ')), 9) AS difficulty
        FROM documents
    ),
    breaks AS (
        SELECT QUANTILE_CONT(difficulty, 0.25) AS b1,
               QUANTILE_CONT(difficulty, 0.50) AS b2,
               QUANTILE_CONT(difficulty, 0.75) AS b3
        FROM scored
    )
    SELECT
        CASE WHEN difficulty <= b1 THEN 'phase1_easy'
             WHEN difficulty <= b2 THEN 'phase2'
             WHEN difficulty <= b3 THEN 'phase3'
             ELSE 'phase4_hard' END AS phase,
        CAST(COUNT(*) AS BIGINT) AS n_docs,
        ROUND(MIN(difficulty), 9) AS min_difficulty,
        ROUND(MAX(difficulty), 9) AS max_difficulty,
        CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM scored, breaks
    GROUP BY 1
    """,
)
def curriculum_difficulty_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning phase assignment: difficulty = mean word length
    (chars per whitespace token — short words first, the classic
    easy-to-hard text curriculum), documents bucketed into four phases at
    the difficulty quartiles. The breakpoints are three broadcast scalars
    (both engines interpolate QUANTILE_CONT/PERCENTILE identically), so
    phase assignment is a map-side comparison — NO global sort or rank
    shuffle of the corpus, which is what makes this shape survive 100 TB
    (the alternative NTILE-over-everything is a single-task funnel).
    Difficulty is one exact division rounded to 9 digits."""
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        "lang",
        F.round(
            F.col("n_chars").cast("double")
            / F.size(F.split(F.col("text"), " ")),
            9,
        ).alias("difficulty"),
    )
    breaks = scored.agg(
        F.expr("PERCENTILE(difficulty, 0.25)").alias("b1"),
        F.expr("PERCENTILE(difficulty, 0.50)").alias("b2"),
        F.expr("PERCENTILE(difficulty, 0.75)").alias("b3"),
    )
    return (
        scored.crossJoin(F.broadcast(breaks))
        .select(
            F.when(F.col("difficulty") <= F.col("b1"), "phase1_easy")
            .when(F.col("difficulty") <= F.col("b2"), "phase2")
            .when(F.col("difficulty") <= F.col("b3"), "phase3")
            .otherwise("phase4_hard")
            .alias("phase"),
            "difficulty",
            "lang",
        )
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(F.min("difficulty"), 9).alias("min_difficulty"),
            F.round(F.max("difficulty"), 9).alias("max_difficulty"),
            F.countDistinct("lang").cast("bigint").alias("n_langs"),
        )
    )


# Span corruption (T5/UL2-style denoising objective): L=3-token spans,
# ~15% corruption rate (one 3-span per 20 tokens). The span layout must be
# a pure function of (doc_id, span_idx) — re-runs, engine swaps, and
# resumed preemptions must mask the same tokens or the objective's loss
# isn't comparable across runs.
_SPAN_LEN = 3
_SPAN_EVERY = 20  # one span per 20 tokens => rate = 3/20 = 15%


@register(
    "span_corruption_plan",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, len(string_split(text, ' ')) AS n_tok FROM documents
    ),
    e AS (
        SELECT doc_id, n_tok, n_tok // {_SPAN_EVERY} AS n_spans,
               n_tok // (n_tok // {_SPAN_EVERY}) AS stride
        FROM t WHERE n_tok >= {_SPAN_EVERY}
    ),
    s AS (
        SELECT doc_id, n_tok, stride, UNNEST(range(0, n_spans)) AS span_idx
        FROM e
    )
    SELECT doc_id,
           CAST(n_tok AS BIGINT) AS n_tok,
           CAST(span_idx AS INT) AS span_idx,
           CAST(span_idx * stride
                + ({_duck_hex_fold(
                    "md5(concat('span-', CAST(doc_id AS VARCHAR), ':', "
                    "CAST(span_idx AS VARCHAR)))", 1, 8)}
                   % (stride - {_SPAN_LEN - 1})) AS BIGINT) AS start_tok,
           CAST({_SPAN_LEN} AS INT) AS span_len
    FROM s
    """,
)
def span_corruption_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic span-corruption masking plan (T5-style denoising):
    per document, n_tok DIV 20 non-overlapping 3-token spans (~15%
    corruption), each span confined to its own stride-sized block with a
    hash-chosen offset — start_k = k*stride + md5('span-'||doc_id||':'||k)
    % (stride-2). Blocks partition the token range, so spans can NEVER
    overlap and never cross the document end (offset <= stride-3 and
    stride >= 20 > 3 by construction); documents under 20 tokens get no
    spans. All integer arithmetic on an 8-hex-digit md5 fold — identical
    in both engines, so the oracle replays the exact layout.

    Scale: map-only — tokenize, integer math, one explode; ZERO shuffles.
    At 100 TB this runs at scan speed and the plan is embarrassingly
    parallel; the mask layout for any shard can be regenerated
    independently (pure function of ids), which is what makes
    mid-epoch resumption cheap."""
    d = load_table(spark, sf_dir, "documents")
    # Round-12: the short-doc cutoff is fused into the explode (empty
    # array -> row dropped) instead of a .filter() on the projected
    # n_tok — the pushed-down filter duplicated the split(text) tokenize
    # into the Filter node below the projection (3 split occurrences in
    # the physical plan -> 1; guide §4.4's double evaluation with pure
    # SQL expressions). greatest(n_spans, 1) keeps the stride division
    # ANSI-safe for the short docs the explode then drops; for every
    # surviving doc n_spans >= 1, so the value is unchanged.
    e = (
        d.select(
            "doc_id",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        )
        .withColumn("n_spans", F.expr(f"n_tok DIV {_SPAN_EVERY}"))
        .withColumn("stride", F.expr("n_tok DIV greatest(n_spans, 1L)"))
    )
    return e.select(
        "doc_id",
        "n_tok",
        F.explode(
            F.expr(
                f"CASE WHEN n_tok >= {_SPAN_EVERY} "
                "THEN sequence(0, CAST(n_spans - 1 AS INT)) "
                "ELSE array() END"
            )
        ).alias("span_idx"),
        "stride",
    ).select(
        "doc_id",
        "n_tok",
        F.col("span_idx").cast("int").alias("span_idx"),
        F.expr(
            "CAST(span_idx * stride + "
            "CAST(conv(substring(md5(concat('span-', CAST(doc_id AS STRING), "
            f"':', CAST(span_idx AS STRING))), 1, 8), 16, 10) AS BIGINT) "
            f"% (stride - {_SPAN_LEN - 1}) AS BIGINT)"
        ).alias("start_tok"),
        F.lit(_SPAN_LEN).cast("int").alias("span_len"),
    )


@register(
    "span_corruption_targets",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, string_split(text, ' ') AS toks,
               len(string_split(text, ' ')) AS n_tok
        FROM documents
    ),
    e AS (
        SELECT doc_id, toks, n_tok, n_tok // {_SPAN_EVERY} AS n_spans,
               n_tok // (n_tok // {_SPAN_EVERY}) AS stride
        FROM t WHERE n_tok >= {_SPAN_EVERY}
    ),
    s AS (
        SELECT doc_id, toks, stride,
               UNNEST(range(0, n_spans)) AS span_idx
        FROM e
    ),
    placed AS (
        SELECT doc_id, toks, CAST(span_idx AS INT) AS span_idx,
               span_idx * stride
               + ({_duck_hex_fold(
                   "md5(concat('span-', CAST(doc_id AS VARCHAR), ':', "
                   "CAST(span_idx AS VARCHAR)))", 1, 8)}
                  % (stride - {_SPAN_LEN - 1})) AS start_tok
        FROM s
    )
    SELECT doc_id, span_idx, CAST(start_tok AS BIGINT) AS start_tok,
           array_to_string(toks[start_tok + 1 : start_tok + {_SPAN_LEN}], ' ')
               AS masked_text
    FROM placed
    """,
)
def span_corruption_targets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The denoising TARGETS for span_corruption_plan: the actual token
    text each planned span masks (what goes after the sentinel in a
    T5-style target sequence) — proving the plan's offsets index the real
    token stream, not an abstraction of it. Same deterministic layout as
    the plan (identical hash arithmetic, replayed by the oracle); the
    extraction is an in-row array slice of the tokenized document.

    Scale: map-only like the plan — tokenize once, integer math, one
    explode, one slice; ZERO shuffles. The targets for any shard
    regenerate independently (pure function of ids + text)."""
    d = load_table(spark, sf_dir, "documents")
    # Round-12: same explode-fused cutoff as span_corruption_plan (the
    # .filter() on projected n_tok duplicated split(text) into the Filter
    # node — 4 split occurrences in the physical plan -> 2, and the
    # remaining two sit in ONE Project where codegen subexpression
    # elimination evaluates them once). greatest() keeps the stride
    # division ANSI-safe; value unchanged for every surviving doc.
    e = (
        d.select(
            "doc_id",
            F.split("text", " ").alias("toks"),
            F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
        )
        .withColumn("n_spans", F.expr(f"n_tok DIV {_SPAN_EVERY}"))
        .withColumn("stride", F.expr("n_tok DIV greatest(n_spans, 1L)"))
    )
    placed = e.select(
        "doc_id",
        "toks",
        F.explode(
            F.expr(
                f"CASE WHEN n_tok >= {_SPAN_EVERY} "
                "THEN sequence(0, CAST(n_spans - 1 AS INT)) "
                "ELSE array() END"
            )
        ).alias("span_idx"),
        "stride",
    ).withColumn(
        "start_tok",
        F.expr(
            "CAST(span_idx * stride + "
            "CAST(conv(substring(md5(concat('span-', CAST(doc_id AS STRING), "
            f"':', CAST(span_idx AS STRING))), 1, 8), 16, 10) AS BIGINT) "
            f"% (stride - {_SPAN_LEN - 1}) AS BIGINT)"
        ),
    )
    return placed.select(
        "doc_id",
        F.col("span_idx").cast("int").alias("span_idx"),
        "start_tok",
        F.expr(
            f"concat_ws(' ', slice(toks, CAST(start_tok + 1 AS INT), {_SPAN_LEN}))"
        ).alias("masked_text"),
    )
