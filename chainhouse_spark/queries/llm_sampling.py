"""Deterministic sampling / splitting / mixing operators for a training-data
pipeline — the selection stage that sits between cleaning (llm_pipeline.py)
and training-set export.

Random sampling is not reproducible across engines, so every operator here is
HASH-based: membership is a pure function of the row key (md5 — identical hex
output in Spark and DuckDB), which makes the sample stable under re-runs,
incremental ingest, and engine swaps. This is how production pipelines pin
train/test membership (a row's split never changes when the corpus grows).

Scale notes (100 TB):
  - Hash-gate splits are map-only — no shuffle, no state; they compose with
    scan pruning (the md5 filter evaluates post-scan but costs one digest per
    row, JVM-side, inside WholeStageCodegen).
  - Stratified per-group top-k by hash rank: the full window sort is avoided
    at scale by pre-filtering on the hash prefix (only rows whose hash is
    below a generous bound can make the top-k), then one exact window over
    the survivors. The bound makes the shuffle input a small multiple of
    k × n_groups instead of the corpus.
  - Weighted interleave is a single pass: per-row gate threshold looked up
    from the (broadcast-sized) source→weight map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chainhouse_spark.functions.rounding import round9
from chainhouse_spark.queries.registry import FRUGAL_ORACLE, register
from chainhouse_spark.tables import load_table

# md5 of the decimal string of doc_id — byte-identical in Spark and DuckDB.
_KEY = "md5(CAST(doc_id AS STRING))"
_KEY_DUCK = "md5(CAST(doc_id AS VARCHAR))"


@register(
    "split_train_test_hash",
    oracle=f"""
    SELECT doc_id,
           CASE WHEN substr({_KEY_DUCK}, 1, 1) < 'd' THEN 'train' ELSE 'test' END AS split
    FROM documents
    """,
)
def split_train_test_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gate train/test split (~81/19: first hex nibble < 'd').

    Membership is a pure function of doc_id — stable under corpus growth and
    re-runs, the property random splits lack. Map-only: zero shuffles.
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.expr(f"CASE WHEN substr({_KEY}, 1, 1) < 'd' THEN 'train' ELSE 'test' END").alias(
            "split"
        ),
    )


@register(
    "sample_stratified_per_lang",
    oracle=f"""{FRUGAL_ORACLE}
    SELECT lang, doc_id
    FROM (
      SELECT lang, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY {_KEY_DUCK}, doc_id) AS rn
      FROM documents
    ) t
    WHERE rn <= 10
    """,
)
def sample_stratified_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic sample: 10 docs per language, chosen by hash
    rank (not random — reproducible and incremental-safe).

    At 100 TB, the window never sees the corpus: only rows whose hash falls
    below a generous prefix bound can rank in the top-10 of any group, so a
    map-side gate shrinks the shuffle to ~bound × corpus before the exact
    per-group window. The bound ('4' = top quarter of hash space) is safe as
    long as every stratum has >= 10 rows in that quarter — monitor per-group
    counts and widen if a tiny stratum appears (correct for every stratum
    with >= ~40 rows; rarer strata keep ALL their rows through the gate, so
    the result is still exact for them only if the gate passes >= min(n, 10)
    rows — we use the gate only above a row-count threshold).
    """
    docs = load_table(spark, sf_dir, "documents").withColumn("h", F.expr(_KEY))
    # sf0.01 strata are tiny (25 rows) — the prefix gate is a scale-mode
    # optimization; below the threshold we window the full stratum.
    w = Window.partitionBy("lang").orderBy("h", "doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("lang", "doc_id")
    )


@register(
    "interleave_weighted_sources",
    oracle=f"""{FRUGAL_ORACLE}
    SELECT source, CAST(COUNT(*) AS BIGINT) AS n_kept
    FROM documents
    WHERE substr({_KEY_DUCK}, 1, 1) <
          CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 'c'
               WHEN source IN ('src5','src6','src7','src8','src9') THEN '8'
               ELSE '4' END
    GROUP BY source
    """,
)
def interleave_weighted_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted dataset mixing: per-source keep-rates (75% / 50% / 25%)
    applied with a hash gate, reporting the per-source kept counts.

    The source→threshold map is a CASE over a handful of literals here; with
    thousands of sources it becomes a broadcast join against a weights table
    — either way the pass is map-only plus the final small agg.
    """
    docs = load_table(spark, sf_dir, "documents")
    gate = (
        "substr(%s, 1, 1) < CASE WHEN source IN ('src0','src1','src2','src3','src4') THEN 'c' "
        "WHEN source IN ('src5','src6','src7','src8','src9') THEN '8' ELSE '4' END" % _KEY
    )
    return (
        docs.filter(F.expr(gate))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


@register(
    "dataset_profile",
    oracle="""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
           CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null_text,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           CAST(MIN(n_chars) AS BIGINT) AS min_chars,
           CAST(MAX(n_chars) AS BIGINT) AS max_chars
    FROM documents
    """,
)
def dataset_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass corpus profile: row/null/distinct counts and length stats —
    the health-check stage before any expensive cleaning. Multiple distinct
    aggregates expand (Spark plans one expand + two-level agg); everything
    stays map-side partial until the 1-row final."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("lang").alias("n_langs"),
        F.countDistinct("source").alias("n_sources"),
        F.sum(F.when(F.col("text").isNull(), 1).otherwise(0)).alias("n_null_text"),
        F.sum("n_chars").alias("total_chars"),
        F.expr("CAST(SUM(n_chars) AS DOUBLE) / COUNT(*)").alias("avg_chars"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@register(
    "mixture_token_budget_plan",
    oracle=f"""{FRUGAL_ORACLE}
    WITH tok AS (
        SELECT doc_id, source, len(string_split(text, ' ')) AS n_tok,
               ({{h8}}) AS h32
        FROM documents
    ),
    per_src AS (
        SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS src_tok
        FROM tok GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(src_tok) AS BIGINT) AS total_tok,
               CAST(COUNT(*) AS BIGINT) AS n_src
        FROM per_src
    ),
    plan AS (
        SELECT p.source, p.n_docs, p.src_tok,
               CAST(FLOOR(t.total_tok / (2.0 * t.n_src)) AS BIGINT) AS target_tok,
               LEAST(1.0, CAST(FLOOR(t.total_tok / (2.0 * t.n_src)) AS BIGINT)
                          / CAST(p.src_tok AS DOUBLE)) AS rate
        FROM per_src p, tot t
    ),
    kept AS (
        SELECT k.source, CAST(COUNT(*) AS BIGINT) AS kept_docs,
               CAST(SUM(k.n_tok) AS BIGINT) AS kept_tok
        FROM tok k JOIN plan pl ON pl.source = k.source
        WHERE k.h32 < CAST(FLOOR(pl.rate * 4294967296.0) AS BIGINT)
        GROUP BY k.source
    )
    SELECT pl.source, pl.n_docs, pl.src_tok, pl.target_tok,
           (ROUND((pl.rate) * 1e9) / 1e9 + 0.0) AS rate,
           COALESCE(kept.kept_docs, 0) AS kept_docs,
           COALESCE(kept.kept_tok, 0) AS kept_tok
    FROM plan pl LEFT JOIN kept ON kept.source = pl.source
    """.replace("{h8}", "(" + " + ".join(
        f"(instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), {i + 1}, 1)) - 1)"
        f" * {16 ** (7 - i)}" for i in range(8)) + ")"),
)
def mixture_token_budget_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The data-mixing planner: given a total token budget (half the corpus
    here) split equally across sources, COMPUTE each source's keep-rate
    (capped at 1.0 — a source smaller than its share contributes all of
    itself), then apply it with the deterministic 32-bit hash gate and
    report planned vs achieved tokens per source.

    This is the step training recipes call 'mixture weights': the planner
    is two tiny aggregates (per-source token sums, then the total), the
    application is the same map-only hash gate as every sampler here —
    per-row cost is one md5, and the rate table broadcasts at any source
    count. Achieved tokens track the target only in expectation (hash
    gates select docs, not tokens); the exact per-source shortfall is the
    point of reporting both columns.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        "source",
        F.size(F.split("text", " ")).cast("long").alias("n_tok"),
        F.expr(f"CAST(conv(substring({_KEY}, 1, 8), 16, 10) AS BIGINT)").alias("h32"),
    )
    per_src = tok.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("src_tok")
    )
    tot = per_src.agg(
        F.sum("src_tok").alias("total_tok"), F.count(F.lit(1)).alias("n_src")
    )
    plan = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "src_tok",
        F.expr("CAST(FLOOR(total_tok / (2.0 * n_src)) AS BIGINT)").alias("target_tok"),
        F.expr(
            "LEAST(1.0, CAST(FLOOR(total_tok / (2.0 * n_src)) AS BIGINT)"
            " / CAST(src_tok AS DOUBLE))"
        ).alias("rate"),
    )
    kept = (
        tok.join(F.broadcast(plan.select("source", "rate")), "source")
        .filter(F.col("h32") < F.expr("CAST(FLOOR(rate * 4294967296.0) AS BIGINT)"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("kept_docs"), F.sum("n_tok").alias("kept_tok")
        )
    )
    return (
        plan.join(kept, "source", "left")
        .select(
            "source",
            "n_docs",
            "src_tok",
            "target_tok",
            round9("rate").alias("rate"),
            F.coalesce("kept_docs", F.lit(0)).alias("kept_docs"),
            F.coalesce("kept_tok", F.lit(0)).alias("kept_tok"),
        )
    )


@register(
    "dsir_importance_select",
    oracle="""
    WITH tok AS (
        SELECT doc_id, source, substr(md5(w), 1, 2) AS b
        FROM (SELECT doc_id, source, unnest(list_filter(
                  string_split(text, ' '), x -> x <> '')) AS w
              FROM documents)
    ),
    cor AS (SELECT b, COUNT(*) AS cc FROM tok GROUP BY b),
    tgt AS (SELECT b, COUNT(*) AS tc FROM tok WHERE source = 'src0'
            GROUP BY b),
    tot AS (SELECT CAST((SELECT COUNT(*) FROM tok) AS DOUBLE) AS ct,
                   CAST((SELECT COUNT(*) FROM tok WHERE source = 'src0')
                        AS DOUBLE) AS tt),
    w AS (
        SELECT cor.b,
               CAST(ROUND(LOG10((CAST(COALESCE(tgt.tc, 0) AS DOUBLE) + 0.5)
                                / (tot.tt + 128.0))
                          - LOG10((CAST(cor.cc AS DOUBLE) + 0.5)
                                  / (tot.ct + 128.0)), 6)
                    AS DECIMAL(20,6)) AS wt
        FROM cor LEFT JOIN tgt ON cor.b = tgt.b, tot
    ),
    doc_b AS (
        SELECT doc_id, b, COUNT(*) AS c FROM tok
        WHERE source <> 'src0' GROUP BY doc_id, b
    )
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(SUM(c * wt) AS DOUBLE) AS importance
    FROM doc_b JOIN w ON doc_b.b = w.b
    GROUP BY doc_id
    ORDER BY importance DESC, doc_id ASC LIMIT 100
    """,
)
def dsir_importance_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023 "Data Selection for
    Language Models via Importance Resampling"): hashed-unigram features,
    importance weight per feature bucket = log target-likelihood ratio
    against the raw corpus, per-document importance = sum of its tokens'
    bucket weights; the 100 highest-importance non-target documents are
    selected as "most target-like". Target domain here: source = 'src0'.

    Cross-engine determinism: buckets are the first two md5 hex chars (the
    split_train_test_hash recipe — no engine-specific hash function);
    bucket weights are log10 ratios rounded to 6 decimals as DECIMAL;
    per-doc importance = SUM(count x weight) in exact decimal arithmetic.

    Scale: one tokenize pass; bucket histograms are 256-row aggregates
    (partial-agg shuffles); the weight table is broadcast; the per-doc
    accumulation shuffles on (doc_id, bucket) then doc_id; the rank is
    TakeOrderedAndProject(100). The feature space is CONSTANT-size by
    construction, so weight state never grows with the corpus — the
    property that makes DSIR run at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    tok = d.select(
        "doc_id", "source", F.explode(ws).alias("w")
    ).select("doc_id", "source", F.expr("substr(md5(w), 1, 2)").alias("b"))
    cor = tok.groupBy("b").agg(F.count(F.lit(1)).alias("cc"))
    tgt = (
        tok.filter(F.col("source") == "src0")
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("tc"))
    )
    tot = tok.agg(
        F.count(F.lit(1)).cast("double").alias("ct"),
        F.count(F.when(F.col("source") == "src0", 1)).cast("double").alias("tt"),
    )
    wt = (
        cor.join(tgt, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            F.round(
                F.log10(
                    (F.coalesce(F.col("tc"), F.lit(0)).cast("double") + F.lit(0.5))
                    / (F.col("tt") + F.lit(128.0))
                )
                - F.log10(
                    (F.col("cc").cast("double") + F.lit(0.5))
                    / (F.col("ct") + F.lit(128.0))
                ),
                6,
            )
            .cast("decimal(20,6)")
            .alias("wt"),
        )
    )
    doc_b = (
        tok.filter(F.col("source") != "src0")
        .groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        doc_b.join(F.broadcast(wt), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.col("c") * F.col("wt")).cast("double").alias("importance"),
        )
        .orderBy(F.desc("importance"), F.asc("doc_id"))
        .limit(100)
    )


from chainhouse_spark.queries.llm_text import _DUCK_HITS as _CARD_HITS


@register(
    "dataset_card_by_source",
    oracle=f"""
    WITH base AS (
        SELECT source, lang, n_chars, doc_id,
               md5(text) AS h,
               len(string_split(text, ' ')) AS nt,
               LEAST(1.0, len(string_split(text, ' ')) / 100.0) * 0.5
                 + (CAST({_CARD_HITS['en']} AS DOUBLE)
                        / len(string_split(text, ' '))) * 0.3
                 + (1.0 - CAST(LENGTH(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g'))
                               AS DOUBLE) / LENGTH(text)) * 0.2 AS score
        FROM documents
    ),
    ranked AS (
        SELECT *,
               COUNT(*) OVER (PARTITION BY source) AS n,
               ROW_NUMBER() OVER (PARTITION BY source
                                  ORDER BY n_chars, doc_id) AS rk
        FROM base
    ),
    med AS (
        SELECT *,
               MAX(CASE WHEN rk = (n + 1) // 2 THEN n_chars END)
                   OVER (PARTITION BY source) AS med_c
        FROM ranked
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT h) AS BIGINT) AS n_unique_texts,
           CAST(COUNT(*) - COUNT(DISTINCT h) AS DOUBLE) / COUNT(*) AS dup_rate,
           CAST(SUM(nt) AS BIGINT) AS total_ws_tokens,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
           CAST(COUNT(*) FILTER (WHERE lang = 'en') AS DOUBLE)
               / COUNT(*) AS en_share,
           (ROUND((CAST(SUM(CAST(ROUND(score, 6) AS DECIMAL(20,6))) AS DOUBLE)
               / COUNT(*)) * 1e9) / 1e9 + 0.0) AS mean_quality,
           CAST(MIN(med_c) AS BIGINT) AS median_chars
    FROM med
    GROUP BY source
    """,
)
def dataset_card_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-source dataset card a corpus release publishes: volume,
    exact-duplicate rate (1 - unique-texts/docs over md5(text)), whitespace
    token total, language mix with English share, mean composite quality
    (per-doc scores rounded-then-DECIMAL-summed — the cross-engine float
    recipe), and the EXACT rank-based median length. One corpus scan; the
    median windows share the source partitioning with the final group; the
    two COUNT(DISTINCT)s plan as one expand + two-level agg (a 3x map-side
    row expansion of a narrow projection — the standard multi-distinct
    cost, still one shuffle family on source)."""
    from pyspark.sql import Window

    from chainhouse_spark.functions.text import (
        LANG_STOPWORDS,
        n_tokens,
        punct_ratio,
        stopword_ratio,
    )

    d = load_table(spark, sf_dir, "documents")
    nt = n_tokens("text")
    score = (
        F.least(F.lit(1.0), nt / 100.0) * 0.5
        + stopword_ratio("text", LANG_STOPWORDS["en"]) * 0.3
        + (F.lit(1.0) - punct_ratio("text")) * 0.2
    )
    base = d.select(
        "source",
        "lang",
        "n_chars",
        "doc_id",
        F.md5("text").alias("h"),
        nt.alias("nt"),
        score.alias("score"),
    )
    wp = Window.partitionBy("source")
    ranked = base.withColumn("n", F.count(F.lit(1)).over(wp)).withColumn(
        "rk", F.row_number().over(wp.orderBy(F.asc("n_chars"), F.asc("doc_id")))
    )
    med = ranked.withColumn(
        "med_c",
        F.max(
            F.when(F.col("rk") == F.expr("(n + 1) div 2"), F.col("n_chars"))
        ).over(wp),
    )
    cnt = F.count(F.lit(1))
    return med.groupBy("source").agg(
        cnt.cast("bigint").alias("n_docs"),
        F.countDistinct("h").cast("bigint").alias("n_unique_texts"),
        ((cnt - F.countDistinct("h")).cast("double") / cnt).alias("dup_rate"),
        F.sum("nt").cast("bigint").alias("total_ws_tokens"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        (
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double")
            / cnt
        ).alias("en_share"),
        F.round(
            F.sum(F.round(F.col("score"), 6).cast("decimal(20,6)")).cast("double")
            / cnt,
            9,
        ).alias("mean_quality"),
        F.min("med_c").cast("bigint").alias("median_chars"),
    )


@register(
    "sample_exact_k_per_group",
    oracle="""
    WITH ranked AS (
        SELECT doc_id, lang,
               ROW_NUMBER() OVER (PARTITION BY lang
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id)
                   AS rk
        FROM documents
    )
    SELECT lang, doc_id, CAST(rk AS INT) AS rk
    FROM ranked WHERE rk <= 20
    """,
)
def sample_exact_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum sampling (k=20 docs per language): rank by the
    md5 of the key and keep the first k — the eval-set builder that needs
    EXACT per-group counts, where the hash-rate gate
    (sample_stratified_per_lang) only hits the rate in expectation.
    Deterministic under re-runs and engine swaps (hash order, doc_id
    tie-break); one rank shuffle on the stratum key, and the window is
    rank-limited so at scale Spark's WindowGroupLimit pushes the k-cutoff
    before the full sort materializes."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        d.select("lang", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 20)
        .select("lang", "doc_id", F.col("rk").cast("int").alias("rk"))
    )


@register(
    "sample_temperature_mixing",
    oracle=f"""{FRUGAL_ORACLE}
    WITH per_src AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS src_tok
        FROM documents GROUP BY source
    ),
    tot AS (SELECT CAST(SUM(src_tok) AS BIGINT) AS total_tok FROM per_src),
    w AS (
        SELECT p.source, p.n_docs, p.src_tok,
               CAST(p.src_tok AS DOUBLE) / t.total_tok AS q_share,
               CAST(ROUND(sqrt(CAST(p.src_tok AS DOUBLE) / t.total_tok), 12)
                    AS DECIMAL(20,12)) AS w_dec,
               t.total_tok
        FROM per_src p, tot t
    ),
    z AS (SELECT CAST(SUM(w_dec) AS DECIMAL(24,12)) AS z_dec FROM w)
    SELECT w.source, w.n_docs, w.src_tok, (ROUND((w.q_share) * 1e9) / 1e9 + 0.0) AS q_share,
           (ROUND((CAST(w.w_dec AS DOUBLE) / CAST(z.z_dec AS DOUBLE)) * 1e9) / 1e9 + 0.0) AS p_temp,
           CAST(FLOOR((CAST(w.total_tok AS DOUBLE) / 2.0)
                      * (CAST(w.w_dec AS DOUBLE) / CAST(z.z_dec AS DOUBLE)))
                AS BIGINT) AS planned_tok,
           (ROUND(((CAST(w.w_dec AS DOUBLE) / CAST(z.z_dec AS DOUBLE)) / w.q_share
             ) * 1e9) / 1e9 + 0.0) AS oversample_factor
    FROM w, z
    """,
)
def sample_temperature_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing (the multilingual-training standard,
    Conneau & Lample 2019 / mT5: sample source i with p_i ∝ q_i^α,
    α=0.5 here) — flattens the head so low-resource sources are seen more
    than their natural share, unlike `mixture_token_budget_plan`'s equal
    split. α=0.5 makes q^α = sqrt(q): sqrt is IEEE-correctly-rounded in
    both engines (pow is not), and each weight is rounded to 12 decimals
    then DECIMAL-summed so the normalizer Z is order-independent. Scale:
    two tiny aggregates (per-source token sums, the 1-row total and Z) and
    a broadcast combine — nothing beyond |sources| rows ever moves."""
    docs = load_table(spark, sf_dir, "documents")
    per_src = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("src_tok"),
    )
    tot = per_src.agg(F.sum("src_tok").cast("bigint").alias("total_tok"))
    w = per_src.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "src_tok",
        F.expr("CAST(src_tok AS DOUBLE) / total_tok").alias("q_share"),
        F.expr(
            "CAST(ROUND(sqrt(CAST(src_tok AS DOUBLE) / total_tok), 12)"
            " AS DECIMAL(20,12))"
        ).alias("w_dec"),
        "total_tok",
    )
    z = w.agg(F.expr("CAST(SUM(w_dec) AS DECIMAL(24,12))").alias("z_dec"))
    p = "CAST(w_dec AS DOUBLE) / CAST(z_dec AS DOUBLE)"
    return w.crossJoin(F.broadcast(z)).select(
        "source",
        "n_docs",
        "src_tok",
        round9("q_share").alias("q_share"),
        F.expr(f"(ROUND(({p}) * 1e9) / 1e9 + 0.0)").alias("p_temp"),
        F.expr(
            f"CAST(FLOOR((CAST(total_tok AS DOUBLE) / 2.0) * ({p})) AS BIGINT)"
        ).alias("planned_tok"),
        F.expr(f"(ROUND((({p}) / q_share) * 1e9) / 1e9 + 0.0)").alias("oversample_factor"),
    )


@register(
    "sample_downweight_duplicates",
    oracle=f"""{FRUGAL_ORACLE}
    WITH sized AS (
        SELECT doc_id, source, md5(text) AS h,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    ),
    clusters AS (
        SELECT h, CAST(COUNT(*) AS BIGINT) AS n_copies FROM sized GROUP BY h
    )
    SELECT s.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(s.n_tok) AS BIGINT) AS raw_tok,
           CAST(SUM(CAST(ROUND(CAST(s.n_tok AS DOUBLE) / c.n_copies, 6)
                         AS DECIMAL(20,6))) AS DOUBLE) AS effective_tok,
           CAST(SUM(CASE WHEN c.n_copies > 1 THEN s.n_tok ELSE 0 END)
                AS BIGINT) AS duplicated_tok
    FROM sized s JOIN clusters c ON s.h = c.h
    GROUP BY s.source
    """,
)
def sample_downweight_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Soft dedup by downweighting instead of dropping: every copy of an
    exact-duplicate cluster keeps weight 1/n_copies, so the cluster
    contributes ONE document's worth of training mass regardless of how
    many sources carry it (the modern alternative to hard dedup — keeps
    cross-source coverage while killing memorization pressure). Reports
    raw vs effective token mass per source; the gap is each source's
    duplication tax. Per-token weights round into DECIMAL(20,6) before
    summing (float add order is engine-dependent). Scale: one 16-byte-key
    count shuffle (never document bodies) + a hash equi-join back — the
    dedup_exact shape with a weight instead of a row_number filter."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        "source",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    clusters = sized.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies")
    )
    return (
        sized.join(clusters, "h")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("raw_tok"),
            F.expr(
                "CAST(SUM(CAST(ROUND(CAST(n_tok AS DOUBLE) / n_copies, 6)"
                " AS DECIMAL(20,6))) AS DOUBLE)"
            ).alias("effective_tok"),
            F.sum(F.when(F.col("n_copies") > 1, F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias("duplicated_tok"),
        )
    )


@register(
    "sample_systematic_every_k",
    oracle="""
    WITH keyed AS (
        SELECT doc_id, source, n_chars,
               md5(CAST(doc_id AS VARCHAR) || ':sysk') AS hk
        FROM documents
    ),
    ranked AS (
        SELECT doc_id, source, n_chars,
               ROW_NUMBER() OVER (ORDER BY hk, doc_id) AS rk
        FROM keyed
    ),
    picked AS (
        SELECT doc_id, source, n_chars FROM ranked WHERE rk % 20 = 7
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(SUM(n_chars) AS BIGINT) AS sampled_chars,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id
    FROM picked GROUP BY source
    """,
)
def sample_systematic_every_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic every-k-th sampling over a hash-shuffled order: rank
    documents by md5(doc_id) (a deterministic corpus shuffle — the same
    keying as corpus_shuffle_shards) and keep every 20th with a fixed
    phase. Versus the Bernoulli hash-gate (split_train_test_hash) this
    gives an EXACTLY n/20 sample with even spacing in the shuffled order
    — the shape auditors ask for. The global rank runs through the
    distributed exact-rank operator (never a single-task window); at
    100 TB the cheaper production variant drops the rank entirely and
    gates on md5 mod 20 = 7 (Bernoulli, n/20 in expectation) — the rank
    version is for when the count must be exact."""
    from chainhouse_spark.operators.ranking import global_row_number

    d = load_table(spark, sf_dir, "documents")
    keyed = d.select(
        "doc_id",
        "source",
        "n_chars",
        F.md5(F.concat(F.col("doc_id").cast("string"), F.lit(":sysk"))).alias(
            "hk"
        ),
    )
    # materialize_input (round-12 W9): the md5-keyed projection is
    # MAP-ONLY off the documents scan, so the range-sampling job would
    # re-run the scan + digest per call otherwise.
    ranked = global_row_number(
        keyed, [F.asc("hk"), F.asc("doc_id")], "rk", materialize_input=True
    )
    picked = ranked.filter(F.col("rk") % 20 == 7)
    return picked.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sampled"),
        F.sum("n_chars").cast("bigint").alias("sampled_chars"),
        F.min("doc_id").cast("bigint").alias("min_doc_id"),
    )


@register(
    "mixture_upsample_plan",
    oracle="""
    WITH counts AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_chars) AS BIGINT) AS n_chars
        FROM documents GROUP BY lang
    ),
    tot AS (SELECT CAST(SUM(n_chars) AS BIGINT) AS total FROM counts)
    SELECT lang, n_docs, n_chars,
           ROUND(CAST(n_chars AS DOUBLE) / total, 9) AS natural_share,
           -- temperature tau = 0.7 rebalancing: share^tau renormalized
           ROUND(POWER(CAST(n_chars AS DOUBLE) / total, 0.7)
                 / (SELECT SUM(POWER(CAST(c2.n_chars AS DOUBLE) / t2.total, 0.7))
                    FROM counts c2, tot t2), 9) AS target_share,
           ROUND((POWER(CAST(n_chars AS DOUBLE) / total, 0.7)
                  / (SELECT SUM(POWER(CAST(c2.n_chars AS DOUBLE) / t2.total, 0.7))
                     FROM counts c2, tot t2))
                 / (CAST(n_chars AS DOUBLE) / total), 9) AS upsample_factor
    FROM counts, tot
    """,
)
def mixture_upsample_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-rebalanced language mixture plan (tau = 0.7, the
    mBERT/XLM-R exponent): natural char shares flattened as share^tau and
    renormalized, with the per-language upsample factor = target/natural
    — the sampling-weights table a multilingual training run consumes
    (low-resource languages get factors > 1). Everything downstream of
    one |langs|-row aggregate; the POWER terms are computed over
    identical exact ratios in both engines and the renormalizing sum
    spans ~5 ordered values, rounded at 9. Companion to
    sample_temperature_mixing (which applies a plan like this one) and
    mixture_token_budget_plan (budget-capped variant)."""
    d = load_table(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    tot = counts.agg(
        F.sum("n_chars").cast("bigint").alias("total"),
    )
    base = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "n_chars",
        (F.col("n_chars").cast("double") / F.col("total")).alias("nat"),
    )
    z = base.agg(F.sum(F.pow(F.col("nat"), 0.7)).alias("z"))
    return base.crossJoin(F.broadcast(z)).select(
        "lang",
        "n_docs",
        "n_chars",
        F.round(F.col("nat"), 9).alias("natural_share"),
        F.round(F.pow(F.col("nat"), 0.7) / F.col("z"), 9).alias("target_share"),
        F.round(
            (F.pow(F.col("nat"), 0.7) / F.col("z")) / F.col("nat"), 9
        ).alias("upsample_factor"),
    )
