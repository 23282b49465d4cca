"""Gopher/C4-style document quality filters: word-level repetition metrics
and a thresholded corpus quality gate.

The reference pipeline has no quality filtering (it is an ETL loader); these
are the beyond-parity operators a training-data pipeline runs between ingest
and dedup (Rae et al. 2021 "Gopher" §A.1.1 repetition filters; Raffel et al.
2020 "C4" heuristics), re-expressed as pure Spark column expressions.

Scale notes:
  - Both queries are a single map-only pass over `documents` (no shuffle for
    the per-doc metrics; the gate aggregates by `source`, one partial-agg
    shuffle). At 100 TB this is scan-bound, exactly what you want.
  - The per-doc mode (most-frequent word / bigram) is computed INSIDE the row
    via higher-order lambdas — O(distinct × words) per doc stays cheap for
    real document sizes and avoids an explode + groupBy(doc_id, word) shuffle
    whose key cardinality would be corpus_words ≈ tokens-in-corpus.
  - The token array is bound once per document via the single-element
    `transform(array(split(...)), t -> ...)` trick; inlining `split` into the
    inner lambdas would re-tokenize per distinct word (quadratic blowup).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.functions.rounding import round9
from chainhouse_spark.queries.registry import register
from chainhouse_spark.tables import load_table

# Per-doc repetition facts as a single bound-lambda struct:
#   t = token array (bound once), b = word-bigram array (bound once).
# Counts are integers; every derived fraction is a SINGLE float division of
# two integers, so Spark and DuckDB produce bit-identical doubles.
_METRICS_SQL = """
element_at(transform(array(split(text, ' ')), t ->
  element_at(transform(array(CASE WHEN size(t) >= 2
      THEN transform(sequence(1, size(t) - 1),
                     i -> concat(element_at(t, i), ' ', element_at(t, i + 1)))
      ELSE array() END), b ->
    named_struct(
      'n_words', size(t),
      'distinct_words', size(array_distinct(t)),
      'top_word_cnt',
        array_max(transform(array_distinct(t), w -> size(filter(t, x -> x = w)))),
      'n_bigrams', size(b),
      'distinct_bigrams', size(array_distinct(b)),
      'top_bigram_cnt',
        CASE WHEN size(b) > 0
             THEN array_max(transform(array_distinct(b),
                                      u -> size(filter(b, x -> x = u))))
             ELSE 0 END
    )), 1)), 1)
"""

_DUCK_METRICS_CTE = """
WITH toks AS (
    SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
), big AS (
    SELECT doc_id, source, t,
           CASE WHEN len(t) >= 2
                THEN list_transform(generate_series(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i + 1])
                ELSE CAST([] AS VARCHAR[]) END AS b
    FROM toks
), m AS (
    SELECT doc_id, source,
           len(t) AS n_words,
           len(list_distinct(t)) AS distinct_words,
           list_max(list_transform(list_distinct(t),
                                   w -> len(list_filter(t, x -> x = w)))) AS top_word_cnt,
           len(b) AS n_bigrams,
           len(list_distinct(b)) AS distinct_bigrams,
           CASE WHEN len(b) > 0
                THEN list_max(list_transform(list_distinct(b),
                                             u -> len(list_filter(b, x -> x = u))))
                ELSE 0 END AS top_bigram_cnt
    FROM big
)
"""

# Gopher-style keep thresholds, expressed over INTEGERS (no float boundary
# risk): >=20 words, >=40% distinct words, most-frequent word <=15% of tokens.
_KEEP_SQL = (
    "n_words >= 20 AND distinct_words * 10 >= n_words * 4 "
    "AND top_word_cnt * 100 <= n_words * 15"
)


@register(
    "text_repetition_metrics",
    oracle=_DUCK_METRICS_CTE
    + """
    SELECT doc_id,
           n_words,
           (ROUND((CAST(distinct_words AS DOUBLE) / n_words) * 1e9) / 1e9 + 0.0) AS distinct_word_frac,
           (ROUND((CAST(top_word_cnt AS DOUBLE) / n_words) * 1e9) / 1e9 + 0.0) AS top_word_frac,
           (ROUND((CASE WHEN n_bigrams > 0
                THEN 1.0 - CAST(distinct_bigrams AS DOUBLE) / n_bigrams
                ELSE 0.0 END) * 1e9) / 1e9 + 0.0) AS dup_bigram_frac,
           (ROUND((CASE WHEN n_bigrams > 0
                THEN CAST(top_bigram_cnt AS DOUBLE) / n_bigrams
                ELSE 0.0 END) * 1e9) / 1e9 + 0.0) AS top_bigram_frac
    FROM m
    """,
)
def text_repetition_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters per document: distinct-word fraction,
    most-frequent-word fraction, duplicate/most-frequent bigram fractions.
    Map-only single pass — no shuffle, no Python."""
    d = load_table(spark, sf_dir, "documents")
    m = F.expr(_METRICS_SQL)
    return d.select("doc_id", m.alias("m")).select(
        "doc_id",
        F.col("m.n_words").alias("n_words"),
        round9(
            F.col("m.distinct_words").cast("double") / F.col("m.n_words")).alias("distinct_word_frac"),
        round9(
            F.col("m.top_word_cnt").cast("double") / F.col("m.n_words")).alias("top_word_frac"),
        F.round(
            F.when(
                F.col("m.n_bigrams") > 0,
                F.lit(1.0)
                - F.col("m.distinct_bigrams").cast("double") / F.col("m.n_bigrams"),
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("dup_bigram_frac"),
        F.round(
            F.when(
                F.col("m.n_bigrams") > 0,
                F.col("m.top_bigram_cnt").cast("double") / F.col("m.n_bigrams"),
            ).otherwise(F.lit(0.0)),
            9,
        ).alias("top_bigram_frac"),
    )


@register(
    "filter_quality_gate_by_source",
    oracle=_DUCK_METRICS_CTE
    + f"""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN {_KEEP_SQL} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN {_KEEP_SQL} THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*) AS kept_frac,
           CAST(sum(top_word_cnt) AS BIGINT) AS sum_top_word_cnt,
           CAST(sum(n_words) AS BIGINT) AS sum_words,
           (ROUND((CAST(sum(top_word_cnt) AS DOUBLE) / sum(n_words)) * 1e9) / 1e9 + 0.0) AS micro_top_word_frac
    FROM m
    GROUP BY source
    """,
)
def filter_quality_gate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Thresholded quality gate aggregated per source: how much of each
    source survives the Gopher-style repetition filters, plus the
    micro-averaged top-word fraction (ratio of integer sums — deterministic,
    unlike an avg of per-doc doubles). One partial-agg shuffle on `source`."""
    d = load_table(spark, sf_dir, "documents")
    m = d.select("source", F.expr(_METRICS_SQL).alias("m")).select(
        "source",
        F.col("m.n_words").alias("n_words"),
        F.col("m.distinct_words").alias("distinct_words"),
        F.col("m.top_word_cnt").alias("top_word_cnt"),
    )
    keep = F.expr(_KEEP_SQL).cast("long")
    return m.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(keep).alias("n_kept"),
        (F.sum(keep).cast("double") / F.count(F.lit(1))).alias("kept_frac"),
        F.sum("top_word_cnt").alias("sum_top_word_cnt"),
        F.sum("n_words").alias("sum_words"),
        round9(
            F.sum("top_word_cnt").cast("double") / F.sum("n_words")).alias("micro_top_word_frac"),
    )


# -- encoding quality gate ---------------------------------------------------
#
# Bad decode artifacts a crawl corpus carries: U+FFFD replacement characters
# (lossy transcode), C0 control characters other than \t\n\r (binary leaked
# into text), and the 'Ã'/'â' lead characters of UTF-8-decoded-as-Latin-1
# mojibake. Each count is a length difference after stripping, so both
# engines compute identical integers; there are no floats anywhere.
_REPL = "�"
_CTRL_RE = "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]"
_MOJI_A = "Ã"  # lead of 2-byte UTF-8 misdecoded as Latin-1
_MOJI_B = "â"  # lead of 3-byte punctuation mojibake ('â€¦', 'â€”')


def _enc_count_exprs(dialect: str) -> list[str]:
    """The three artifact-count expressions over `text`, aliased. Dialect
    differences: DuckDB's regexp_replace is FIRST-match-only without the
    'g' flag (Spark's is global), and Spark's string literals consume
    backslash escapes (so the \\x class needs doubled backslashes there;
    DuckDB single-quoted literals are escape-free)."""
    flags = ", 'g'" if dialect == "duckdb" else ""
    cls = _CTRL_RE.replace("\\", "\\\\") if dialect == "spark" else _CTRL_RE
    return [
        f"length(text) - length(replace(text, '{_REPL}', '')) AS n_repl",
        f"length(text) - length(regexp_replace(text, '{cls}', ''{flags}))"
        " AS n_ctrl",
        f"(length(text) - length(replace(text, '{_MOJI_A}', '')))"
        f" + (length(text) - length(replace(text, '{_MOJI_B}', '')))"
        " AS n_moji",
    ]


@register(
    "text_encoding_quality",
    oracle=f"""
    WITH c AS (
        SELECT doc_id, source, length(text) AS n_chars_txt,
               {", ".join(_enc_count_exprs("duckdb"))}
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN n_repl > 0 OR n_ctrl > 0
                         OR n_moji * 1000 > n_chars_txt
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_flagged,
           CAST(SUM(n_repl) AS BIGINT) AS total_repl,
           CAST(SUM(n_ctrl) AS BIGINT) AS total_ctrl,
           CAST(SUM(n_moji) AS BIGINT) AS total_moji
    FROM c
    GROUP BY source
    ORDER BY source
    """,
)
def text_encoding_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-health gate per source: count U+FFFD replacement chars,
    stray C0 control chars (binary contamination; tab/newline/CR exempt),
    and Latin-1 mojibake lead characters; flag docs with any hard artifact
    or a mojibake rate over 0.1% (integer cross-multiplication — no float
    threshold anywhere).

    This is the cheap pre-filter a crawl pipeline runs before any
    tokenizer work: one map-only pass (two string replaces + one regex,
    all JVM-side inside WholeStageCodegen), then a per-source partial-agg
    shuffle whose key cardinality is the source count. Detection logic is
    unit-proven on crafted artifacts in tests/test_python_surface.py.
    """
    docs = load_table(spark, sf_dir, "documents")
    c = docs.selectExpr(
        "doc_id", "source", "length(text) AS n_chars_txt",
        *_enc_count_exprs("spark"),
    )
    return (
        c.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(
                F.expr(
                    "CASE WHEN n_repl > 0 OR n_ctrl > 0 "
                    "OR n_moji * 1000 > n_chars_txt THEN 1 ELSE 0 END"
                )
            )
            .cast("long")
            .alias("n_flagged"),
            F.sum("n_repl").cast("long").alias("total_repl"),
            F.sum("n_ctrl").cast("long").alias("total_ctrl"),
            F.sum("n_moji").cast("long").alias("total_moji"),
        )
        .orderBy("source")
    )


@register(
    "lm_bigram_perplexity_rank",
    oracle="""
    WITH d AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS ws
        FROM documents
    ),
    big AS (
        SELECT doc_id, ws[i] AS w1, ws[i + 1] AS w2
        FROM d, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)
    ),
    c12 AS (SELECT w1, w2, COUNT(*) AS c FROM big GROUP BY w1, w2),
    c1 AS (SELECT w1, COUNT(*) AS c FROM big GROUP BY w1),
    v AS (SELECT CAST(COUNT(DISTINCT w) AS DOUBLE) AS v
          FROM (SELECT unnest(ws) AS w FROM d)),
    scored AS (
        SELECT big.doc_id,
               CAST(ROUND(LOG10((CAST(c12.c AS DOUBLE) + 0.5)
                                / (CAST(c1.c AS DOUBLE) + 0.5 * v.v)), 6)
                    AS DECIMAL(20,6)) AS lp
        FROM big, v
        JOIN c12 ON big.w1 = c12.w1 AND big.w2 = c12.w2
        JOIN c1 ON big.w1 = c1.w1
    )
    SELECT doc_id, n_bigrams, sum_lp, (ROUND((avg_lp) * 1e9) / 1e9 + 0.0) AS avg_lp FROM (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               CAST(SUM(lp) AS DOUBLE) AS sum_lp,
               CAST(SUM(lp) AS DOUBLE) / COUNT(*) AS avg_lp
        FROM scored GROUP BY doc_id
        ORDER BY avg_lp ASC, doc_id ASC LIMIT 100
    )
    """,
)
def lm_bigram_perplexity_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style language-model quality filter (Wenzek et al. 2020
    "CCNet": rank documents by LM perplexity, drop the tail): a bigram LM
    with add-1/2 smoothing is trained ON the corpus in one pass, every
    document is scored under it, and the 100 most-surprising documents
    (lowest mean log10-probability per bigram) surface for the filter.

    Determinism across engines: counts are exact integers; each bigram's
    log10 P(w2|w1) is rounded to 6 decimals and summed as DECIMAL (libm
    last-ulp and float-order differences absorbed — the stat_entropy
    recipe); the final mean is one double division of identical inputs.

    Scale: tokenize once (map-only), bigram expansion map-side; training =
    two partial-agg shuffles (bigram and context counts — the classic
    heavy-hitter skew on stopword pairs is exactly what AQE skew-join and
    partial aggregation absorb); scoring joins re-use the bigram-key
    partitioning of the counts; V travels as a broadcast scalar; the final
    rank is TakeOrderedAndProject(100), never a global sort. No step holds
    a vocabulary or document in driver memory, so the same plan runs at
    100 TB with the counts tables as the only state."""
    d = load_table(spark, sf_dir, "documents")
    ws = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    docs = d.select("doc_id", ws.alias("ws"))
    big = (
        # Round-12: the >=2 guard (sequence(1, 0) would REVERSE) is fused
        # into the explode instead of a .filter() on the projected token
        # array — the pushed filter re-tokenized every document in the
        # Filter node (the span_corruption / PMI duplication class).
        docs.select(
            "doc_id",
            F.expr(
                "explode(transform("
                "CASE WHEN size(ws) >= 2 THEN sequence(1, size(ws) - 1) "
                "ELSE array() END, "
                "i -> struct(element_at(ws, i) AS w1, "
                "element_at(ws, i + 1) AS w2)))"
            ).alias("pr"),
        )
        .select("doc_id", "pr.w1", "pr.w2")
    )
    # Round-12 W11: the context margin is the row-sum of the joint
    # bigram counts (c1(w1) = Σ_w2 c12 — the marginalization identity),
    # and the checkpointed joint table also feeds the scoring joins, so
    # the corpus-wide bigram expansion runs once for training instead of
    # twice (the scoring pass below still re-derives it with doc_id —
    # that one genuinely needs per-instance rows).
    c12 = (
        big.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .localCheckpoint(eager=False)
    )
    c1 = c12.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vdf = (
        # Inline generator (not explode of the projected attribute):
        # InferFiltersFromGenerate's size(attr) > 0 filter for attribute
        # generators pushes below the projection and re-tokenizes every
        # document; the inline form hits the rule's SPARK-36715
        # expensive-expression guard and stays single-pass (round-12 W11).
        d.select(F.explode(ws).alias("w"))
        .agg(F.countDistinct("w").cast("double").alias("v"))
    )
    p = (F.col("c12").cast("double") + F.lit(0.5)) / (
        F.col("c1").cast("double") + F.lit(0.5) * F.col("v")
    )
    scored = (
        big.join(c12, ["w1", "w2"])
        .join(c1, ["w1"])
        .crossJoin(F.broadcast(vdf))
        .select("doc_id", F.round(F.log10(p), 6).cast("decimal(20,6)").alias("lp"))
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum("lp").alias("slp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.col("slp").cast("double").alias("sum_lp"),
            (F.col("slp").cast("double") / F.col("n_bigrams")).alias("avg_lp"),
        )
        .orderBy(F.asc("avg_lp"), F.asc("doc_id"))
        .limit(100)
        .withColumn("avg_lp", round9("avg_lp"))
    )


_NB_SCORE_CTE = """
    WITH tok AS (
        SELECT doc_id, lang, substr(md5(w), 1, 2) AS b
        FROM (SELECT doc_id, lang, unnest(list_filter(
                  string_split(text, ' '), x -> x <> '')) AS w
              FROM documents)
    ),
    langs AS (SELECT lang, COUNT(DISTINCT doc_id) AS n_docs,
                     COUNT(*) AS n_tok
              FROM tok GROUP BY lang),
    buckets AS (SELECT DISTINCT b FROM tok),
    cnt AS (SELECT lang, b, COUNT(*) AS c FROM tok GROUP BY lang, b),
    wt AS (
        SELECT langs.lang, buckets.b,
               CAST(ROUND(LOG10((CAST(COALESCE(cnt.c, 0) AS DOUBLE) + 0.5)
                                / (CAST(langs.n_tok AS DOUBLE) + 128.0)), 6)
                    AS DECIMAL(20,6)) AS w
        FROM langs CROSS JOIN buckets
        LEFT JOIN cnt ON cnt.lang = langs.lang AND cnt.b = buckets.b
    ),
    prior AS (
        SELECT lang,
               CAST(ROUND(LOG10(CAST(n_docs AS DOUBLE)
                                / (SELECT CAST(SUM(n_docs) AS DOUBLE)
                                   FROM langs)), 6)
                    AS DECIMAL(20,6)) AS p
        FROM langs
    ),
    doc_b AS (SELECT doc_id, lang AS actual, b, COUNT(*) AS c
              FROM tok GROUP BY doc_id, lang, b),
    score AS (
        SELECT doc_b.doc_id, doc_b.actual, wt.lang AS cand,
               SUM(doc_b.c * wt.w) + MIN(prior.p) AS s
        FROM doc_b
        JOIN wt ON doc_b.b = wt.b
        JOIN prior ON prior.lang = wt.lang
        GROUP BY doc_b.doc_id, doc_b.actual, wt.lang
    )
"""


def _nb_scores(d: DataFrame) -> DataFrame:
    """Shared NB train+score pipeline: (doc_id, actual, cand, s) with s an
    exact DECIMAL dot product of rounded log-weights (see
    nb_classify_confusion's determinism notes). Model tables broadcast."""
    ws = F.filter(F.split(F.col("text"), " "), lambda x: x != F.lit(""))
    tok = d.select(
        "doc_id", "lang", F.explode(ws).alias("w")
    ).select("doc_id", "lang", F.expr("substr(md5(w), 1, 2)").alias("b"))
    doc_b = tok.groupBy("doc_id", F.col("lang").alias("actual"), "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    cnt = tok.groupBy("lang", "b").agg(F.count(F.lit(1)).alias("c"))
    langs = tok.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_tok"),
    )
    buckets = tok.select("b").distinct()
    wt = (
        langs.crossJoin(buckets)
        .join(cnt, ["lang", "b"], "left")
        .select(
            "lang",
            "b",
            F.round(
                F.log10(
                    (F.coalesce(F.col("c"), F.lit(0)).cast("double") + F.lit(0.5))
                    / (F.col("n_tok").cast("double") + F.lit(128.0))
                ),
                6,
            )
            .cast("decimal(20,6)")
            .alias("w"),
        )
    )
    total_docs = langs.agg(F.sum("n_docs").cast("double").alias("td"))
    prior = (
        langs.crossJoin(F.broadcast(total_docs))
        .select(
            "lang",
            F.round(F.log10(F.col("n_docs").cast("double") / F.col("td")), 6)
            .cast("decimal(20,6)")
            .alias("p"),
        )
    )
    score = (
        doc_b.join(F.broadcast(wt), "b")
        .join(F.broadcast(prior), "lang")
        .groupBy("doc_id", "actual", F.col("lang").alias("cand"))
        .agg((F.sum(F.col("c") * F.col("w")) + F.min("p")).alias("s"))
    )
    return score


@register(
    "nb_classify_confusion",
    oracle=_NB_SCORE_CTE
    + """,
    pred AS (
        SELECT doc_id, actual, cand AS predicted
        FROM (SELECT doc_id, actual, cand,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY s DESC, cand ASC) AS rn
              FROM score)
        WHERE rn = 1
    )
    SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred GROUP BY actual, predicted
    """,
)
def nb_classify_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based corpus labeling at scale: a multinomial Naive Bayes
    classifier over hashed-unigram features, trained on the corpus's own
    lang labels and evaluated on it — the confusion matrix is the output
    (the fastText-supervised quality-classifier shape with exact-arithmetic
    training: NB's MLE is pure counting, so the whole train+predict
    pipeline is closed-form and engine-reproducible — no SGD order
    dependence).

    Determinism: per-(bucket, class) log-likelihoods and log-priors are
    rounded to 6 decimals as DECIMAL; per-doc per-class scores are exact
    decimal dot products; argmax breaks ties by class name.

    Scale: the model is CONSTANT-size (256 buckets x |classes| weights +
    |classes| priors — broadcast both); scoring fans each doc-bucket row
    out by |classes| through a broadcast join, aggregates on
    (doc_id, class), then one row_number window per doc picks the argmax.
    Shuffles: token histogram, score aggregate, argmax window (the last
    two share the doc_id grouping). The confusion matrix is a |classes|^2
    aggregate."""
    score = _nb_scores(load_table(spark, sf_dir, "documents"))
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("cand"))
    pred = (
        score.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("actual", F.col("cand").alias("predicted"))
    )
    return pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )


# --- Cohen's kappa: chance-corrected agreement between the heuristic
# language classifier (text_langid's stopword argmax) and the labeled lang
# column. Everything is derived from ONE contingency cube
# groupBy(source, actual, predicted) — a single shuffle whose map-side
# partial agg collapses 100 TB of documents to <= |sources| * |langs|^2
# rows; the marginal joins below run over that tiny cube, never the corpus.
# kappa = (N*agree - S) / (N*N - S) with S = sum_k rowmarg_k * colmarg_k:
# numerator and denominator are EXACT integers, so the final single
# division is bit-identical across engines (no rounding chain needed).
_KAPPA_PRED = """
CASE
    WHEN {en} >= {de} AND {en} >= {fr} AND {en} >= {es} THEN 'en'
    WHEN {de} >= {fr} AND {de} >= {es} THEN 'de'
    WHEN {fr} >= {es} THEN 'fr'
    ELSE 'es'
END
"""

# DuckDB-side stopword-hit expressions, shared with text_langid's oracle.
from chainhouse_spark.queries.llm_text import _DUCK_HITS  # noqa: E402


@register(
    "eval_cohens_kappa",
    oracle=f"""
    WITH pred AS (
        SELECT source, lang AS a,
               {_KAPPA_PRED.format(en=_DUCK_HITS["en"], de=_DUCK_HITS["de"],
                                   fr=_DUCK_HITS["fr"], es=_DUCK_HITS["es"])} AS p
        FROM documents
    ),
    ct AS (
        SELECT source, a, p, CAST(COUNT(*) AS BIGINT) AS c
        FROM pred GROUP BY source, a, p
    ),
    tot AS (
        SELECT source,
               CAST(SUM(c) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN a = p THEN c ELSE 0 END) AS BIGINT) AS agree
        FROM ct GROUP BY source
    ),
    ma AS (SELECT source, a AS k, CAST(SUM(c) AS BIGINT) AS ca FROM ct GROUP BY source, a),
    mb AS (SELECT source, p AS k, CAST(SUM(c) AS BIGINT) AS cb FROM ct GROUP BY source, p),
    s AS (
        SELECT ma.source, CAST(SUM(ma.ca * mb.cb) AS BIGINT) AS s
        FROM ma JOIN mb ON ma.source = mb.source AND ma.k = mb.k
        GROUP BY ma.source
    )
    SELECT tot.source, n AS n_docs, agree AS n_agree,
           CAST(agree AS DOUBLE) / n AS po,
           CAST(s AS DOUBLE) / (n * n) AS pe,
           CASE WHEN n * n = s THEN NULL
                ELSE CAST(n * agree - s AS DOUBLE) / (n * n - s) END AS kappa
    FROM tot JOIN s ON tot.source = s.source
    """,
)
def eval_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Cohen's kappa of the stopword-argmax language classifier
    against the labeled `lang` column — the agreement metric an annotation /
    autolabel pipeline reports alongside raw accuracy (kappa corrects for
    chance agreement under the two raters' marginals). Degenerate sources
    where chance agreement is 1 (both raters constant) yield NULL kappa
    rather than 0/0."""
    from chainhouse_spark.functions.text import LANG_STOPWORDS, stopword_hits_sql

    hits = {
        lang: stopword_hits_sql("text", ws) for lang, ws in LANG_STOPWORDS.items()
    }
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents").select(
        "source",
        F.col("lang").alias("a"),
        F.expr(_KAPPA_PRED.format(**hits)).alias("p"),
    )
    ct = d.groupBy("source", "a", "p").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    # Single lineage past the cube (a groupBy+join fan-out here would re-scan
    # and re-predict the corpus once per branch — observed 6 parquet scans):
    # per-source totals ride along as window sums, then each cube row emits
    # its two marginal events (class a contributes to the row marginal, class
    # p to the column marginal), so one more groupBy yields ca_k/cb_k and a
    # final fold computes S = sum_k ca_k*cb_k. Every post-cube exchange moves
    # <= |sources|*|langs|^2 rows regardless of corpus size.
    w = Window.partitionBy("source")
    evt = (
        ct.withColumn("n", F.sum("c").over(w))
        .withColumn(
            "agree",
            F.sum(
                F.when(F.col("a") == F.col("p"), F.col("c")).otherwise(F.lit(0))
            ).over(w),
        )
        .select(
            "source",
            "n",
            "agree",
            F.explode(
                F.array(
                    F.struct(
                        F.col("a").alias("k"),
                        F.col("c").alias("ca_part"),
                        F.lit(0).cast("bigint").alias("cb_part"),
                    ),
                    F.struct(
                        F.col("p").alias("k"),
                        F.lit(0).cast("bigint").alias("ca_part"),
                        F.col("c").alias("cb_part"),
                    ),
                )
            ).alias("m"),
        )
        .select("source", "n", "agree", "m.k", "m.ca_part", "m.cb_part")
    )
    marg = evt.groupBy("source", "k").agg(
        F.min("n").alias("n"),
        F.min("agree").alias("agree"),
        F.sum("ca_part").alias("ca"),
        F.sum("cb_part").alias("cb"),
    )
    folded = marg.groupBy("source").agg(
        F.min("n").alias("n"),
        F.min("agree").alias("agree"),
        F.sum(F.col("ca") * F.col("cb")).cast("bigint").alias("s"),
    )
    n, agree, sv = F.col("n"), F.col("agree"), F.col("s")
    return folded.select(
        "source",
        n.alias("n_docs"),
        agree.alias("n_agree"),
        (agree.cast("double") / n).alias("po"),
        (sv.cast("double") / (n * n)).alias("pe"),
        F.when(n * n == sv, F.lit(None).cast("double"))
        .otherwise((n * agree - sv).cast("double") / (n * n - sv))
        .alias("kappa"),
    )


# Margin-bucket edges for the calibration surface, in log10-score units
# (chosen to straddle the corpus's margin distribution: min ~0.02,
# median ~0.67, max ~2.2). Compares are on EXACT decimals.
_CAL_EDGES = ("0.25", "0.5", "1.0", "1.5")


@register(
    "nb_margin_calibration",
    oracle=_NB_SCORE_CTE
    + f""",
    ranked AS (
        SELECT doc_id, actual, cand, s,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                                  ORDER BY s DESC, cand ASC) AS rn
        FROM score
    ),
    per_doc AS (
        SELECT doc_id,
               MAX(CASE WHEN rn = 1 THEN s END)
                   - MAX(CASE WHEN rn = 2 THEN s END) AS margin,
               MAX(CASE WHEN rn = 1 THEN CAST(cand = actual AS INT) END)
                   AS correct
        FROM ranked GROUP BY doc_id
    ),
    bucketed AS (
        SELECT CASE WHEN margin < {_CAL_EDGES[0]} THEN 0
                    WHEN margin < {_CAL_EDGES[1]} THEN 1
                    WHEN margin < {_CAL_EDGES[2]} THEN 2
                    WHEN margin < {_CAL_EDGES[3]} THEN 3
                    ELSE 4 END AS margin_bucket,
               margin, correct
        FROM per_doc
    )
    SELECT margin_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(correct) AS BIGINT) AS n_correct,
           (ROUND((CAST(SUM(correct) AS DOUBLE) / COUNT(*)) * 1e9) / 1e9 + 0.0) AS accuracy,
           (ROUND((CAST(SUM(margin) AS DOUBLE) / COUNT(*)) * 1e9) / 1e9 + 0.0) AS mean_margin
    FROM bucketed
    GROUP BY margin_bucket
    """,
)
def nb_margin_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration surface for the NB corpus classifier: bucket documents
    by the EXACT decimal score margin (top score minus runner-up — the
    confidence proxy that, unlike a softmax posterior, needs no
    engine-divergent exp()) and report per-bucket accuracy. A
    well-calibrated filter shows accuracy rising monotonically with
    margin — this is the evidence for picking the margin cutoff when the
    classifier gates training data (keep only confidently-labeled docs).
    Same constant-size broadcast model as nb_classify_confusion; one extra
    doc-grain aggregate and a |buckets|-row final."""
    from pyspark.sql import Window

    score = _nb_scores(load_table(spark, sf_dir, "documents"))
    win = Window.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("cand"))
    ranked = score.withColumn("rn", F.row_number().over(win))
    per_doc = ranked.groupBy("doc_id").agg(
        (
            F.max(F.when(F.col("rn") == 1, F.col("s")))
            - F.max(F.when(F.col("rn") == 2, F.col("s")))
        ).alias("margin"),
        F.max(
            F.when(F.col("rn") == 1, (F.col("cand") == F.col("actual")).cast("int"))
        ).alias("correct"),
    )
    edges = [F.lit(e).cast("decimal(20,6)") for e in _CAL_EDGES]
    bucket = (
        F.when(F.col("margin") < edges[0], 0)
        .when(F.col("margin") < edges[1], 1)
        .when(F.col("margin") < edges[2], 2)
        .when(F.col("margin") < edges[3], 3)
        .otherwise(4)
    )
    cnt = F.count(F.lit(1))
    return per_doc.groupBy(bucket.alias("margin_bucket")).agg(
        cnt.cast("bigint").alias("n_docs"),
        F.sum("correct").cast("bigint").alias("n_correct"),
        round9(F.sum("correct").cast("double") / cnt).alias("accuracy"),
        round9(F.sum("margin").cast("double") / cnt).alias("mean_margin"),
    )


@register(
    "nb_classwise_f1",
    oracle=_NB_SCORE_CTE
    + """,
    pred AS (
        SELECT doc_id, actual, cand AS predicted
        FROM (SELECT doc_id, actual, cand,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY s DESC, cand ASC) AS rn
              FROM score)
        WHERE rn = 1
    ),
    per_class AS (
        SELECT actual AS lang,
               CAST(COUNT(*) AS BIGINT) AS n_actual,
               CAST(SUM(CASE WHEN predicted = actual THEN 1 ELSE 0 END)
                    AS BIGINT) AS tp
        FROM pred GROUP BY actual
    ),
    pred_tot AS (
        SELECT predicted AS lang, CAST(COUNT(*) AS BIGINT) AS n_predicted
        FROM pred GROUP BY predicted
    )
    SELECT c.lang, c.n_actual,
           COALESCE(p.n_predicted, 0) AS n_predicted, c.tp,
           (ROUND((CAST(c.tp AS DOUBLE) / NULLIF(p.n_predicted, 0)) * 1e9) / 1e9 + 0.0) AS precision_c,
           (ROUND((CAST(c.tp AS DOUBLE) / c.n_actual) * 1e9) / 1e9 + 0.0) AS recall_c,
           (ROUND((2.0 * (CAST(c.tp AS DOUBLE) / NULLIF(p.n_predicted, 0))
               * (CAST(c.tp AS DOUBLE) / c.n_actual)
             / NULLIF((CAST(c.tp AS DOUBLE) / NULLIF(p.n_predicted, 0))
                      + (CAST(c.tp AS DOUBLE) / c.n_actual), 0.0)) * 1e9) / 1e9 + 0.0) AS f1
    FROM per_class c LEFT JOIN pred_tot p ON c.lang = p.lang
    """,
)
def nb_classwise_f1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-class precision/recall/F1 of the NB corpus classifier — the
    eval surface a confusion matrix feeds (which classes a model-based
    quality/language gate silently under-recalls before it filters real
    data). All counts exact integers from `nb_classify_confusion`'s
    prediction pipeline; precision/recall are single divisions, F1 the
    fixed 2pr/(p+r) on those two doubles; zero-denominator classes yield
    NULL in both engines."""
    score = _nb_scores(load_table(spark, sf_dir, "documents"))
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("cand"))
    pred = (
        score.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("doc_id", "actual", F.col("cand").alias("predicted"))
    )
    per_class = pred.groupBy(F.col("actual").alias("lang")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_actual"),
        F.sum(F.when(F.col("predicted") == F.col("actual"), 1).otherwise(0))
        .cast("bigint")
        .alias("tp"),
    )
    pred_tot = pred.groupBy(F.col("predicted").alias("lang")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_predicted")
    )
    prec = "CAST(tp AS DOUBLE) / NULLIF(n_predicted, 0)"
    rec = "CAST(tp AS DOUBLE) / n_actual"
    return (
        per_class.join(pred_tot, "lang", "left")
        .select(
            "lang",
            "n_actual",
            F.coalesce("n_predicted", F.lit(0)).alias("n_predicted"),
            "tp",
            F.expr(f"(ROUND(({prec}) * 1e9) / 1e9 + 0.0)").alias("precision_c"),
            F.expr(f"(ROUND(({rec}) * 1e9) / 1e9 + 0.0)").alias("recall_c"),
            F.expr(
                f"(ROUND((2.0 * ({prec}) * ({rec})"
                f" / NULLIF(({prec}) + ({rec}), 0.0)) * 1e9) / 1e9 + 0.0)"
            ).alias("f1"),
        )
    )


@register(
    "eval_confusion_mcc",
    oracle=_NB_SCORE_CTE
    + """,
    pred AS (
        SELECT actual, cand AS predicted
        FROM (SELECT doc_id, actual, cand,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                                        ORDER BY s DESC, cand ASC) AS rn
              FROM score)
        WHERE rn = 1
    ),
    conf AS (
        SELECT actual, predicted, CAST(COUNT(*) AS BIGINT) AS n
        FROM pred GROUP BY actual, predicted
    ),
    t AS (SELECT actual AS k, CAST(SUM(n) AS BIGINT) AS tk FROM conf GROUP BY actual),
    p AS (SELECT predicted AS k, CAST(SUM(n) AS BIGINT) AS pk FROM conf GROUP BY predicted),
    marg AS (
        SELECT COALESCE(t.k, p.k) AS k,
               COALESCE(tk, 0) AS tk, COALESCE(pk, 0) AS pk
        FROM t FULL OUTER JOIN p ON t.k = p.k
    ),
    agg AS (
        SELECT CAST((SELECT SUM(n) FROM conf) AS DOUBLE) AS s,
               CAST((SELECT SUM(n) FROM conf WHERE actual = predicted)
                 AS DOUBLE) AS c,
               CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(pk * tk) AS DOUBLE) AS sum_pt,
               CAST(SUM(pk * pk) AS DOUBLE) AS sum_p2,
               CAST(SUM(tk * tk) AS DOUBLE) AS sum_t2
        FROM marg
    )
    SELECT CAST(s AS BIGINT) AS n_docs, n_classes,
           (ROUND((c / s) * 1e9) / 1e9 + 0.0) AS accuracy,
           (CASE WHEN s * s - sum_p2 <= 0 OR s * s - sum_t2 <= 0 THEN 0.0
                 ELSE (ROUND(((c * s - sum_pt)
                   / (SQRT(s * s - sum_p2) * SQRT(s * s - sum_t2)))
                   * 1e9) / 1e9 + 0.0) END) AS mcc
    FROM agg
    """,
)
def eval_confusion_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiclass Matthews correlation (the R_K statistic) of the Naive
    Bayes language classifier — the single-number confusion summary that,
    unlike accuracy, stays honest under class imbalance (predict-the-
    majority scores MCC ~ 0, not 0.8). From the same exact-arithmetic NB
    argmax as nb_classify_confusion, the whole statistic needs only the
    per-class true/predicted marginals: MCC = (c*s - sum p_k t_k) /
    (sqrt(s^2 - sum p_k^2) * sqrt(s^2 - sum t_k^2)) — every sum is an
    exact integer over |classes| rows, and the final formula is one
    shared float expression (IEEE SQRT) on a single aggregate row.
    Scale: identical to the confusion query (broadcast constant-size
    model, doc-keyed argmax window); the marginal math runs on
    |classes|-row tables."""
    score = _nb_scores(load_table(spark, sf_dir, "documents"))
    from pyspark.sql import Window

    win = Window.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("cand"))
    pred = (
        score.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") == 1)
        .select("actual", F.col("cand").alias("predicted"))
    )
    conf = pred.groupBy("actual", "predicted").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    ).localCheckpoint(eager=False)  # |classes|^2 rows; 4 consumers
    t = conf.groupBy(F.col("actual").alias("k")).agg(
        F.sum("n").cast("bigint").alias("tk")
    )
    p = conf.groupBy(F.col("predicted").alias("k")).agg(
        F.sum("n").cast("bigint").alias("pk")
    )
    marg = (
        t.join(p, "k", "full_outer")
        .select(
            F.coalesce("tk", F.lit(0)).alias("tk"),
            F.coalesce("pk", F.lit(0)).alias("pk"),
        )
    )
    scalars = conf.agg(
        F.sum("n").cast("double").alias("s"),
        F.sum(F.when(F.col("actual") == F.col("predicted"), F.col("n")))
        .cast("double")
        .alias("c"),
    )
    agg = marg.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum(F.col("pk") * F.col("tk")).cast("double").alias("sum_pt"),
        F.sum(F.col("pk") * F.col("pk")).cast("double").alias("sum_p2"),
        F.sum(F.col("tk") * F.col("tk")).cast("double").alias("sum_t2"),
    )
    return scalars.crossJoin(agg).selectExpr(
        "CAST(s AS BIGINT) AS n_docs",
        "n_classes",
        "(ROUND((c / s) * 1e9) / 1e9 + 0.0) AS accuracy",
        # degenerate-marginal guard (MCC = 0 by convention when every
        # prediction or every label is one class; ANSI mode otherwise
        # raises DIVIDE_BY_ZERO — hit live by the 100x scale smoke, where
        # the suffixed 100-copy corpus drives NB to a single class)
        "(CASE WHEN s * s - sum_p2 <= 0 OR s * s - sum_t2 <= 0 THEN 0.0"
        " ELSE (ROUND(((c * s - sum_pt)"
        " / (SQRT(s * s - sum_p2) * SQRT(s * s - sum_t2)))"
        " * 1e9) / 1e9 + 0.0) END) AS mcc",
    )
