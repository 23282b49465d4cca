"""Semantic (embedding-space) DEcontamination — the paraphrase-leak canary.

The lexical contamination family (Bloom n-gram probes, MinHash fuzzy
overlap, exact-substring span reports in llm_dedup.py / llm_corpus.py)
catches verbatim and near-verbatim leaks of eval data into a training
corpus. It is blind to PARAPHRASE leaks: an eval question rewritten in
different words shares no 40-char span and few shingles, but its embedding
sits within a small cosine ball of the original. This module closes that
gap, mirroring how round-11's semantic_dedup_cells closed the dedup
modality ladder (exact -> n-gram -> MinHash -> SimHash -> semantic):

- contamination_semantic_cells  — per-source semantic leak RATE (the
  go/no-go readout, schema-twin of contamination_rate_by_source)
- contamination_semantic_by_cell — per-cell workload + leak breakdown
  (the capacity planner for the cell-bits knob)
- contamination_semantic_nearest — per leaked eval doc, its nearest train
  neighbor (the audit row a human reviews)
- semantic_purge_plan            — the actionable TRAIN-side list: which
  training docs to drop, with blast radius
- contamination_lexical_vs_semantic — per-source agreement between the
  lexical (shared-span) and semantic (cosine) leak flags: semantic-only
  rows are exactly the paraphrase class n-gram methods miss
- semantic_dedup_ivf_cells       — VERDICT r11 task 4: the trained-cell
  swap for semantic dedup (operators/ivf.py::assign_cells replacing the
  sign-LSH cell column) proven end-to-end as an oracled invariant query

Splits and blocking reuse the established machinery so results compose:
the train/eval split is the same md5-bit used by the lexical span family
(llm_dedup._SNAP_BIT — deterministic, source-uncorrelated; doc_id
arithmetic would be constant within a source on this data, TESTDATA.md),
and the cells are the same 6-bit sign-LSH cells as semantic_dedup_cells,
so the two families describe the same corpus partition.

Scale: candidate generation is never all-pairs — train×eval pairs are
blocked per cell and scored through operators.similarity.
embedding_cross_pairs (train side salted, small eval side replicated over
the salt range; one shuffle, left-vs-left pairs never generated). At
100 TB the cell-bits knob bounds in-cell workload exactly as documented
for semantic_dedup_cells (SCALE.md: fixed-bucket pair queries are
workload-quadratic in density; contamination_semantic_by_cell is the
query that SIZES the workload before the join is paid).

Reference c0mm4nd/chainhouse delegates all corpus analytics to its
ClickHouse store (src/schema.rs, SURVEY.md §2.6); the contamination
family has no reference analog — it is the LLM-pipeline extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chainhouse_spark.functions.rounding import round9, round9_sql
from chainhouse_spark.functions.vector import sign_bucket
from chainhouse_spark.operators.similarity import (
    embedding_cross_pairs,
    embedding_near_pairs,
)
from chainhouse_spark.queries.registry import FRUGAL_ORACLE, register
from chainhouse_spark.tables import load_table

DIMS = 64
_CELL_BITS = 6  # same cells as semantic_dedup_cells (llm_similarity.py)
_TAU = 0.3  # semantic leak threshold: cosine(train, eval) >= _TAU

# Spark-side md5 snap bit on vec_id — the embedding-table twin of
# llm_dedup._SNAP_BIT (same function of the same id value, so the lexical
# and semantic eval sets coincide row-for-row).
_SNAP_VEC = (
    "CAST(conv(substr(md5(CAST(vec_id AS STRING)), 1, 1), 16, 10) AS INT) % 2"
)


def _duck_snap(alias: str) -> str:
    return (
        f"(strpos('0123456789abcdef', "
        f"substr(md5(CAST({alias}.vec_id AS VARCHAR)), 1, 1)) - 1) % 2"
    )


def _duck_cell(alias: str) -> str:
    return " + ".join(
        f"(CASE WHEN {alias}.embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
        for i in range(_CELL_BITS)
    )


# DuckDB ordered-fold cosine building blocks for train (t) × eval (e) —
# bit-exact vs the Spark sequential fold (functions/vector.py doc).
_IDX = f"(SELECT UNNEST(range(1, {DIMS + 1})) AS i) i"
_DOT = (
    "SUM(CAST(t.embedding[i.i] AS DOUBLE) * "
    "CAST(e.embedding[i.i] AS DOUBLE) ORDER BY i.i)"
)
_TT = (
    "SUM(CAST(t.embedding[i.i] AS DOUBLE) * "
    "CAST(t.embedding[i.i] AS DOUBLE) ORDER BY i.i)"
)
_EE = (
    "SUM(CAST(e.embedding[i.i] AS DOUBLE) * "
    "CAST(e.embedding[i.i] AS DOUBLE) ORDER BY i.i)"
)
# Unordered twins: constant aggregate state; only for flag-only columns
# where no float reaches the output (threshold margins sit ~13 orders
# above summation-order noise — the llm_similarity.py _DOT_U argument).
_DOT_U = _DOT.replace(" ORDER BY i.i", "")
_TT_U = _TT.replace(" ORDER BY i.i", "")
_EE_U = _EE.replace(" ORDER BY i.i", "")

_COS = f"({_DOT} / (sqrt({_TT}) * sqrt({_EE})))"
_COS_U = f"({_DOT_U} / (sqrt({_TT_U}) * sqrt({_EE_U})))"

# Shared oracle CTE: leaked (train, eval) pairs with the emitted cosine.
_DUCK_LEAK_PAIRS = f"""
    pairs AS (
        SELECT t.vec_id AS train_id, e.vec_id AS eval_id, {_COS} AS cos_sim
        FROM embeddings t, embeddings e, {_IDX}
        WHERE ({_duck_snap('t')}) = 0 AND ({_duck_snap('e')}) = 1
          AND ({_duck_cell('t')}) = ({_duck_cell('e')})
        GROUP BY t.vec_id, e.vec_id
        HAVING {_COS} >= {_TAU}
    )
"""

# Flag-only twin (unordered folds — no float emitted downstream).
_DUCK_LEAKED_EVALS = f"""
    sem AS (
        SELECT DISTINCT e.vec_id AS eval_id
        FROM embeddings t, embeddings e, {_IDX}
        WHERE ({_duck_snap('t')}) = 0 AND ({_duck_snap('e')}) = 1
          AND ({_duck_cell('t')}) = ({_duck_cell('e')})
        GROUP BY t.vec_id, e.vec_id
        HAVING {_COS_U} >= {_TAU}
    )
"""


def _cells_with_snap(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.withColumn(
        "cell", sign_bucket("embedding", _CELL_BITS).cast("int")
    ).withColumn("snap", F.expr(_SNAP_VEC))


def _leak_pairs(cells: DataFrame, threshold: float = _TAU) -> DataFrame:
    """(cell, train_id, eval_id, cos_sim) for in-cell train×eval pairs with
    cosine >= threshold. One (cell, salt) shuffle; eval side replicated."""
    train = cells.filter(F.col("snap") == 0)
    ev = cells.filter(F.col("snap") == 1)
    return embedding_cross_pairs(
        train, ev, block_col="cell", threshold=threshold
    ).select(
        F.col("blk").alias("cell"),
        F.col("left_id").alias("train_id"),
        F.col("right_id").alias("eval_id"),
        "cos_sim",
    )


def _doc_sources(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "documents").select(
        F.col("doc_id").alias("vec_id"), "source"
    )


@register(
    "contamination_semantic_cells",
    oracle=f"""{FRUGAL_ORACLE}
    WITH {_DUCK_LEAKED_EVALS}
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_eval_docs,
           CAST(SUM(CASE WHEN s.eval_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_leaked,
           {round9_sql(
               "CAST(SUM(CASE WHEN s.eval_id IS NULL THEN 0 ELSE 1 END) "
               "AS DOUBLE) / COUNT(*)"
           )} AS leak_rate
    FROM embeddings e
    JOIN documents d ON d.doc_id = e.vec_id
    LEFT JOIN sem s ON s.eval_id = e.vec_id
    WHERE ({_duck_snap('e')}) = 1
    GROUP BY d.source
    """,
)
def contamination_semantic_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source SEMANTIC contamination rate: the fraction of eval-split
    documents whose embedding has cosine >= {0.3} to ANY train-split
    embedding in the same sign-LSH cell — the paraphrase-leak go/no-go
    number, schema-twin of the lexical contamination_rate_by_source so the
    two reports read side by side. Eval docs with no in-cell train
    neighbor at all survive the LEFT join unleaked and count in the
    denominator.

    Plan: one (cell, salt) shuffle generates candidates (train side
    salted, eval side replicated — never train×train), one distinct on
    leaked eval ids, a broadcast-sized join back to eval docs, one
    per-source rollup. At 100 TB the eval set is tiny by construction and
    the cell-bits knob bounds in-cell workload
    (contamination_semantic_by_cell sizes it before this join is paid)."""
    cells = _cells_with_snap(spark, sf_dir)
    leaked = (
        _leak_pairs(cells)
        .select(F.col("eval_id").alias("vec_id"))
        .distinct()
        .withColumn("is_leaked", F.lit(1))
    )
    ev = cells.filter(F.col("snap") == 1).select("vec_id")
    return (
        ev.join(_doc_sources(spark, sf_dir), "vec_id")
        .join(leaked, "vec_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval_docs"),
            F.sum(F.coalesce("is_leaked", F.lit(0)))
            .cast("bigint")
            .alias("n_leaked"),
        )
        .withColumn(
            "leak_rate",
            round9(F.col("n_leaked").cast("double") / F.col("n_eval_docs")),
        )
    )


@register(
    "contamination_semantic_by_cell",
    oracle=f"""{FRUGAL_ORACLE}
    WITH sizes AS (
        SELECT CAST(({_duck_cell('e')}) AS INT) AS cell,
               CAST(SUM(CASE WHEN ({_duck_snap('e')}) = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_train,
               CAST(SUM(CASE WHEN ({_duck_snap('e')}) = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_eval
        FROM embeddings e GROUP BY 1
    ),
    allp AS (
        SELECT CAST(({_duck_cell('t')}) AS INT) AS cell, {_COS} AS cos_sim
        FROM embeddings t, embeddings e, {_IDX}
        WHERE ({_duck_snap('t')}) = 0 AND ({_duck_snap('e')}) = 1
          AND ({_duck_cell('t')}) = ({_duck_cell('e')})
        GROUP BY t.vec_id, e.vec_id, 1
    ),
    ps AS (
        SELECT cell,
               CAST(SUM(CASE WHEN cos_sim >= {_TAU} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_leak_pairs,
               MAX(cos_sim) AS mc
        FROM allp GROUP BY cell
    )
    SELECT s.cell, s.n_train, s.n_eval,
           CAST(s.n_train * s.n_eval AS BIGINT) AS n_pairs,
           COALESCE(ps.n_leak_pairs, CAST(0 AS BIGINT)) AS n_leak_pairs,
           {round9_sql("ps.mc")} AS max_cos
    FROM sizes s LEFT JOIN ps ON ps.cell = s.cell
    """,
)
def contamination_semantic_by_cell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell contamination WORKLOAD + leak breakdown — the capacity
    planner for the cell-bits knob (SCALE.md: fixed-bucket pair queries
    are workload-quadratic in density). n_pairs = n_train × n_eval is
    exactly the candidate fan-out the in-cell join pays, so this <= 64-row
    table is what a 100 TB deployment reads BEFORE running the leak scan:
    if any cell's n_pairs blows the budget, raise the cell bits (the same
    pre-pay discipline as dedup_lsh_band_plan for MinHash banding).
    max_cos spans ALL scored pairs (not just leaks) — the
    nearest-miss-per-cell signal; NULL where a cell has no cross pairs
    (documented nullable: a diagnostic table, not a go/no-go row).

    Plan: one aggregate over the corpus for cell sizes, the same one
    (cell, salt) shuffle as contamination_semantic_cells (unthresholded),
    one per-cell aggregate, one <=64-row broadcast-ish join."""
    cells = _cells_with_snap(spark, sf_dir)
    sizes = cells.groupBy("cell").agg(
        F.sum(F.when(F.col("snap") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_train"),
        F.sum(F.when(F.col("snap") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_eval"),
    )
    # threshold=-2.0 keeps every scored pair: max_cos reports the nearest
    # miss, and the leak count thresholds inside the aggregate instead.
    ps = (
        _leak_pairs(cells, threshold=-2.0)
        .groupBy("cell")
        .agg(
            F.sum(F.when(F.col("cos_sim") >= _TAU, 1).otherwise(0))
            .cast("bigint")
            .alias("_leaks"),
            F.max("cos_sim").alias("_mc"),
        )
    )
    return (
        sizes.join(ps, "cell", "left")
        .select(
            "cell",
            "n_train",
            "n_eval",
            (F.col("n_train") * F.col("n_eval")).cast("bigint").alias("n_pairs"),
            F.coalesce("_leaks", F.lit(0)).cast("bigint").alias("n_leak_pairs"),
            round9("_mc").alias("max_cos"),
        )
    )


@register(
    "contamination_semantic_nearest",
    oracle=f"""{FRUGAL_ORACLE}
    WITH {_DUCK_LEAK_PAIRS},
    ranked AS (
        SELECT eval_id, train_id, cos_sim,
               ROW_NUMBER() OVER (
                   PARTITION BY eval_id
                   ORDER BY cos_sim DESC, train_id ASC
               ) AS rk
        FROM pairs
    )
    SELECT r.eval_id, r.train_id,
           {round9_sql("r.cos_sim")} AS cos_sim, d.source
    FROM ranked r JOIN documents d ON d.doc_id = r.eval_id
    WHERE r.rk = 1
    """,
)
def contamination_semantic_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per LEAKED eval doc, its nearest train-split neighbor (highest
    in-cell cosine >= {0.3}; ties break on the lowest train id) with the
    eval doc's source — the audit row a human reviews to decide whether a
    flagged leak is a true paraphrase or embedding-space coincidence.

    Plan: the shared leak-pair shuffle, one window rank partitioned by
    eval id (output bounded by the eval set), one join to documents for
    the source label."""
    w = Window.partitionBy("eval_id").orderBy(
        F.desc("cos_sim"), F.asc("train_id")
    )
    top = (
        _leak_pairs(_cells_with_snap(spark, sf_dir))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
    )
    return top.join(
        _doc_sources(spark, sf_dir),
        top.eval_id == F.col("vec_id"),
    ).select("eval_id", "train_id", round9("cos_sim").alias("cos_sim"), "source")


@register(
    "semantic_purge_plan",
    oracle=f"""{FRUGAL_ORACLE}
    WITH {_DUCK_LEAK_PAIRS}
    SELECT p.train_id, d.source,
           CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
           {round9_sql("MAX(p.cos_sim)")} AS max_cos
    FROM pairs p JOIN documents d ON d.doc_id = p.train_id
    GROUP BY p.train_id, d.source
    """,
)
def semantic_purge_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable TRAIN-side decontamination list: every training doc
    whose embedding sits within cosine {0.3} of >= 1 eval-split embedding
    (in-cell), with its blast radius (how many eval docs it contaminates)
    and worst-case similarity — the rows a decontamination pass DROPS,
    where contamination_semantic_cells only reports the eval-side rate.

    Plan: the shared leak-pair shuffle, one per-train-id aggregate
    (bounded by the train docs actually implicated, not the corpus), one
    join to documents for the source label."""
    pairs = _leak_pairs(_cells_with_snap(spark, sf_dir))
    plan = pairs.groupBy("train_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval_hits"),
        F.max("cos_sim").alias("_mc"),
    )
    return plan.join(
        _doc_sources(spark, sf_dir),
        plan.train_id == F.col("vec_id"),
    ).select(
        "train_id",
        "source",
        "n_eval_hits",
        round9("_mc").alias("max_cos"),
    )


# Flag-only purge set (unordered folds — no float emitted downstream):
# the train-side dual of _DUCK_LEAKED_EVALS.
_DUCK_PURGED_TRAINS = f"""
    purge AS (
        SELECT DISTINCT t.vec_id AS doc_id
        FROM embeddings t, embeddings e, {_IDX}
        WHERE ({_duck_snap('t')}) = 0 AND ({_duck_snap('e')}) = 1
          AND ({_duck_cell('t')}) = ({_duck_cell('e')})
        GROUP BY t.vec_id, e.vec_id
        HAVING {_COS_U} >= {_TAU}
    )
"""


@register(
    "semantic_decontaminate_manifest",
    oracle=f"""{FRUGAL_ORACLE}
    WITH {_DUCK_PURGED_TRAINS},
    base AS (
        SELECT doc_id, source, n_chars FROM documents d
        WHERE (strpos('0123456789abcdef',
                      substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1) % 2
              = 0
    ),
    flags AS (
        SELECT b.source, b.doc_id, b.n_chars,
               CASE WHEN p.doc_id IS NULL THEN 0 ELSE 1 END AS purged
        FROM base b LEFT JOIN purge p ON p.doc_id = b.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs_in,
           CAST(SUM(purged) AS BIGINT) AS n_purged,
           CAST(COUNT(*) - SUM(purged) AS BIGINT) AS n_docs_out,
           CAST(SUM(CASE WHEN purged = 0 THEN n_chars ELSE 0 END) AS BIGINT)
               AS n_chars_out,
           md5(COALESCE(string_agg(CAST(doc_id AS VARCHAR), ','
                                   ORDER BY doc_id)
                            FILTER (WHERE purged = 0), '')) AS checksum
    FROM flags GROUP BY source
    """,
)
def semantic_decontaminate_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination APPLIED: the per-source manifest of the
    training corpus AFTER dropping semantic_purge_plan's targets — doc
    counts in/purged/out, surviving characters, and an id checksum (md5 of
    the sorted surviving ids, the pipeline_training_ready totality trick:
    moving ONE document across the purge boundary changes a per-source
    md5, so the oracle gate certifies the exact surviving SET, not just
    its size). Train docs WITHOUT an embedding pass through unpurged —
    the semantic gate is not applicable to them and a production run
    would route them to embedding backfill rather than silently drop
    them (at sf0.1 the embeddings table covers 2/5 of documents, so this
    path is exercised, not theoretical).

    Plan: the shared cell-blocked pair shuffle reduced to a distinct
    purge-id set (purge-sized), one id-equi LEFT join onto the train-doc
    spine, one per-source rollup with a collect_list bounded by surviving
    docs per source. At 100 TB the checksum column would shard (md5 per
    id-range bucket) — the per-source list is the only output-bounded-
    by-corpus column here, and it exists to make the gate total."""
    d = load_table(spark, sf_dir, "documents")
    base = d.filter(
        F.expr(_SNAP_VEC.replace("vec_id", "doc_id")) == 0
    ).select("doc_id", "source", "n_chars")
    purge = (
        _leak_pairs(_cells_with_snap(spark, sf_dir))
        .select(F.col("train_id").alias("doc_id"))
        .distinct()
        .withColumn("purged", F.lit(1))
    )
    flags = base.join(purge, "doc_id", "left").select(
        "source",
        "doc_id",
        "n_chars",
        F.coalesce("purged", F.lit(0)).alias("purged"),
    )
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs_in"),
        F.sum("purged").cast("bigint").alias("n_purged"),
        (F.count(F.lit(1)) - F.sum("purged")).cast("bigint").alias("n_docs_out"),
        F.sum(F.when(F.col("purged") == 0, F.col("n_chars")).otherwise(0))
        .cast("bigint")
        .alias("n_chars_out"),
        F.md5(
            F.expr(
                "concat_ws(',', transform(array_sort("
                "collect_list(CASE WHEN purged = 0 THEN doc_id END)), "
                "x -> CAST(x AS STRING)))"
            )
        ).alias("checksum"),
    )


_SWEEP_TAUS = [0.2, 0.25, 0.3, 0.35, 0.4, 0.5]
_DUCK_TAUS = "taus(tau_id, tau) AS (VALUES " + ", ".join(
    f"({i}, {t})" for i, t in enumerate(_SWEEP_TAUS)
) + ")"


@register(
    "contamination_semantic_tau_sweep",
    oracle=f"""{FRUGAL_ORACLE}
    WITH allp AS (
        SELECT t.vec_id AS train_id, e.vec_id AS eval_id, {_COS_U} AS c
        FROM embeddings t, embeddings e, {_IDX}
        WHERE ({_duck_snap('t')}) = 0 AND ({_duck_snap('e')}) = 1
          AND ({_duck_cell('t')}) = ({_duck_cell('e')})
        GROUP BY t.vec_id, e.vec_id
    ),
    per_eval AS (SELECT eval_id, MAX(c) AS mc FROM allp GROUP BY eval_id),
    per_train AS (SELECT train_id, MAX(c) AS mc FROM allp GROUP BY train_id),
    {_DUCK_TAUS},
    tot AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings e
        WHERE ({_duck_snap('e')}) = 1
    )
    SELECT (ROUND((t.tau) * 1e9) / 1e9 + 0.0) AS tau,
           CAST((SELECT COUNT(*) FROM per_eval pe WHERE pe.mc >= t.tau)
                AS BIGINT) AS n_eval_leaked,
           CASE WHEN tot.n = 0 THEN 0.0 ELSE {round9_sql(
               "CAST((SELECT COUNT(*) FROM per_eval pe WHERE pe.mc >= t.tau)"
               " AS DOUBLE) / tot.n"
           )} END AS eval_leak_rate,
           CAST((SELECT COUNT(*) FROM per_train pt WHERE pt.mc >= t.tau)
                AS BIGINT) AS n_train_purged
    FROM taus t, tot
    """,
)
def contamination_semantic_tau_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold PLANNER for the semantic contamination family: the eval
    leak count/rate and the train purge count at six candidate tau
    cutoffs, answered from ONE pass over the cell-blocked pair relation —
    the expensive join is paid once, reduced to per-id MAX cosines
    (corpus-sized, never pair-sized), and the six thresholds are answered
    off those maxima (the semantic_dedup_threshold_sweep discipline). The
    readout that picks _TAU before a 100 TB decontamination run commits
    to purging training data: scan for the knee where the purge count
    stops buying leak-rate reduction.

    Totality: taus where nothing crosses emit 0 (LEFT join onto the
    integer tau_id spine — never a float join key, never a missing row).
    """
    cells = _cells_with_snap(spark, sf_dir)
    pairs = _leak_pairs(cells, threshold=-2.0)
    per_eval = pairs.groupBy("eval_id").agg(F.max("cos_sim").alias("mc"))
    per_train = pairs.groupBy("train_id").agg(F.max("cos_sim").alias("mc"))
    spine = spark.range(1).select(
        F.posexplode(F.array(*[F.lit(t) for t in _SWEEP_TAUS])).alias(
            "tau_id", "tau"
        )
    )
    n_eval = (
        spine.crossJoin(per_eval)
        .filter(F.col("mc") >= F.col("tau"))
        .groupBy("tau_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_eval_leaked"))
    )
    n_train = (
        spine.crossJoin(per_train)
        .filter(F.col("mc") >= F.col("tau"))
        .groupBy("tau_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_train_purged"))
    )
    tot = cells.filter(F.col("snap") == 1).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_ev")
    )
    return (
        spine.join(n_eval, "tau_id", "left")
        .join(n_train, "tau_id", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            round9("tau").alias("tau"),
            F.coalesce("n_eval_leaked", F.lit(0))
            .cast("bigint")
            .alias("n_eval_leaked"),
            F.when(F.col("n_ev") == 0, F.lit(0.0))
            .otherwise(
                round9(
                    F.coalesce("n_eval_leaked", F.lit(0)).cast("double")
                    / F.col("n_ev")
                )
            )
            .alias("eval_leak_rate"),
            F.coalesce("n_train_purged", F.lit(0))
            .cast("bigint")
            .alias("n_train_purged"),
        )
    )


@register(
    "stream_semantic_decontaminate",
    oracle=f"""{FRUGAL_ORACLE}
    WITH {_DUCK_LEAK_PAIRS}
    SELECT p.train_id, d.source,
           CAST(COUNT(*) AS BIGINT) AS n_eval_hits,
           {round9_sql("MAX(p.cos_sim)")} AS max_cos
    FROM pairs p JOIN documents d ON d.doc_id = p.train_id
    GROUP BY p.train_id, d.source
    """,
)
def stream_semantic_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic decontamination RUNNING ON THE STREAM — the resident-ingest
    twin of semantic_purge_plan, the way stream_decontaminate_bloom twins
    the batch Bloom probe: newly crawled training embeddings arrive as a
    file-source stream, the (small, fixed) eval split is a STATIC broadcast
    joined on the sign-LSH cell (stateless stream-static equi-join — each
    arriving vector only ever scores against its own cell's eval vectors),
    the cosine filter runs map-side, and the ONE streaming aggregation
    (complete mode) keeps per-train-id hit count + max cosine. State is
    purge-plan-sized (one row per IMPLICATED training doc), never
    corpus-sized — the answer-sized-state discipline SCALE.md r10
    established. MAX and COUNT are order-insensitive over bit-exact
    per-pair cosines, so micro-batch boundaries cannot shift a value and
    the batch oracle (identical to semantic_purge_plan's) hash-checks the
    streaming engine itself. The source join runs as a batch rollup of
    the final state, not a second streaming aggregation.

    At 100 TB: the eval broadcast is |eval| x (dim+2) doubles regardless
    of corpus size, per-micro-batch work is map-only after the broadcast
    join, and a production deployment would evict never-hit state with a
    watermark over ingest time (unbounded here because the oracle needs
    whole-corpus semantics — same note as the streaming dedup family)."""
    from chainhouse_spark.queries.streaming_queries import (  # noqa: PLC0415
        _run_to_table,
        _stream_source,
    )

    from chainhouse_spark.functions.vector import (  # noqa: PLC0415
        cosine_prenorm_sql,
        norm_sql,
    )

    # Norms once per row on each side, not per pair (bit-identical —
    # functions/vector.py::cosine_prenorm_sql).
    ev_static = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .filter(F.expr(_SNAP_VEC) == 1)
        .select(
            sign_bucket("embedding", _CELL_BITS).cast("int").alias("cell"),
            F.col("vec_id").alias("eval_id"),
            F.col("embedding").alias("e_vec"),
            F.expr(norm_sql("embedding")).alias("en"),
        )
    )
    train = (
        _stream_source(spark, sf_dir, "embeddings")
        .filter(F.expr(_SNAP_VEC) == 0)
        .select(
            sign_bucket("embedding", _CELL_BITS).cast("int").alias("cell"),
            F.col("vec_id").alias("train_id"),
            F.col("embedding").alias("t_vec"),
            F.expr(norm_sql("embedding")).alias("tn"),
        )
    )
    # Round-12 W12: tau threshold via explode(filter(array(cos), ...)) —
    # the .filter() form pulled the cosine into the stream-static join
    # condition with a second copy in the Project, and its
    # null-intolerant division made the optimizer infer isnotnull(<norm
    # fold>) below both side projections (2 norm folds per row). Generate
    # is stateless, so the streaming plan is unchanged otherwise. See
    # operators/similarity.py::embedding_near_pairs.
    cos = cosine_prenorm_sql("t_vec", "e_vec", "tn", "en")
    state = (
        train.join(F.broadcast(ev_static), "cell")
        .select(
            "train_id",
            F.explode(
                F.expr(
                    f"filter(array({cos}), c -> c >= CAST({_TAU!r} AS DOUBLE))"
                )
            ).alias("cos_sim"),
        )
        .groupBy("train_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval_hits"),
            F.max("cos_sim").alias("_mc"),
        )
    )
    sink = _run_to_table(state, "complete")
    return sink.join(
        _doc_sources(spark, sf_dir),
        sink.train_id == F.col("vec_id"),
    ).select(
        "train_id",
        "source",
        "n_eval_hits",
        round9("_mc").alias("max_cos"),
    )


def _lex_vs_sem_oracle() -> str:
    # Imported lazily at module import time (llm_dedup registers first in
    # queries/__init__, so its constants are final).
    from chainhouse_spark.queries.llm_dedup import (
        _DUCK_SPAN_RUNS,
        _LEAK_MIN_SPAN,
        _SPAN_LEN,
        _SPAN_STRIDE,
    )

    return f"""{FRUGAL_ORACLE}
    WITH {_DUCK_SPAN_RUNS},
    best AS (
        SELECT doc_b, MAX({_SPAN_LEN} + (r - 1) * {_SPAN_STRIDE}) AS s
        FROM runs GROUP BY doc_b
    ),
    lex AS (SELECT doc_b AS eval_id FROM best WHERE s >= {_LEAK_MIN_SPAN}),
    {_DUCK_LEAKED_EVALS.strip().rstrip()},
    flags AS (
        SELECT d.source,
               CASE WHEN l.eval_id IS NULL THEN 0 ELSE 1 END AS is_lex,
               CASE WHEN s.eval_id IS NULL THEN 0 ELSE 1 END AS is_sem
        FROM embeddings e
        JOIN documents d ON d.doc_id = e.vec_id
        LEFT JOIN lex l ON l.eval_id = e.vec_id
        LEFT JOIN sem s ON s.eval_id = e.vec_id
        WHERE ({_duck_snap('e')}) = 1
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_eval_docs,
           CAST(SUM(is_lex) AS BIGINT) AS n_lexical,
           CAST(SUM(is_sem) AS BIGINT) AS n_semantic,
           CAST(SUM(is_lex * is_sem) AS BIGINT) AS n_both,
           CAST(SUM(is_sem * (1 - is_lex)) AS BIGINT) AS n_semantic_only,
           CAST(SUM(is_lex * (1 - is_sem)) AS BIGINT) AS n_lexical_only,
           CASE WHEN SUM(is_lex) + SUM(is_sem) - SUM(is_lex * is_sem) = 0
                THEN 0.0 ELSE
               {round9_sql(
                   "CAST(SUM(is_lex * is_sem) AS DOUBLE) / "
                   "(SUM(is_lex) + SUM(is_sem) - SUM(is_lex * is_sem))"
               )} END AS flag_jaccard
    FROM flags GROUP BY source
    """


@register("contamination_lexical_vs_semantic", oracle=_lex_vs_sem_oracle())
def contamination_lexical_vs_semantic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-source agreement between the LEXICAL leak flag (an exactly
    shared cross-split span >= 60 chars, the contamination_rate_by_source
    criterion) and the SEMANTIC leak flag (in-cell cosine >= {0.3}) on the
    same md5-bit eval split, restricted to eval docs that have an
    embedding so both flags are defined. n_semantic_only is the payoff
    column: the paraphrase-leak class lexical methods miss;
    n_lexical_only is the dual (verbatim overlap whose embedding drifted
    — short spans in long documents). flag_jaccard is guarded to 0.0 when
    both flag sets are empty (the dedup_modality_overlap totality lesson,
    ADVICE r11 — a go/no-go row never carries a NULL cell).

    Plan: the lexical side reuses the span-anchor pipeline (shingle
    equi-join + diagonal islands, smoked at 10x/100x since round 10); the
    semantic side the shared cell-blocked pair shuffle; the two flag sets
    are eval-set-sized broadcast joins onto the eval spine, then one
    per-source rollup."""
    from chainhouse_spark.queries.llm_dedup import _LEAK_MIN_SPAN  # noqa: PLC0415
    from chainhouse_spark.queries.llm_dedup import (  # noqa: PLC0415
        _SPAN_LEN,
        _SPAN_STRIDE,
        _span_runs,
    )

    d = load_table(spark, sf_dir, "documents")
    runs = _span_runs(d)
    span = F.lit(_SPAN_LEN) + (F.col("r") - 1) * F.lit(_SPAN_STRIDE)
    lex = (
        runs.groupBy("doc_b")
        .agg(F.max(span).alias("s"))
        .filter(F.col("s") >= _LEAK_MIN_SPAN)
        .select(F.col("doc_b").alias("vec_id"))
        .withColumn("is_lex", F.lit(1))
    )
    cells = _cells_with_snap(spark, sf_dir)
    sem = (
        _leak_pairs(cells)
        .select(F.col("eval_id").alias("vec_id"))
        .distinct()
        .withColumn("is_sem", F.lit(1))
    )
    flags = (
        cells.filter(F.col("snap") == 1)
        .select("vec_id")
        .join(_doc_sources(spark, sf_dir), "vec_id")
        .join(lex, "vec_id", "left")
        .join(sem, "vec_id", "left")
        .select(
            "source",
            F.coalesce("is_lex", F.lit(0)).alias("is_lex"),
            F.coalesce("is_sem", F.lit(0)).alias("is_sem"),
        )
    )
    union = (
        F.sum("is_lex") + F.sum("is_sem") - F.sum(F.col("is_lex") * F.col("is_sem"))
    )
    return flags.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_eval_docs"),
        F.sum("is_lex").cast("bigint").alias("n_lexical"),
        F.sum("is_sem").cast("bigint").alias("n_semantic"),
        F.sum(F.col("is_lex") * F.col("is_sem")).cast("bigint").alias("n_both"),
        F.sum(F.col("is_sem") * (1 - F.col("is_lex")))
        .cast("bigint")
        .alias("n_semantic_only"),
        F.sum(F.col("is_lex") * (1 - F.col("is_sem")))
        .cast("bigint")
        .alias("n_lexical_only"),
        F.when(union == 0, F.lit(0.0))
        .otherwise(
            round9(
                F.sum(F.col("is_lex") * F.col("is_sem")).cast("double") / union
            )
        )
        .alias("flag_jaccard"),
    )


_IVF_TAU = 0.2  # same dedup threshold as semantic_dedup_cells


@register(
    "semantic_dedup_ivf_cells",
    oracle="""
    SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_vecs,
           TRUE AS totals_ok, TRUE AS dropped_valid, TRUE AS nontrivial_ok
    FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
    GROUP BY d.source
    """,
)
def semantic_dedup_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The TRAINED-cell swap for semantic dedup (VERDICT r11 task 4):
    semantic_dedup_cells' report pipeline with the sign-LSH cell column
    replaced by k-means cells from operators/ivf.py::assign_cells
    (n_cells=16, 4 Lloyd iterations, deterministic hash-order init) —
    proving the docstring claim that the pipeline is cell-source-agnostic
    end-to-end: cell-blocked candidate generation (embedding_near_pairs),
    diameter-independent large-star/small-star components, min-id
    canonicals, per-source rollup.

    Iterative k-means is not SQL-expressible, and centroid means cross
    float summation order (partial-aggregate partitioning), so exact
    kept/dropped counts can wobble by a cell-boundary vector between runs
    — the oracled surface is therefore the invariant summary (the
    ann_ivf_topk idiom): exact per-source corpus counts plus three bools
    the Spark side VERIFIES against the actual pipeline output:
    totals_ok (kept + dropped == n_vecs per source), dropped_valid (every
    dropped vec participates in >= 1 within-cell pair with cosine >=
    {0.2} — candidate generation really was cell-blocked), nontrivial_ok
    (the trained cells produced >= 1 drop corpus-wide — guards against a
    silent empty-pair regression, e.g. a cell-assignment collapse).
    tests/test_round12_queries.py pins the stronger cross-variant
    invariants at fixed scale (dropped ⊆ docs with a GLOBAL cosine
    neighbor; report schema identical to semantic_dedup_cells).

    Scale: identical to semantic_dedup_cells — one (cell, salt) pair
    shuffle, O(log^2 n) component rounds, id-equi join back. The k-means
    fit itself is 4 bounded driver jobs (n_cells x dim rows collected per
    iteration, nothing corpus-sized; operators/ivf.py docstring) and at
    100 TB would fit on a sample. Trained cells track embedding density,
    so in-cell workload is balanced by construction where sign-LSH cells
    can be arbitrarily skewed — the production answer to the cell-bits
    knob documented in SCALE.md."""
    from chainhouse_spark.operators.components import (  # noqa: PLC0415
        connected_components_star,
    )
    from chainhouse_spark.operators.ivf import assign_cells  # noqa: PLC0415

    emb = load_table(spark, sf_dir, "embeddings")
    assigned, _ = assign_cells(emb, n_cells=16, n_iter=4)
    pairs = embedding_near_pairs(
        assigned, block_col="cell", threshold=_IVF_TAU
    ).select("vec_a", "vec_b")
    clusters = connected_components_star(pairs, src="vec_a", dst="vec_b")
    dropped = clusters.filter(F.col("node") != F.col("cluster_id")).select(
        F.col("node").alias("vec_id"), F.lit(1).alias("is_dropped")
    )
    report = (
        emb.select("vec_id")
        .join(_doc_sources(spark, sf_dir), "vec_id")
        .join(dropped, "vec_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs"),
            F.sum(F.when(F.col("is_dropped").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.coalesce(F.col("is_dropped"), F.lit(0)))
            .cast("bigint")
            .alias("n_dropped"),
        )
    )
    # Invariant bools, computed against the actual pipeline output (not
    # constants): pair participants for dropped_valid, global drop count
    # for nontrivial_ok.
    participants = (
        pairs.select(F.col("vec_a").alias("vec_id"))
        .union(pairs.select(F.col("vec_b").alias("vec_id")))
        .distinct()
    )
    invalid = dropped.join(participants, "vec_id", "left_anti")
    checks = invalid.agg(
        (F.count(F.lit(1)) == 0).alias("dropped_valid")
    ).crossJoin(
        dropped.agg((F.count(F.lit(1)) >= 1).alias("nontrivial_ok"))
    )
    return report.crossJoin(F.broadcast(checks)).select(
        "source",
        "n_vecs",
        (F.col("n_kept") + F.col("n_dropped") == F.col("n_vecs")).alias(
            "totals_ok"
        ),
        "dropped_valid",
        "nontrivial_ok",
    )
