"""BPE tokenizer-training queries (operators/bpe.py) with unrolled
DuckDB replay oracles.

The oracle re-implements the full iterative trainer as an UNROLLED CTE
chain — one (pair-count -> argmax -> merge-apply) block per round, the
same leftmost-non-overlapping `replace` fold Spark runs — so DuckDB
independently reproduces every learned merge and the encoded symbol
counts, not just final aggregates. Ties break (count DESC, pair ASC) on
exact integers in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from chainhouse_spark.operators.bpe import bpe_encode_stats, bpe_train
from chainhouse_spark.functions.rounding import round9
from chainhouse_spark.queries.registry import FRUGAL_ORACLE, register
from chainhouse_spark.tables import load_table

N_MERGES = 5

_W0 = """
    w0 AS (
        SELECT word, CAST(COUNT(*) AS BIGINT) AS wcnt,
               ' ' || array_to_string(
                   list_transform(range(1, len(word) + 1),
                                  i -> substr(word, i, 1)), ' ') || ' '
                 AS repr
        FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        WHERE word <> ''
        GROUP BY word
    )
"""


def _round_ctes(k: int) -> str:
    """CTE block for merge round k: pair counts over w{k-1}, the argmax
    b{k}, and the merged word table w{k}."""
    return f"""
    p{k} AS (
        SELECT t.toks[i.i] || ' ' || t.toks[i.i + 1] AS pair,
               CAST(SUM(t.wcnt) AS BIGINT) AS cnt
        FROM (SELECT wcnt, string_split(trim(repr), ' ') AS toks
              FROM w{k - 1}) t,
             LATERAL (SELECT UNNEST(range(1, len(t.toks))) AS i) i
        GROUP BY 1
    ),
    b{k} AS (
        SELECT pair, replace(pair, ' ', '') AS merged, cnt
        FROM p{k} ORDER BY cnt DESC, pair ASC LIMIT 1
    ),
    w{k} AS (
        SELECT w.word, w.wcnt,
               replace(w.repr, ' ' || b.pair || ' ',
                       ' ' || b.merged || ' ') AS repr
        FROM w{k - 1} w, b{k} b
    )"""


def _train_oracle(n: int) -> str:
    ctes = _W0 + "," + ",".join(_round_ctes(k) for k in range(1, n + 1))
    union = "\n    UNION ALL ".join(
        f"SELECT {k} AS rank, pair, merged, cnt FROM b{k}"
        for k in range(1, n + 1)
    )
    return f"{FRUGAL_ORACLE}    WITH {ctes}\n    {union}\n    ORDER BY rank"


def _encode_oracle(n: int) -> str:
    ctes = _W0 + "," + ",".join(_round_ctes(k) for k in range(1, n + 1))
    # per-(doc, word) reprs re-merged under the learned table b1..bn
    apply_chain = ["""
    dr0 AS (
        SELECT doc_id, word,
               ' ' || array_to_string(
                   list_transform(range(1, len(word) + 1),
                                  i -> substr(word, i, 1)), ' ') || ' '
                 AS repr
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
              FROM documents)
        WHERE word <> ''
    )"""]
    for k in range(1, n + 1):
        apply_chain.append(f"""
    dr{k} AS (
        SELECT d.doc_id, d.word,
               replace(d.repr, ' ' || b.pair || ' ',
                       ' ' || b.merged || ' ') AS repr
        FROM dr{k - 1} d, b{k} b
    )""")
    return f"""{FRUGAL_ORACLE}    WITH {ctes},{",".join(apply_chain)},
    enc AS (
        SELECT doc_id, word,
               len(string_split(trim(repr), ' ')) AS n_sym
        FROM dr{n}
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(len(word)) AS BIGINT) AS n_chars,
           CAST(SUM(n_sym) AS BIGINT) AS n_symbols,
           (ROUND((CAST(SUM(len(word)) AS DOUBLE) / CAST(SUM(n_sym) AS DOUBLE)
             ) * 1e9) / 1e9 + 0.0) AS compression
    FROM enc GROUP BY doc_id
    """


@register("bpe_train_merges", oracle=_train_oracle(N_MERGES))
def bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first 5 BPE merges over the document corpus. Each round
    is one bounded pair-count shuffle over the DISTINCT-WORD frequency
    table (weighted; |vocab| rows, not |corpus|) plus a 1-row argmax
    collect — the iterative-trainer shape (kmeans precedent). At 100 TB
    the word table is the only large state and the pair key space is
    bounded by the symbol vocabulary."""
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=N_MERGES)
    return spark.createDataFrame(
        [(r, p, m, c) for r, p, m, c in merges],
        "rank int, pair string, merged string, cnt bigint",
    ).orderBy("rank")


@register("bpe_encode_compression", oracle=_encode_oracle(N_MERGES))
def bpe_encode_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encode every document under the learned 5-merge table and report
    per-doc symbol counts + chars/symbols compression. Tokenize + merge
    application are map-only (the merge table folds into the plan as
    literals — the broadcast-tokenizer shape); the one shuffle is the
    per-doc aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    merges = bpe_train(docs, n_merges=N_MERGES)
    return bpe_encode_stats(docs, merges).withColumn(
        "compression", round9("compression")
    )
