"""Deduplication queries over the documents table — the training-data
pipeline surface (exact, normalized-exact, MinHash-LSH, exact n-gram
Jaccard, SimHash). Every stage is md5-based and therefore fully
DuckDB-oracle-able, including MinHash (lexicographic minima of md5 hex
strings reproduce exactly across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from chainhouse_spark.operators.dedup import (
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
    simhash_near_pairs,
)
from chainhouse_spark.functions.rounding import round9, round9_sql
from chainhouse_spark.queries.registry import FRUGAL_ORACLE, register
from chainhouse_spark.tables import load_table

# Shared DuckDB CTEs: distinct 3-word shingles per doc.
_DUCK_SHINGLES = """
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM tok, LATERAL (SELECT UNNEST(range(1, GREATEST(len(t) - 1, 1))) AS i) ii
    )
"""


def _duck_hex8(expr: str, start: int) -> str:
    """DuckDB SQL: 8 lowercase hex chars of `expr` starting at 1-based
    `start` -> BIGINT (strpos fold — the conv()-less mirror of Spark's
    conv(substring(m, start, 8), 16, 10))."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr({expr}, {start + i}, 1)) - 1)"
            f" * {16 ** (7 - i)}"
            for i in range(8)
        )
        + ")"
    )


# MinHash Carter-Wegman family over md5(shingle) — mirrors
# operators/dedup.py::minhash_signatures exactly: hash_i = (h1 + i*h2) % p.
_DUCK_MINHASH = f"""
    hh AS (
        SELECT doc_id,
               {_duck_hex8("md5(shingle)", 1)} AS h1,
               {_duck_hex8("md5(shingle)", 9)} AS h2
        FROM sh
    ),
    mh AS (
        SELECT doc_id, s.s AS s, MIN((h1 + s.s * h2) % 4294967291) AS h
        FROM hh, (SELECT UNNEST(range(0, 16)) AS s) s
        GROUP BY doc_id, s.s
    )
"""


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS content_key, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"))


@register(
    "dedup_exact_normalized",
    oracle="""
    SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS content_key,
           MIN(doc_id) AS canonical_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    return exact_dedup(load_table(spark, sf_dir, "documents"), normalized=True)


@register(
    "dedup_minhash_lsh",
    oracle="""
    WITH
    """ + _DUCK_SHINGLES + """,
    """ + _DUCK_MINHASH + """,
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
           CAST(SUM(CASE WHEN ma.h = mb.h THEN 1 ELSE 0 END) AS DOUBLE) / 16 AS est_jaccard
    FROM cand c
    JOIN mh ma ON ma.doc_id = c.doc_a
    JOIN mh mb ON mb.doc_id = c.doc_b AND mb.s = ma.s
    GROUP BY c.doc_a, c.doc_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash(16) + LSH(4 bands × 4 rows) candidate pairs with estimated
    Jaccard. The scale path for near-dedup: no all-pairs comparison."""
    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, num_hashes=16, shingle_words=3)
    return lsh_candidate_pairs(sigs, num_hashes=16, bands=4)


@register(
    "dedup_ngram_jaccard",
    oracle="""
    WITH
    """ + _DUCK_SHINGLES + """,
    sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT doc_a, doc_b,
           (ROUND((CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)) * 1e9) / 1e9 + 0.0) AS jaccard
    FROM common
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.8
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard ≥ 0.8 near-dup pairs (the verifier stage after LSH)."""
    return ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), shingle_words=3, threshold=0.8
    ).withColumn("jaccard", round9("jaccard"))


@register(
    "dedup_simhash",
    oracle="""
    WITH tok AS (
        SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    ),
    h AS (SELECT doc_id, md5(tok) AS h FROM tok),
    bits AS (
        SELECT doc_id, j.j AS j,
               CASE WHEN ((instr('0123456789abcdef', substr(h, (j.j // 4) + 1, 1)) - 1)
                          >> (j.j % 4)) & 1 = 1 THEN 1 ELSE -1 END AS vote
        FROM h, (SELECT UNNEST(range(0, 32)) AS j) j
    ),
    s AS (SELECT doc_id, j, SUM(vote) AS s FROM bits GROUP BY doc_id, j)
    SELECT doc_id,
           CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash
    FROM s GROUP BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 32-bit SimHash sketch."""
    return simhash(load_table(spark, sf_dir, "documents"), nbits=32)


@register(
    "dedup_simhash_pairs",
    oracle="""
    WITH tok AS (
        SELECT doc_id, UNNEST(list_distinct(string_split(text, ' '))) AS tok
        FROM documents
    ),
    h AS (SELECT doc_id, md5(tok) AS h FROM tok),
    bits AS (
        SELECT doc_id, j.j AS j,
               CASE WHEN ((instr('0123456789abcdef', substr(h, (j.j // 4) + 1, 1)) - 1)
                          >> (j.j % 4)) & 1 = 1 THEN 1 ELSE -1 END AS vote
        FROM h, (SELECT UNNEST(range(0, 32)) AS j) j
    ),
    s AS (SELECT doc_id, j, SUM(vote) AS s FROM bits GROUP BY doc_id, j),
    sk AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << j ELSE 0 END) AS BIGINT) AS simhash
        FROM s GROUP BY doc_id
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
    FROM sk a JOIN sk b ON a.doc_id < b.doc_id
    WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
    """,
)
def dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs at Hamming ≤ 2 over the SimHash sketch, byte-banded.

    (≤ 2, not the usual ≤ 6: this synthetic corpus shares one small
    vocabulary, so sketches cluster tightly and a loose threshold matches
    nearly all pairs.)

    The Spark side only compares pairs sharing ≥1 of 4 byte-bands; by
    pigeonhole that candidate set is COMPLETE for Hamming ≤ 3 (2 flipped
    bits touch ≤ 2 bands, leaving ≥ 2 intact), so the banded result equals
    the oracle's all-pairs XOR filter exactly — the oracle recomputes the
    sketch from scratch (same md5-bit construction as `dedup_simhash`) and
    joins all pairs, which is affordable at oracle scale only."""
    sk = simhash(load_table(spark, sf_dir, "documents"), nbits=32)
    return simhash_near_pairs(sk, max_hamming=2)


@register(
    "dedup_duplicate_clusters",
    oracle="""
    WITH RECURSIVE
    """ + _DUCK_SHINGLES + """,
    sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM common
        JOIN sz sa ON sa.doc_id = doc_a
        JOIN sz sb ON sb.doc_id = doc_b
        WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.8
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach(a, b) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS node, MIN(b) AS cluster_id FROM reach GROUP BY a
    """,
)
def dedup_duplicate_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (exact Jaccard >= 0.8) clustered into duplicate groups
    by distributed connected components (iterative min-label propagation).
    The Spark side is genuinely iterative; the oracle expresses the same
    fixpoint as a recursive CTE — both converge to min-id-per-component."""
    from chainhouse_spark.operators.components import connected_components

    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), shingle_words=3, threshold=0.8
    )
    return connected_components(pairs, src="doc_a", dst="doc_b")


@register(
    "dedup_edit_distance_pairs",
    oracle="""
    SELECT a.c_custkey AS custkey_a,
           b.c_custkey AS custkey_b,
           a.c_name AS name_a,
           b.c_name AS name_b,
           CAST(levenshtein(a.c_name, b.c_name) AS INTEGER) AS edit_distance
    FROM customer a, customer b
    WHERE a.c_custkey < b.c_custkey
      AND levenshtein(a.c_name, b.c_name) <= 1
    """,
)
def dedup_edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance-1 near-duplicate pairs via DELETION-NEIGHBORHOOD
    blocking (the SymSpell/PassJoin idea): each string's candidate keys are
    itself plus every single-character deletion; any pair within edit
    distance 1 (substitution OR indel) must share at least one key, so an
    equi-join on the key yields a complete candidate set and the exact
    levenshtein verifies. No quadratic compare and no reliance on shared
    prefixes (prefix blocking degenerates when every value shares a
    constant header, as these names do): deletion variants stay distinct
    wherever the strings differ, so buckets stay near-singleton. Scale:
    |rows| x (len+1) keys shuffle once; verification touches only
    candidate pairs. The oracle is the honest quadratic self-join."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    variants = c.select(
        "c_custkey",
        "c_name",
        F.explode(
            F.array_union(
                F.array(F.col("c_name")),
                F.expr(
                    "transform(sequence(1, length(c_name)),"
                    " i -> concat(substring(c_name, 1, i - 1),"
                    " substring(c_name, i + 1)))"
                ),
            )
        ).alias("key"),
    )
    pairs = (
        variants.alias("a")
        .join(variants.alias("b"), "key")
        .filter(F.col("a.c_custkey") < F.col("b.c_custkey"))
        .select(
            F.col("a.c_custkey").alias("custkey_a"),
            F.col("b.c_custkey").alias("custkey_b"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
        )
        .distinct()
    )
    return pairs.filter(F.levenshtein("name_a", "name_b") <= 1).withColumn(
        "edit_distance", F.levenshtein("name_a", "name_b").cast("int")
    )


# --------------------------------------------------------------------------
# Exact-substring dedup (Lee et al. 2022, "Deduplicating Training Data
# Makes Language Models Better" — the suffix-array ExactSubstr variant,
# approximated with strided fixed-width shingles)
# --------------------------------------------------------------------------

_SPAN_LEN = 40   # characters per shingle
_SPAN_STRIDE = 10


@register(
    "dedup_substring_spans",
    oracle=f"""
    SELECT md5(shingle) AS shingle_md5, COUNT(DISTINCT doc_id) AS n_docs
    FROM (
        SELECT doc_id, substr(text, p + 1, {_SPAN_LEN}) AS shingle
        FROM (
            SELECT doc_id, text,
                   unnest(generate_series(0, length(text) - {_SPAN_LEN},
                                          {_SPAN_STRIDE})) AS p
            FROM documents WHERE length(text) >= {_SPAN_LEN}
        )
    )
    GROUP BY shingle HAVING COUNT(DISTINCT doc_id) >= 2
    """,
)
def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document duplicated text spans: every {40}-char shingle (stride
    10) that occurs in >= 2 distinct documents.  This is the scalable stand-in
    for suffix-array exact-substring dedup: shingle generation is map-only
    (sequence + transform + explode, no Python), and the only shuffle is the
    hash aggregate on the shingle — at 100 TB you'd hash the shingle to 16
    bytes before the shuffle (here md5 is applied at output for a compact,
    engine-portable key).

    ``size(collect_set(doc_id))`` instead of ``countDistinct``: the distinct
    rewrite costs TWO exchanges ((shingle, doc) pre-dedup, then shingle);
    collect_set partials merge map-side and shuffle ONCE on the shingle,
    with state bounded by docs-per-shingle (small by construction — a
    shingle shared by the whole corpus is exactly what the filter reports).
    """
    d = load_table(spark, sf_dir, "documents")
    shingles = d.filter(F.length("text") >= _SPAN_LEN).select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(0, length(text) - {_SPAN_LEN},"
                f" {_SPAN_STRIDE}), p -> substr(text, p + 1, {_SPAN_LEN}))"
            )
        ).alias("shingle"),
    )
    return (
        shingles.groupBy("shingle")
        .agg(F.size(F.collect_set("doc_id")).cast("long").alias("n_docs"))
        .filter(F.col("n_docs") >= 2)
        .select(F.md5("shingle").alias("shingle_md5"), "n_docs")
    )


@register(
    "dedup_ppjoin_exact",
    oracle=FRUGAL_ORACLE + """
    WITH
    """ + _DUCK_SHINGLES + """,
    freq AS (SELECT shingle, COUNT(*) AS cnt FROM sh GROUP BY shingle),
    sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    ordered AS (
        SELECT s.doc_id, s.shingle,
               ROW_NUMBER() OVER (PARTITION BY s.doc_id
                                  ORDER BY f.cnt, s.shingle) AS pos
        FROM sh s JOIN freq f ON f.shingle = s.shingle
    ),
    prefix AS (
        SELECT o.doc_id, o.shingle
        FROM ordered o JOIN sz ON sz.doc_id = o.doc_id
        WHERE o.pos <= sz.n_sh - ((4 * sz.n_sh + 4) // 5) + 1
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM prefix a JOIN prefix b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ),
    common AS (
        SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
        FROM cand c
        JOIN sh a ON a.doc_id = c.doc_a
        JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
        GROUP BY c.doc_a, c.doc_b
    )
    SELECT doc_a, doc_b,
           (ROUND((CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common)) * 1e9) / 1e9 + 0.0) AS jaccard
    FROM common
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE n_common * 5 >= 4 * (sa.n_sh + sb.n_sh - n_common)
    """,
)
def dedup_ppjoin_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PPJoin-style EXACT Jaccard >= 0.8 similarity join via prefix
    filtering (Xiao et al. 2008, 'Efficient similarity joins for near
    duplicate detection') — the no-false-negative alternative to LSH
    candidate generation: sort each doc's shingles rarest-first by global
    frequency; two docs can reach Jaccard >= t only if they share a token
    inside their first |x| - ceil(t|x|) + 1 shingles, so the candidate
    join runs on PREFIX tokens only (rare by construction — tiny posting
    lists), then exact verification counts the full intersections of the
    surviving pairs.

    Everything is integer-exact: ceil(0.8 n) computed as (4n + 4) div 5
    (a float 0.8*n misrounds at n % 5 == 0 boundaries), the threshold
    filter as the cross-multiplication 5*common >= 4*union, one final
    float division for the reported jaccard. Shuffles carry (shingle,
    doc_id) pairs and counts — never text. Pinned equal to the all-pairs
    dedup_ngram_jaccard at the same threshold in tests."""
    docs = load_table(spark, sf_dir, "documents")
    sh = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(
                    "array_distinct(transform(sequence(1, "
                    "greatest(size(split(text, ' ')) - 2, 1)), "
                    "i -> concat_ws(' ', slice(split(text, ' '), i, 3))))"
                )
            ).alias("shingle"),
        )
    ).localCheckpoint()
    freq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("cnt"))
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    w = Window.partitionBy("doc_id").orderBy("cnt", "shingle")
    prefix = (
        sh.join(freq, "shingle")
        .withColumn("pos", F.row_number().over(w))
        .join(sz, "doc_id")
        .filter(F.expr("pos <= n_sh - ((4 * n_sh + 4) div 5) + 1"))
        .select("doc_id", "shingle")
    )
    a = prefix.alias("a")
    b = prefix.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )
    common = (
        cand.join(sh.alias("sa"), F.col("sa.doc_id") == F.col("doc_a"))
        .join(
            sh.alias("sb"),
            (F.col("sb.doc_id") == F.col("doc_b"))
            & (F.col("sb.shingle") == F.col("sa.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        common.join(sz.selectExpr("doc_id AS doc_a", "n_sh AS na"), "doc_a")
        .join(sz.selectExpr("doc_id AS doc_b", "n_sh AS nb"), "doc_b")
        .filter("n_common * 5 >= 4 * (na + nb - n_common)")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                9,
            ).alias("jaccard"),
        )
    )


@register(
    "dedup_clusters_star",
    oracle="""
    WITH RECURSIVE
    """ + _DUCK_SHINGLES + """,
    sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM common
        JOIN sz sa ON sa.doc_id = doc_a
        JOIN sz sb ON sb.doc_id = doc_b
        WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.8
    ),
    edges AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL SELECT doc_b, doc_a FROM pairs
    ),
    reach(a, b) AS (
        SELECT DISTINCT a, a FROM edges
        UNION
        SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS node, MIN(b) AS cluster_id FROM reach GROUP BY a
    """,
)
def dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The same duplicate clusters as `dedup_duplicate_clusters`, computed
    by the alternating large-star/small-star algorithm (Kiveris et al.
    2014; operators/components.py::connected_components_star) instead of
    min-label propagation. Propagation needs diameter rounds; the star
    form converges in O(log^2 n) regardless of diameter — the variant a
    100 TB web-graph-shaped dedup needs. The oracle is the identical
    recursive-CTE fixpoint, so the driver independently proves BOTH
    component algorithms reach the same clustering."""
    from chainhouse_spark.operators.components import connected_components_star

    pairs = ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents"), shingle_words=3, threshold=0.8
    )
    return connected_components_star(pairs, src="doc_a", dst="doc_b")


@register(
    "dedup_threshold_sweep",
    oracle="""
    WITH
    """ + _DUCK_SHINGLES + """,
    """ + _DUCK_MINHASH + """,
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
    ),
    pairs AS (
        SELECT c.doc_a, c.doc_b,
               CAST(SUM(CASE WHEN ma.h = mb.h THEN 1 ELSE 0 END) AS INT) AS est16
        FROM cand c
        JOIN mh ma ON ma.doc_id = c.doc_a
        JOIN mh mb ON mb.doc_id = c.doc_b AND mb.s = ma.s
        GROUP BY c.doc_a, c.doc_b
    ),
    doc_max AS (
        SELECT doc_id, MAX(est16) AS m FROM (
            SELECT doc_a AS doc_id, est16 FROM pairs
            UNION ALL SELECT doc_b AS doc_id, est16 FROM pairs
        ) GROUP BY doc_id
    ),
    spine AS (SELECT CAST(t AS INT) AS t16 FROM UNNEST(range(8, 17)) u(t))
    SELECT t16,
           CAST(t16 AS DOUBLE) / 16 AS threshold,
           CAST(COALESCE((SELECT COUNT(*) FROM pairs WHERE est16 >= t16), 0)
                AS BIGINT) AS n_pairs_ge,
           CAST(COALESCE((SELECT COUNT(*) FROM doc_max WHERE m >= t16), 0)
                AS BIGINT) AS n_docs_in_pairs_ge
    FROM spine
    """,
)
def dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The near-dup threshold tuning curve: for every MinHash(16) estimated-
    Jaccard cutoff 8/16 .. 16/16, how many candidate pairs survive and how
    many documents would be implicated — the sweep a pipeline owner reads
    before fixing the dedup threshold (too low deletes real data, too high
    keeps near-copies). est_jaccard = matches/16, so 16*est is an EXACT
    integer bucket; the sweep is an inequality join of a 9-row spine
    against the already-aggregated pair histogram — candidates are
    enumerated ONCE via banded LSH (never all-pairs, never once per
    threshold)."""
    from chainhouse_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, num_hashes=16, shingle_words=3)
    pairs = lsh_candidate_pairs(sigs, num_hashes=16, bands=4).select(
        "doc_a",
        "doc_b",
        F.round(F.col("est_jaccard") * 16, 0).cast("int").alias("est16"),
    )
    doc_max = (
        pairs.selectExpr("doc_a AS doc_id", "est16")
        .unionAll(pairs.selectExpr("doc_b AS doc_id", "est16"))
        .groupBy("doc_id")
        .agg(F.max("est16").alias("m"))
    )
    # Collapse to <=17-row histograms BEFORE the inequality join: pairs can
    # be arbitrarily many at scale, so the sweep must never broadcast or
    # nested-loop over them — only over (est16, count) buckets.
    p_hist = pairs.groupBy("est16").agg(F.count(F.lit(1)).alias("c"))
    d_hist = doc_max.groupBy(F.col("m").alias("est16")).agg(
        F.count(F.lit(1)).alias("c")
    )
    spine = spark.range(8, 17).select(F.col("id").cast("int").alias("t16"))
    p_ge = (
        spine.alias("s")
        .join(F.broadcast(p_hist.alias("p")), F.col("p.est16") >= F.col("s.t16"), "left")
        .groupBy("t16")
        .agg(F.coalesce(F.sum("p.c"), F.lit(0)).cast("bigint").alias("n_pairs_ge"))
    )
    d_ge = (
        spine.alias("s")
        .join(F.broadcast(d_hist.alias("d")), F.col("d.est16") >= F.col("s.t16"), "left")
        .groupBy("t16")
        .agg(
            F.coalesce(F.sum("d.c"), F.lit(0))
            .cast("bigint")
            .alias("n_docs_in_pairs_ge")
        )
    )
    return (
        p_ge.join(d_ge, "t16")
        .select(
            "t16",
            (F.col("t16").cast("double") / 16).alias("threshold"),
            "n_pairs_ge",
            "n_docs_in_pairs_ge",
        )
    )


@register(
    "dedup_cluster_size_histogram",
    oracle=f"""{FRUGAL_ORACLE}
    WITH sized AS (
        SELECT md5(text) AS h,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    ),
    clusters AS (
        SELECT h, CAST(COUNT(*) AS BIGINT) AS n_copies,
               CAST(SUM(n_tok) AS BIGINT) AS tok
        FROM sized GROUP BY h
    )
    SELECT CASE WHEN n_copies = 1 THEN '1'
                WHEN n_copies = 2 THEN '2'
                WHEN n_copies <= 5 THEN '3-5'
                ELSE '6+' END AS cluster_size,
           CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(n_copies) AS BIGINT) AS n_docs,
           CAST(SUM(tok) AS BIGINT) AS n_tokens,
           CAST(SUM(tok) - SUM(tok // n_copies) AS BIGINT) AS excess_tokens
    FROM clusters GROUP BY 1
    """,
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate cluster-size histogram weighted by documents AND
    tokens — the 'how bad is duplication' readout that sizes a dedup run
    before paying for it (clusters of 2 vs a few hot 6+ clusters need
    different strategies: hash dedup vs investigating a crawler loop).
    excess_tokens = tokens beyond one kept copy per cluster (integer floor
    share) — the mass hard dedup would remove. One 16-byte-key shuffle,
    then a 4-bucket rollup."""
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    clusters = sized.groupBy("h").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_copies"),
        F.sum("n_tok").cast("bigint").alias("tok"),
    )
    bucket = (
        F.when(F.col("n_copies") == 1, "1")
        .when(F.col("n_copies") == 2, "2")
        .when(F.col("n_copies") <= 5, "3-5")
        .otherwise("6+")
    )
    return clusters.groupBy(bucket.alias("cluster_size")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters"),
        F.sum("n_copies").cast("bigint").alias("n_docs"),
        F.sum("tok").cast("bigint").alias("n_tokens"),
        (F.sum("tok") - F.sum(F.expr("tok DIV n_copies")))
        .cast("bigint")
        .alias("excess_tokens"),
    )


@register(
    "dedup_shard_consistency",
    oracle="""
    WITH norm AS (
        SELECT doc_id, md5(lower(trim(text))) AS h,
               CAST((instr('0123456789abcdef',
                           substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
                    % 8 AS BIGINT) AS shard
        FROM documents
    ),
    global_d AS (SELECT CAST(COUNT(DISTINCT h) AS BIGINT) AS n FROM norm),
    shard_d AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n FROM (
            SELECT shard, COUNT(DISTINCT h) AS n FROM norm GROUP BY shard
        )
    ),
    content_shard AS (
        SELECT CAST(SUM(n) AS BIGINT) AS n FROM (
            SELECT CAST((instr('0123456789abcdef', substr(h, 1, 1)) - 1)
                        % 8 AS BIGINT) AS cshard,
                   COUNT(DISTINCT h) AS n
            FROM norm GROUP BY cshard
        )
    )
    SELECT (SELECT n FROM global_d) AS n_distinct_global,
           (SELECT n FROM shard_d) AS n_distinct_doc_sharded,
           (SELECT n FROM content_shard) AS n_distinct_content_sharded,
           (SELECT n FROM content_shard) = (SELECT n FROM global_d)
             AS content_sharding_is_lossless,
           (SELECT n FROM shard_d) >= (SELECT n FROM global_d)
             AS doc_sharding_overcounts
    FROM global_d LIMIT 1
    """,
)
def dedup_shard_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The shardability proof behind distributed exact dedup, stated as a
    query: deduping within CONTENT-hash shards (shard = hash of the
    normalized text digest) yields exactly the global distinct count —
    duplicates can never cross shards — while deduping within arbitrary
    DOC-ID shards overcounts (the same content lands in many shards).
    This is why the exact-dedup operator shuffles on the 16-byte content
    key and nothing else, and why a 100 TB dedup can run as independent
    per-shard jobs with no cross-shard reconciliation. NOTE the hash
    used for SHARDING only needs engine-local consistency; here both
    sides use their own hash() over the md5 digest string — the COUNTS
    agree because the partition-invariance holds for any hash, which is
    the point being proven."""
    d = load_table(spark, sf_dir, "documents")
    norm = d.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("h"),
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1), 16, 10)
         .cast("bigint") % 8)
        .alias("shard"),
    )
    g = norm.agg(F.countDistinct("h").cast("bigint").alias("n_g"))
    s = (
        norm.groupBy("shard")
        .agg(F.countDistinct("h").alias("n"))
        .agg(F.sum("n").cast("bigint").alias("n_s"))
    )
    c = (
        norm.select(
            (F.conv(F.substring(F.col("h"), 1, 1), 16, 10).cast("bigint") % 8)
            .alias("cshard"),
            "h",
        )
        .groupBy("cshard")
        .agg(F.countDistinct("h").alias("n"))
        .agg(F.sum("n").cast("bigint").alias("n_c"))
    )
    return (
        g.crossJoin(s)
        .crossJoin(c)
        .select(
            F.col("n_g").alias("n_distinct_global"),
            F.col("n_s").alias("n_distinct_doc_sharded"),
            F.col("n_c").alias("n_distinct_content_sharded"),
            (F.col("n_c") == F.col("n_g")).alias(
                "content_sharding_is_lossless"
            ),
            (F.col("n_s") >= F.col("n_g")).alias("doc_sharding_overcounts"),
        )
    )


# --------------------------------------------------------------------------
# Contamination span report (r10): "how much leaked, not whether" — the
# span-length extension of ExactSubstr/dedup_substring_spans. Cross-snapshot
# pairs (deterministic md5-bit split of doc_id — NOT id arithmetic, which is
# constant within a source in this data) are anchored on the same strided
# 40-char shingles; consecutive anchors on one alignment diagonal
# (p_a − p_b constant, p_b advancing by the stride) chain into runs, and a
# run of r anchors certifies a shared span of >= 40 + (r−1)·10 characters.
# --------------------------------------------------------------------------

_SNAP_BIT = (
    "CAST(conv(substr(md5(CAST(doc_id AS STRING)), 1, 1), 16, 10) AS INT) % 2"
)

# Shared oracle CTE chain: strided shingles with the snapshot bit, the
# cross-snapshot anchor join, diagonal islands, and per-island run counts.
_DUCK_SPAN_RUNS = f"""
    sh AS (
        SELECT doc_id,
               (strpos('0123456789abcdef',
                       substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) % 2
                   AS snap,
               p, substr(text, p + 1, {_SPAN_LEN}) AS shingle
        FROM (
            SELECT doc_id, text,
                   unnest(generate_series(0, length(text) - {_SPAN_LEN},
                                          {_SPAN_STRIDE})) AS p
            FROM documents WHERE length(text) >= {_SPAN_LEN}
        )
    ),
    anchors AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.p AS pa, b.p AS pb
        FROM sh a JOIN sh b ON a.shingle = b.shingle
        WHERE a.snap = 0 AND b.snap = 1
    ),
    isl AS (
        SELECT doc_a, doc_b, pa - pb AS diag, pb,
               pb // {_SPAN_STRIDE}
                 - ROW_NUMBER() OVER (PARTITION BY doc_a, doc_b, pa - pb
                                      ORDER BY pb) AS isle
        FROM anchors
    ),
    runs AS (
        SELECT doc_a, doc_b, COUNT(*) AS r
        FROM isl GROUP BY doc_a, doc_b, diag, isle
    )
"""


def _span_runs(d: DataFrame) -> DataFrame:
    """Per-island anchor-run counts (doc_a, doc_b, diag, isle, r) for
    cross-snapshot pairs — the Spark twin of _DUCK_SPAN_RUNS. doc_a is
    snapshot 0 (train), doc_b snapshot 1 (eval)."""
    sh = (
        d.filter(F.length("text") >= _SPAN_LEN)
        .select(
            "doc_id",
            F.expr(_SNAP_BIT).alias("snap"),
            F.explode(
                F.expr(
                    f"transform(sequence(0, length(text) - {_SPAN_LEN},"
                    f" {_SPAN_STRIDE}), p -> struct(p AS p,"
                    f" substr(text, p + 1, {_SPAN_LEN}) AS shingle))"
                )
            ).alias("s"),
        )
        .select(
            "doc_id", "snap",
            F.col("s.p").alias("p"), F.col("s.shingle").alias("shingle"),
        )
    )
    a = sh.filter(F.col("snap") == 0).select(
        F.col("doc_id").alias("doc_a"), F.col("p").alias("pa"), "shingle"
    )
    b = sh.filter(F.col("snap") == 1).select(
        F.col("doc_id").alias("doc_b"), F.col("p").alias("pb"), "shingle"
    )
    anchors = a.join(b, "shingle").select(
        "doc_a", "doc_b", (F.col("pa") - F.col("pb")).alias("diag"), "pb"
    )
    w = Window.partitionBy("doc_a", "doc_b", "diag").orderBy("pb")
    isl = anchors.withColumn(
        "isle", F.expr(f"pb DIV {_SPAN_STRIDE}") - F.row_number().over(w)
    )
    return isl.groupBy("doc_a", "doc_b", "diag", "isle").agg(
        F.count(F.lit(1)).alias("r")
    )


@register(
    "contamination_span_report",
    oracle=f"""{FRUGAL_ORACLE}
    WITH {_DUCK_SPAN_RUNS}
    SELECT doc_a, doc_b,
           CAST(MAX({_SPAN_LEN} + (r - 1) * {_SPAN_STRIDE}) AS BIGINT)
               AS max_span_chars,
           CAST(SUM({_SPAN_LEN} + (r - 1) * {_SPAN_STRIDE}) AS BIGINT)
               AS total_span_chars,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(r) AS BIGINT) AS n_anchors
    FROM runs GROUP BY doc_a, doc_b
    """,
)
def contamination_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest (and total) exactly-shared character span per cross-snapshot
    document pair — the contamination READOUT that tells a training-data
    owner how much of an eval snapshot leaked into train, not merely that
    something did (extends `dedup_substring_spans`; reference delegates all
    such analytics to its ClickHouse store, SURVEY.md §2.6).

    Anchoring: the same {40}-char / stride-{10} shingles as ExactSubstr.
    A true shared span of length L produces floor((L−40)/10)+1 consecutive
    anchors on one alignment diagonal, so the report is an exact function
    of the anchor set and a deterministic lower bound on L — both engines
    replay it bit-for-bit (no floats emitted).

    Plan shape: shingling is map-only; the only data-sized shuffles are the
    anchor equi-join on shingle content and one window + two aggregates on
    (doc_a, doc_b, diagonal) — the island aggregate reuses the window's
    partitioning (grouping keys are a superset), so no exchange between
    them. At 100 TB the anchor join hash-partitions on the shingle; heavy
    anchors (boilerplate) are the classic skew key, handled by AQE skew
    splitting, and the shingle would be pre-hashed to 16 bytes before the
    shuffle exactly as dedup_substring_spans documents."""
    runs = _span_runs(load_table(spark, sf_dir, "documents"))
    span = F.lit(_SPAN_LEN) + (F.col("r") - 1) * F.lit(_SPAN_STRIDE)
    return runs.groupBy("doc_a", "doc_b").agg(
        F.max(span).cast("long").alias("max_span_chars"),
        F.sum(span).cast("long").alias("total_span_chars"),
        F.count(F.lit(1)).cast("long").alias("n_spans"),
        F.sum("r").cast("long").alias("n_anchors"),
    )


_LEAK_MIN_SPAN = 60  # chars: >= 3 consecutive anchors — two isolated
# shingle hits don't count as a leak, a chained span does.


@register(
    "contamination_rate_by_source",
    oracle=f"""{FRUGAL_ORACLE}
    WITH {_DUCK_SPAN_RUNS},
    best AS (
        SELECT doc_b, MAX({_SPAN_LEN} + (r - 1) * {_SPAN_STRIDE}) AS s
        FROM runs GROUP BY doc_b
    )
    SELECT d.source,
           CAST(COUNT(*) AS BIGINT) AS n_eval_docs,
           CAST(SUM(CASE WHEN best.s >= {_LEAK_MIN_SPAN} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_leaked,
           {round9_sql(
               f"CAST(SUM(CASE WHEN best.s >= {_LEAK_MIN_SPAN} THEN 1 "
               "ELSE 0 END) AS DOUBLE) / COUNT(*)"
           )} AS leak_rate
    FROM documents d LEFT JOIN best ON best.doc_b = d.doc_id
    WHERE (strpos('0123456789abcdef',
                  substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 1)) - 1) % 2 = 1
    GROUP BY d.source
    """,
)
def contamination_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-snapshot contamination RATE: per source, the fraction of
    eval-snapshot documents with at least one exactly-shared span of
    >= {60} chars (>= 3 chained anchors) in the train snapshot — the
    go/no-go number a training run reads before trusting its eval set,
    composed from the same anchor-run machinery as
    contamination_span_report. Eval docs with no anchor at all survive the
    LEFT join with a NULL best-span and count in the denominator.

    Plan: the span pipeline's joins plus one doc_b max, a broadcast-sized
    join back to the eval docs (best-span table is bounded by the eval
    corpus), and a per-source rollup — nothing new grows with corpus size
    beyond the pipeline already smoked at 10x/100x."""
    d = load_table(spark, sf_dir, "documents")
    runs = _span_runs(d)
    span = F.lit(_SPAN_LEN) + (F.col("r") - 1) * F.lit(_SPAN_STRIDE)
    best = runs.groupBy("doc_b").agg(F.max(span).alias("s"))
    ev = d.filter(F.expr(_SNAP_BIT) == 1).select("doc_id", "source")
    leaked = F.when(F.col("s") >= _LEAK_MIN_SPAN, 1).otherwise(0)
    return (
        ev.join(best, ev.doc_id == best.doc_b, "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_eval_docs"),
            F.sum(leaked).cast("long").alias("n_leaked"),
            round9(
                F.sum(leaked).cast("double") / F.count(F.lit(1))
            ).alias("leak_rate"),
        )
    )


# LSH parameter planner (r10): the EXACT candidate-pair workload each
# (bands, rows) split of the 16-hash signature would generate on THIS
# corpus, next to the config's collision S-curve midpoint. s50 values are
# precomputed literals (pure functions of b and r), identical in both
# engines by construction.
_LSH_PLAN_CONFIGS = [(16 // r, r) for r in (1, 2, 4, 8, 16)]
_S50 = {r: round((1 - 0.5 ** (1.0 / b)) ** (1.0 / r), 9)
        for b, r in _LSH_PLAN_CONFIGS}


@register(
    "dedup_lsh_band_plan",
    oracle=FRUGAL_ORACLE + """
    WITH
    """ + _DUCK_SHINGLES + """,
    """ + _DUCK_MINHASH + """,
    cfg AS (SELECT UNNEST([1, 2, 4, 8, 16]) AS r),
    keys AS (
        SELECT cfg.r, mh.doc_id, mh.s // cfg.r AS band,
               STRING_AGG(CAST(mh.h AS VARCHAR), ',' ORDER BY mh.s) AS key
        FROM mh, cfg
        GROUP BY cfg.r, mh.doc_id, mh.s // cfg.r
    ),
    buckets AS (
        SELECT r, band, key, CAST(COUNT(*) AS BIGINT) AS n
        FROM keys GROUP BY r, band, key
    )
    SELECT CAST(16 // r AS INT) AS bands,
           CAST(r AS INT) AS rows_per_band,
           CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS candidate_pairs,
           CAST(SUM(CASE WHEN n >= 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS multi_buckets,
           CAST(MAX(n) AS BIGINT) AS max_bucket,
           CASE r """ + " ".join(
        f"WHEN {r} THEN {_S50[r]!r}" for r in (1, 2, 4, 8, 16)
    ) + """ END AS s50_jaccard
    FROM buckets GROUP BY r
    """,
)
def dedup_lsh_band_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding PLANNER: for every (bands x rows) factorization of the
    16-hash MinHash signature, the exact candidate-pair workload banding
    would generate on this corpus — sum over buckets of C(n,2), bucket
    multiplicity included, because that IS the join fan-out you pay —
    plus bucket stats and the config's S-curve midpoint s50 = (1 −
    (1/2)^(1/b))^(1/r) (the Jaccard at which a pair has a 50% chance of
    becoming a candidate). The planning readout that picks `bands` for
    dedup_minhash_lsh BEFORE paying for the join at 100 TB: scan the
    row whose candidate_pairs fits the budget and whose s50 sits at the
    dedup threshold.

    One signature pass (the same single-md5 Carter-Wegman fold as
    operators/dedup.py, replayed exactly by the oracle), one map-side
    explode into all five configs' (r, band, key) rows, one shuffle to
    count buckets, and a 5-row rollup. Nothing pair-shaped is ever
    materialized — the planner costs one aggregation, the join it sizes
    would cost candidate_pairs."""
    from chainhouse_spark.operators.dedup import minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs)
    return _lsh_band_plan_df(sigs)


def _lsh_band_plan_df(sigs: DataFrame) -> DataFrame:
    """The 5-row (bands × rows) workload table off a 16-hash signature DF —
    shared by the planner readout (dedup_lsh_band_plan) and the
    planner-driven executor (dedup_minhash_lsh_planned)."""
    keys = sigs.select(
        F.explode(
            F.expr(
                "flatten(transform(array(1, 2, 4, 8, 16), r -> "
                "transform(sequence(0, CAST(16 / r AS INT) - 1), b -> "
                "struct(r AS r, b AS band, "
                "concat_ws(',', transform(slice(sig, b * r + 1, r), "
                "x -> CAST(x AS STRING))) AS key))))"
            )
        ).alias("k")
    ).select("k.r", "k.band", "k.key")
    buckets = keys.groupBy("r", "band", "key").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    s50 = "CASE r " + " ".join(
        f"WHEN {r} THEN CAST({_S50[r]!r} AS DOUBLE)" for r in (1, 2, 4, 8, 16)
    ) + " END"
    return (
        buckets.groupBy("r")
        .agg(
            F.sum(F.expr("n * (n - 1) DIV 2")).cast("bigint").alias("candidate_pairs"),
            F.sum(F.when(F.col("n") >= 2, 1).otherwise(0))
            .cast("bigint")
            .alias("multi_buckets"),
            F.max("n").cast("bigint").alias("max_bucket"),
        )
        .selectExpr(
            "CAST(16 DIV r AS INT) AS bands",
            "CAST(r AS INT) AS rows_per_band",
            "candidate_pairs",
            "multi_buckets",
            "max_bucket",
            f"{s50} AS s50_jaccard",
        )
    )


# Planner-driven banding choice (dedup_minhash_lsh_planned): among configs
# whose S-curve midpoint sits at-or-below the dedup threshold (recall at
# tau stays >= 50%) AND whose exact candidate workload fits the budget,
# take the LARGEST s50 (fewest false candidates); if nothing qualifies,
# fall back to the cheapest config. Both constants are part of the query's
# contract — the oracle replays the same rule in SQL.
_PLAN_TAU = 0.8
_PLAN_BUDGET_DOCS_MULT = 4

_DUCK_PLAN = """
    cfg AS (SELECT UNNEST([1, 2, 4, 8, 16]) AS r),
    keys AS (
        SELECT cfg.r, mh.doc_id, mh.s // cfg.r AS band,
               STRING_AGG(CAST(mh.h AS VARCHAR), ',' ORDER BY mh.s) AS key
        FROM mh, cfg
        GROUP BY cfg.r, mh.doc_id, mh.s // cfg.r
    ),
    buckets AS (
        SELECT r, band, key, CAST(COUNT(*) AS BIGINT) AS n
        FROM keys GROUP BY r, band, key
    ),
    plan AS (
        SELECT CAST(16 // r AS INT) AS bands, CAST(r AS INT) AS r,
               CAST(SUM(n * (n - 1) // 2) AS BIGINT) AS cand,
               CASE r """ + " ".join(
    f"WHEN {r} THEN {_S50[r]!r}" for r in (1, 2, 4, 8, 16)
) + """ END AS s50
        FROM buckets GROUP BY r
    )
"""


@register(
    "dedup_minhash_lsh_planned",
    oracle=FRUGAL_ORACLE + """
    WITH
    """ + _DUCK_SHINGLES + """,
    """ + _DUCK_MINHASH + """,
    """ + _DUCK_PLAN + f""",
    nd AS (SELECT {_PLAN_BUDGET_DOCS_MULT} * COUNT(*) AS budget FROM documents),
    elig AS (
        SELECT p.* FROM plan p, nd
        WHERE p.s50 <= {_PLAN_TAU} AND p.cand <= nd.budget
    ),
    chosen AS (
        SELECT * FROM (SELECT bands, r FROM elig ORDER BY s50 DESC LIMIT 1)
        UNION ALL
        SELECT * FROM (
            SELECT bands, r FROM plan
            WHERE NOT EXISTS (SELECT 1 FROM elig)
            ORDER BY cand ASC, r DESC LIMIT 1
        )
    ),
    cand_pairs AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM keys a
        JOIN keys b ON a.r = b.r AND a.band = b.band AND a.key = b.key
                   AND a.doc_id < b.doc_id
        WHERE a.r = (SELECT r FROM chosen)
    )
    SELECT (SELECT CAST(bands AS INT) FROM chosen) AS bands,
           (SELECT CAST(r AS INT) FROM chosen) AS rows_per_band,
           c.doc_a, c.doc_b,
           CAST(SUM(CASE WHEN ma.h = mb.h THEN 1 ELSE 0 END) AS DOUBLE) / 16
               AS est_jaccard
    FROM cand_pairs c
    JOIN mh ma ON ma.doc_id = c.doc_a
    JOIN mh mb ON mb.doc_id = c.doc_b AND mb.s = ma.s
    GROUP BY c.doc_a, c.doc_b
    """,
)
def dedup_minhash_lsh_planned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The planner→executor ROUND-TRIP (VERDICT r10 task 5): read the
    banding off dedup_lsh_band_plan's exact workload table, then run the
    LSH candidate join with the chosen config — proving the planner's
    output actually drives the executor rather than coexisting with it.

    Choice rule (replayed exactly by the oracle): among the five
    (bands × rows) factorizations of the 16-hash signature, keep those
    with s50 <= tau (= the 0.8 dedup threshold: a true near-dup pair at
    tau still has >= 50% candidate probability) whose exact candidate
    workload fits the budget (4 × n_docs pairs), and take the LARGEST s50
    — closest to the threshold from below = fewest false candidates at
    the target recall. If nothing fits the budget, fall back to the
    cheapest config. On this corpus the rule lands on 4 × 4 — the
    production banding — so the emitted pairs are exactly
    dedup_minhash_lsh's (tests/test_llm_advanced.py pins the round-trip).

    The plan table is 5 rows (collected driver-side — k-bounded like the
    IVF centroids), the doc count is one scalar aggregate, and the
    executed join is the standard single-shuffle banded bucket expansion
    (operators/dedup.py::lsh_candidate_pairs). At 100 TB the planner
    aggregation costs one signature pass; the join it sizes would cost
    candidate_pairs — which is exactly what the budget guard bounds.

    The signature table is localCheckpoint'ed (materialized by the plan
    collect) so the shingle-explode + md5 + 16-minima pipeline — the
    dominant scan work — runs ONCE and the executed banded join reads the
    checkpointed rows instead of re-deriving the whole signature subplan
    (guide §2.4: the planner pass and the executor pass consumed the
    identical intermediate twice; measured ~1.7x on this query at sf0.1).
    Per-run only — every invocation recomputes from parquet."""
    from chainhouse_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures

    docs = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(docs, num_hashes=16, shingle_words=3).localCheckpoint(
        eager=False
    )
    plan = _lsh_band_plan_df(sigs).collect()  # 5 rows, bounded
    budget = _PLAN_BUDGET_DOCS_MULT * docs.count()
    elig = [
        r for r in plan
        if r.s50_jaccard <= _PLAN_TAU and r.candidate_pairs <= budget
    ]
    if elig:
        chosen = max(elig, key=lambda r: r.s50_jaccard)
    else:
        chosen = min(plan, key=lambda r: (r.candidate_pairs, -r.rows_per_band))
    pairs = lsh_candidate_pairs(sigs, num_hashes=16, bands=chosen.bands)
    return pairs.select(
        F.lit(chosen.bands).cast("int").alias("bands"),
        F.lit(chosen.rows_per_band).cast("int").alias("rows_per_band"),
        "doc_a",
        "doc_b",
        "est_jaccard",
    )


@register(
    "dedup_impact_on_mixture",
    oracle="""
    WITH canon AS (
        SELECT md5(text) AS h, MIN(doc_id) AS keep_id
        FROM documents GROUP BY md5(text)
    ),
    sized AS (
        SELECT d.doc_id, d.source,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
               CASE WHEN c.keep_id = d.doc_id THEN 1 ELSE 0 END AS kept
        FROM documents d JOIN canon c ON c.h = md5(d.text)
    ),
    per AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS docs_before,
               CAST(SUM(kept) AS BIGINT) AS docs_after,
               CAST(SUM(n_tok) AS BIGINT) AS tokens_before,
               CAST(SUM(CASE WHEN kept = 1 THEN n_tok ELSE 0 END) AS BIGINT)
                   AS tokens_after
        FROM sized GROUP BY source
    ),
    tot AS (
        SELECT CAST(SUM(tokens_before) AS BIGINT) AS tb,
               CAST(SUM(tokens_after) AS BIGINT) AS ta
        FROM per
    )
    SELECT source, docs_before, docs_after, tokens_before, tokens_after,
           (ROUND((CAST(tokens_before AS DOUBLE) / tb) * 1e9) / 1e9 + 0.0)
               AS share_before,
           (ROUND((CAST(tokens_after AS DOUBLE) / ta) * 1e9) / 1e9 + 0.0)
               AS share_after
    FROM per, tot
    """,
)
def dedup_impact_on_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """What exact dedup DOES to the training mixture: per source, doc and
    token counts before/after keeping one canonical copy (min doc_id) per
    content hash, and the source's token SHARE before/after — the readout
    that catches dedup silently reweighting the mixture (a source whose
    mass was mostly cross-source duplicates shrinks, everyone else's share
    rises; mixture weights tuned pre-dedup are stale after). Canonical
    attribution is global, so a doc duplicated across sources is credited
    to the minimum-id source, exactly like the exact_dedup operator keeps
    it.

    Plan: one content-hash aggregate (the same 16-byte-key shuffle as
    dedup_exact), a hash-equi join back to attribute keep flags, one
    per-source rollup, and 2 scalar totals broadcast back. All counts
    exact integers; the two shares are the only floats (round-at-9)."""
    d = load_table(spark, sf_dir, "documents")
    hashed = d.select(
        "doc_id", "source",
        F.md5("text").alias("h"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tok"),
    )
    canon = hashed.groupBy("h").agg(F.min("doc_id").alias("keep_id"))
    sized = hashed.join(canon, "h").withColumn(
        "kept", F.when(F.col("doc_id") == F.col("keep_id"), 1).otherwise(0)
    )
    per = sized.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("docs_before"),
        F.sum("kept").cast("bigint").alias("docs_after"),
        F.sum("n_tok").cast("bigint").alias("tokens_before"),
        F.sum(F.when(F.col("kept") == 1, F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("tokens_after"),
    )
    tot = per.agg(
        F.sum("tokens_before").cast("bigint").alias("tb"),
        F.sum("tokens_after").cast("bigint").alias("ta"),
    )
    return per.crossJoin(F.broadcast(tot)).select(
        "source", "docs_before", "docs_after", "tokens_before", "tokens_after",
        round9(F.col("tokens_before").cast("double") / F.col("tb")).alias(
            "share_before"
        ),
        round9(F.col("tokens_after").cast("double") / F.col("ta")).alias(
            "share_after"
        ),
    )


@register(
    "dedup_lsh_recall_report",
    oracle=FRUGAL_ORACLE + """
    WITH
    """ + _DUCK_SHINGLES + """,
    """ + _DUCK_MINHASH + """,
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
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
        FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    truth AS (
        SELECT doc_a, doc_b
        FROM common
        JOIN sz sa ON sa.doc_id = doc_a
        JOIN sz sb ON sb.doc_id = doc_b
        WHERE CAST(n_common AS DOUBLE)
              / (sa.n_sh + sb.n_sh - n_common) >= 0.8
    ),
    hits AS (
        SELECT COUNT(*) AS n_hits
        FROM truth t JOIN cand c ON t.doc_a = c.doc_a AND t.doc_b = c.doc_b
    )
    SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth_pairs,
           CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST(n_hits AS BIGINT) AS n_hits,
           (ROUND((CAST(n_hits AS DOUBLE)
               / (SELECT COUNT(*) FROM truth)) * 1e9) / 1e9 + 0.0) AS recall,
           (ROUND((CAST(n_hits AS DOUBLE)
               / (SELECT COUNT(*) FROM cand)) * 1e9) / 1e9 + 0.0)
               AS candidate_precision
    FROM hits
    """,
)
def dedup_lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Measured RECALL of the production 4x4 MinHash-LSH banding against
    the exact Jaccard >= 0.8 truth set, plus candidate precision — the
    quality readout that pairs with dedup_lsh_band_plan's cost readout
    (the planner says what each config COSTS, this says what the chosen
    one CATCHES). The truth set is the prefix-filtered exact join the
    dedup_ngram_jaccard query runs (shared-shingle blocked, never
    all-pairs); at 100 TB this report runs on a hash-gated sample of the
    corpus — the construction is sample-invariant because both sides see
    the same docs.

    Emits one row: truth-pair count, LSH candidate count, hits, recall,
    and candidate precision — all counts exact, the two ratios round-at-9.
    The oracle replays BOTH pipelines (Carter-Wegman minhash + banding,
    and the exact shingle-overlap join) and intersects them itself."""
    docs = load_table(spark, sf_dir, "documents")
    truth = ngram_jaccard_pairs(docs, shingle_words=3, threshold=0.8).select(
        "doc_a", "doc_b", F.lit(1).alias("t")
    )
    cand = lsh_candidate_pairs(
        minhash_signatures(docs, num_hashes=16, shingle_words=3),
        num_hashes=16,
        bands=4,
    ).select("doc_a", "doc_b", F.lit(1).alias("c"))
    # One distributed plan: full-outer join the two pair sets once, then a
    # single aggregate — each pipeline is computed exactly once (a
    # 3-action .count() form would recompute both sides).
    j = truth.join(cand, ["doc_a", "doc_b"], "full_outer")
    return j.agg(
        F.sum(F.coalesce(F.col("t"), F.lit(0))).cast("long").alias("n_truth_pairs"),
        F.sum(F.coalesce(F.col("c"), F.lit(0))).cast("long").alias("n_candidates"),
        F.sum(F.coalesce(F.col("t") * F.col("c"), F.lit(0)))
        .cast("long")
        .alias("n_hits"),
    ).select(
        "n_truth_pairs",
        "n_candidates",
        "n_hits",
        round9(F.col("n_hits").cast("double") / F.col("n_truth_pairs")).alias(
            "recall"
        ),
        round9(F.col("n_hits").cast("double") / F.col("n_candidates")).alias(
            "candidate_precision"
        ),
    )


# dedup_modality_overlap: DuckDB twins of the 6-bit sign-LSH cell and the
# ordered cosine fold (mirrors queries/llm_similarity.py, kept local so
# module import order stays registration order).
_MO_CELL_Q = " + ".join(
    f"(CASE WHEN q.embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(6)
)
_MO_CELL_C = " + ".join(
    f"(CASE WHEN c.embedding[{i + 1}] >= 0 THEN {1 << i} ELSE 0 END)"
    for i in range(6)
)
_MO_DOT = ("SUM(CAST(q.embedding[i.i] AS DOUBLE) * "
           "CAST(c.embedding[i.i] AS DOUBLE) ORDER BY i.i)")
_MO_QQ = ("SUM(CAST(q.embedding[i.i] AS DOUBLE) * "
          "CAST(q.embedding[i.i] AS DOUBLE) ORDER BY i.i)")
_MO_CC = ("SUM(CAST(c.embedding[i.i] AS DOUBLE) * "
          "CAST(c.embedding[i.i] AS DOUBLE) ORDER BY i.i)")


@register(
    "dedup_modality_overlap",
    oracle=f"""
    WITH sem AS (
        SELECT q.vec_id AS a, c.vec_id AS b
        FROM embeddings q, embeddings c,
             (SELECT UNNEST(range(1, 65)) AS i) i
        WHERE q.vec_id < c.vec_id AND ({_MO_CELL_Q}) = ({_MO_CELL_C})
        GROUP BY q.vec_id, c.vec_id
        HAVING {_MO_DOT} / (sqrt({_MO_QQ}) * sqrt({_MO_CC})) >= 0.2
    ),
    emb_docs AS (
        SELECT d.doc_id, d.text FROM documents d
        JOIN embeddings e ON e.vec_id = d.doc_id
    ),
    tok AS (SELECT doc_id, string_split(text, ' ') AS t FROM emb_docs),
    sh AS (
        SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
        FROM tok, LATERAL (SELECT UNNEST(range(1, GREATEST(len(t) - 1, 1))) AS i) ii
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY doc_id),
    common AS (
        SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS n_common
        FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
        GROUP BY x.doc_id, y.doc_id
    ),
    lex AS (
        SELECT a, b FROM common
        JOIN sz sa ON sa.doc_id = a
        JOIN sz sb ON sb.doc_id = b
        WHERE CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) >= 0.8
    ),
    j AS (
        SELECT COALESCE(s.a, l.a) AS a,
               CASE WHEN s.a IS NULL THEN 0 ELSE 1 END AS is_sem,
               CASE WHEN l.a IS NULL THEN 0 ELSE 1 END AS is_lex
        FROM sem s FULL OUTER JOIN lex l ON s.a = l.a AND s.b = l.b
    )
    SELECT CAST(COALESCE(SUM(is_sem), 0) AS BIGINT) AS n_semantic,
           CAST(COALESCE(SUM(is_lex), 0) AS BIGINT) AS n_lexical,
           CAST(COALESCE(SUM(is_sem * is_lex), 0) AS BIGINT) AS n_both,
           CAST(COALESCE(SUM(is_sem * (1 - is_lex)), 0) AS BIGINT)
               AS n_semantic_only,
           CAST(COALESCE(SUM((1 - is_sem) * is_lex), 0) AS BIGINT)
               AS n_lexical_only,
           CASE WHEN COUNT(*) = 0 THEN 0.0 ELSE
               (ROUND((CAST(SUM(is_sem * is_lex) AS DOUBLE) / COUNT(*)) * 1e9)
                / 1e9 + 0.0) END AS pair_jaccard
    FROM j
    """,
)
def dedup_modality_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Agreement report between the SEMANTIC near-dup pair set (6-bit
    sign-LSH cells, exact within-cell cosine >= 0.2 — the
    semantic_dedup_cells candidate relation) and the LEXICAL near-dup pair
    set (exact 3-gram Jaccard >= 0.8, restricted to documents that have
    embeddings so both modalities see the same universe): how many pairs
    each finds, how many both find, and the Jaccard of the two PAIR SETS —
    the audit that says what semantic dedup catches that lexical dedup
    misses (paraphrases, translations, re-renders) and vice versa
    (templated text whose embeddings differ). A dedup rollout decision
    reads this one row before turning a second modality on.

    Both pair pipelines are the proven blocked/inverted-index forms;
    composition adds ONE full-outer join on pair keys (pair-relation
    sized, never corpus-sized) and a 1-row aggregate. Exact integers plus
    one round-at-9 ratio."""
    from chainhouse_spark.functions.vector import sign_bucket
    from chainhouse_spark.operators.dedup import ngram_jaccard_pairs
    from chainhouse_spark.operators.similarity import embedding_near_pairs

    emb = load_table(spark, sf_dir, "embeddings")
    docs = load_table(spark, sf_dir, "documents")
    cells = emb.withColumn("cell", sign_bucket("embedding", nbits=6))
    sem = embedding_near_pairs(cells, block_col="cell", threshold=0.2).select(
        F.col("vec_a").alias("a"), F.col("vec_b").alias("b"), F.lit(1).alias("is_sem")
    )
    emb_docs = docs.join(
        emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"
    )
    lex = ngram_jaccard_pairs(emb_docs, shingle_words=3, threshold=0.8).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b"), F.lit(1).alias("is_lex")
    )
    j = sem.join(lex, ["a", "b"], "full_outer").select(
        F.coalesce("is_sem", F.lit(0)).alias("is_sem"),
        F.coalesce("is_lex", F.lit(0)).alias("is_lex"),
    )
    # COALESCE/CASE guards keep the 1-row report TOTAL when the pair union
    # is empty (a corpus with no near-dups in either modality): sums over
    # an empty relation are NULL and 0/0 is NULL in both engines, and a
    # go/no-go row must never carry a NULL cell (ADVICE r11).
    return j.agg(
        F.coalesce(F.sum("is_sem"), F.lit(0)).cast("bigint").alias("n_semantic"),
        F.coalesce(F.sum("is_lex"), F.lit(0)).cast("bigint").alias("n_lexical"),
        F.coalesce(F.sum(F.col("is_sem") * F.col("is_lex")), F.lit(0))
        .cast("bigint")
        .alias("n_both"),
        F.coalesce(F.sum(F.col("is_sem") * (1 - F.col("is_lex"))), F.lit(0))
        .cast("bigint")
        .alias("n_semantic_only"),
        F.coalesce(F.sum((1 - F.col("is_sem")) * F.col("is_lex")), F.lit(0))
        .cast("bigint")
        .alias("n_lexical_only"),
        F.when(F.count(F.lit(1)) == 0, F.lit(0.0))
        .otherwise(
            round9(
                F.sum(F.col("is_sem") * F.col("is_lex")).cast("double")
                / F.count(F.lit(1))
            )
        )
        .alias("pair_jaccard"),
    )
