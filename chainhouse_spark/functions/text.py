"""Text-analysis column expressions for the training-data pipeline operators:
tokenization, shingling, quality features, language-ID scoring, and document
fingerprinting.

Everything here is a pure Column expression over built-in functions —
whole-stage-codegen'd, no Python in the hot path, safe at 100 TB. Hashing is
md5 (bitwise identical across engines) so results can be oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the heuristic language classifier.
# Deterministic and engine-portable (plain membership counting).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "de": ["der", "die", "das", "und", "ist", "ein"],
    "fr": ["le", "la", "et", "les", "un", "est"],
    "es": ["el", "la", "y", "los", "un", "es"],
}


def tokens(col: str) -> Column:
    """Whitespace tokenization of the named text column."""
    return F.split(F.col(col), r"\s+")


def word_shingles_sql(text_sql: str, n: int = 3) -> str:
    """SQL expression producing the array of n-word shingles of `text_sql`.

    The outer single-element transform binds the token array to a lambda
    variable, so split() runs ONCE per document — inlining it into the inner
    lambda would re-split per shingle position (O(tokens × text length) per
    doc, the difference between seconds and minutes at corpus scale).

    The size guard matters: Spark's sequence(1, k) DESCENDS for k < 1
    instead of returning an empty array, so short docs must short-circuit.
    """
    return (
        f"element_at(transform(array(split({text_sql}, ' ')), t -> "
        f"CASE WHEN size(t) >= {n} "
        f"THEN transform(sequence(1, size(t) - {n - 1}), i -> concat_ws(' ', slice(t, i, {n}))) "
        f"ELSE array() END), 1)"
    )


def word_shingles(col: str, n: int = 3) -> Column:
    return F.expr(word_shingles_sql(col, n))


def n_tokens(col: str) -> Column:
    return F.size(tokens(col))


def stopword_hits_sql(text_sql: str, stopwords: list[str]) -> str:
    arr = "array(" + ", ".join(f"'{w}'" for w in stopwords) + ")"
    return f"size(filter(split({text_sql}, ' '), w -> array_contains({arr}, w)))"


def stopword_ratio(col: str, stopwords: list[str]) -> Column:
    """Fraction of tokens that are stopwords (0 for empty docs)."""
    t = tokens(col)
    hits = F.expr(stopword_hits_sql(col, stopwords))
    return F.when(F.size(t) > 0, hits.cast("double") / F.size(t)).otherwise(F.lit(0.0))


def punct_ratio(col: str) -> Column:
    """Fraction of characters outside [a-z0-9 ] in the lowercased text."""
    c = F.col(col)
    clean = F.regexp_replace(F.lower(c), "[a-z0-9 ]", "")
    return F.when(
        F.length(c) > 0, F.length(clean).cast("double") / F.length(c)
    ).otherwise(F.lit(0.0))


def digit_ratio(col: str) -> Column:
    c = F.col(col)
    digits = F.regexp_replace(c, "[^0-9]", "")
    return F.when(
        F.length(c) > 0, F.length(digits).cast("double") / F.length(c)
    ).otherwise(F.lit(0.0))


def fingerprint(col: str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text
    (lowercase, whitespace collapsed, trimmed). The normalized-exact-dedup key."""
    return F.md5(F.trim(F.regexp_replace(F.lower(F.col(col)), r"\s+", " ")))
