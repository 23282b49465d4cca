"""Int8 embedding quantization and quantized similarity search.

The bandwidth lever for 100 TB similarity work: a float32 embedding column
is the widest thing an ANN pipeline shuffles, and symmetric int8
quantization cuts it 4× (plus one double scale per vector) while keeping
cosine rank order for realistic embedding distributions. Scoring on the
quantized form is *exact integer arithmetic* (int8×int8 products summed in
BIGINT — no float summation-order issues at all), with a single float
rescale `idot * scale_a * scale_b` at the end; that makes the whole
operator bit-for-bit replayable in ANSI SQL, unlike float-dot scoring
which needs an ordered fold.

Quantization rule (replayed identically by the DuckDB oracles):

    scale = max(|v_i|) / 127.0
    q_i   = 0                            if scale == 0
          = floor(v_i / scale + 0.5)     otherwise  (in [-127, 127])

`floor(x + 0.5)` instead of round(): both engines floor identically on
IEEE doubles, while round() half-away/half-even conventions vary by type
and engine. |q_i| ≤ 127 is guaranteed: |v_i / scale| ≤ 127 + ulp, and
floor(127.0000…1 + 0.5) = 127 (exceeding 127 would need v/scale ≥ 127.5).

Reference parity note: the reference engine (c0mm4nd/chainhouse) ships raw
blockchain columns to ClickHouse and has no vector surface; this module is
part of the training-data-pipeline extension the rebuild adds on top
(SURVEY.md §2 'beyond the reference').
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from chainhouse_spark.operators.partitioning import spread


def _scale_sql(vec: str) -> str:
    """max(|v|)/127 as a double — the symmetric int8 scale."""
    return (
        f"array_max(transform({vec}, x -> abs(CAST(x AS DOUBLE)))) / 127.0"
    )


def _quant_sql(vec: str, scale: str) -> str:
    """Quantized int array under `scale` (0-vector -> all zeros)."""
    # scale is parenthesized: an expression ending in `/ 127.0` would
    # otherwise left-associate under the division and floor everything to 0.
    return (
        f"transform({vec}, x -> CASE WHEN ({scale}) = 0 THEN 0 "
        f"ELSE CAST(FLOOR(CAST(x AS DOUBLE) / ({scale}) + 0.5) AS INT) END)"
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Per-vector symmetric int8 quantization: (id, scale, q).

    Map-only — no shuffle; the output is the 4×-narrower column you
    persist/shuffle instead of the float vectors.

    The scale is staged as its own projection before the quantizing
    transform — both so the max is evaluated once per row instead of once
    per element, and because textual substitution of the scale expression
    (which ends in `/ 127.0`) into `x / {scale}` without parentheses
    left-associates to `(x / array_max) / 127.0` and silently floors
    everything to zero.
    """
    return (
        df.select(F.col(id_col), F.col(vec_col))
        .withColumn("scale", F.expr(_scale_sql(vec_col)))
        .select(
            F.col(id_col),
            F.col("scale"),
            F.expr(_quant_sql(vec_col, "scale")).alias("q"),
        )
    )


def _int_dot_sql(a: str, b: str) -> str:
    """Exact BIGINT dot product of two int arrays (order-insensitive)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> CAST(x AS BIGINT) * y), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def quantized_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Top-k by quantized dot product for each query vector.

    Same broadcast-query/map-only-score/one-rank-shuffle shape as
    operators/similarity.py::brute_force_topk, but each score is
    `idot * scale_q * scale_c` where idot is an exact integer — the
    shuffled/broadcast payload is int8-ranged ints, 4× smaller than the
    float vectors, and the score is deterministic with no ordered fold.
    """
    q = quantize_int8(queries, vec_col, id_col).select(
        F.col(id_col).alias("query_id"),
        F.col("scale").alias("scale_q"),
        F.col("q").alias("q_q"),
    )
    c = quantize_int8(spread(corpus, id_col), vec_col, id_col).select(
        F.col(id_col).alias("cand_id"),
        F.col("scale").alias("scale_c"),
        F.col("q").alias("q_c"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.expr(
                f"CAST({_int_dot_sql('q_q', 'q_c')} AS DOUBLE) * scale_q * scale_c"
            ).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cand_id", "score", F.col("rank").cast("int").alias("rank"))
    )


# 1-bit (sign) quantization: dim bits pack into ceil(dim/32) BIGINT halves
# of 32 bits each. 32-bit halves — not a single 64-bit word — are the
# overflow-safe choice: bit 63 of a full pack would need the sign bit of a
# signed BIGINT (Spark has no unsigned), and the fold's running sum would
# trip ANSI overflow; halves keep every intermediate <= 2^32.
def _sign_half_sql(vec: str, lo: int) -> str:
    """SQL: bits lo..lo+31 of the sign signature of `vec` as one BIGINT
    (bit i set when vec[lo+i] > 0). Runs unchanged in Spark and DuckDB
    except for the fold builtin, so Spark/DuckDB variants share the CASE."""
    return (
        f"aggregate(transform(sequence(1, 32), i -> "
        f"CASE WHEN element_at({vec}, i + {lo}) > CAST(0.0 AS FLOAT) "
        f"THEN shiftleft(CAST(1 AS BIGINT), i - 1) ELSE CAST(0 AS BIGINT) END), "
        f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
    )


def binary_hamming_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Top-k nearest neighbors by Hamming distance over 1-bit sign
    signatures (binary quantization — the most aggressive ANN compression:
    64-dim float32 vectors become 16 bytes, a 16x bandwidth cut, and the
    scorer is two XOR+popcount ops inside whole-stage codegen, no float
    math at all). Same broadcast-query/map-only-score/one-rank-shuffle
    shape as quantized_topk; ties break on cand_id. Entirely integer —
    exactly replayable by a SQL oracle."""
    def sig(df: DataFrame, prefix: str) -> DataFrame:
        return df.select(
            F.col(id_col).alias(f"{prefix}_id"),
            F.expr(_sign_half_sql(vec_col, 0)).alias(f"{prefix}_h1"),
            F.expr(_sign_half_sql(vec_col, 32)).alias(f"{prefix}_h2"),
        )

    c = sig(spread(corpus, id_col), "cand")
    q = sig(queries, "query")
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("cand_id") != F.col("query_id"))
        .select(
            "query_id",
            "cand_id",
            F.expr(
                "bit_count(cand_h1 ^ query_h1) + bit_count(cand_h2 ^ query_h2)"
            )
            .cast("int")
            .alias("hamming"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("hamming"), F.asc("cand_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id", "cand_id", "hamming", F.col("rank").cast("int").alias("rank")
        )
    )
