"""Random-sign (Achlioptas/Johnson–Lindenstrauss) projection of embedding
columns: out[j] = Σ_i s(i, j) · x[i] with s ∈ {+1, −1}.

The standard cheap dimensionality reduction in front of LSH / clustering at
scale: projecting 64 → 16 dims cuts every downstream shuffle and signature
computation 4× while approximately preserving pairwise geometry (the JL
guarantee; preservation on the real corpus is pinned in tests).

Determinism contract: the sign matrix is a pure function of (i, j) —
s(i, j) = +1 iff the first hex digit of md5(f"{i}_{j}") is even — so the
DuckDB oracle regenerates the identical matrix from the same rule in SQL
(instr-hex parity), no literal exchange needed. Each output coordinate is
an ORDERED left fold over doubles (matches DuckDB's SUM(... ORDER BY i)
exactly — the same convention as functions/vector.py).

On the Spark side the matrix is precomputed once driver-side (out_dims ×
in_dims ints, trivially small) and embedded as a plan literal: evaluating
md5 1024 times per ROW would put a hash in the hot loop for what is a
constant.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def sign(i: int, j: int) -> int:
    """+1 iff the first hex digit of md5(f"{i}_{j}") is even."""
    d = hashlib.md5(f"{i}_{j}".encode()).hexdigest()[0]
    return 1 if int(d, 16) % 2 == 0 else -1


def random_sign_matrix(in_dims: int, out_dims: int) -> list[list[int]]:
    """out_dims rows of in_dims signs."""
    return [[sign(i, j) for i in range(in_dims)] for j in range(out_dims)]


def projection_sql(vec_col: str, in_dims: int = 64, out_dims: int = 16) -> str:
    """SQL expression: array of out_dims ordered-fold projections of
    `vec_col` (the sign matrix inlined as a plan literal)."""
    mat = random_sign_matrix(in_dims, out_dims)
    rows = ", ".join(
        "array(" + ", ".join(f"{s}D" for s in row) + ")" for row in mat
    )
    return (
        f"transform(array({rows}), srow -> "
        f"aggregate(zip_with(srow, {vec_col}, (s, x) -> s * CAST(x AS DOUBLE)), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v))"
    )


def project_signs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    in_dims: int = 64,
    out_dims: int = 16,
) -> DataFrame:
    """(id, proj) with proj[j] = ordered-fold Σ_i s(i,j)·x[i]. Map-only."""
    return df.select(
        F.col(id_col),
        F.expr(projection_sql(vec_col, in_dims, out_dims)).alias("proj"),
    )
