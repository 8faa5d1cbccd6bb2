"""Vector math over ARRAY<FLOAT/DOUBLE> embedding columns.

Native higher-order-function expressions (zip_with / aggregate) — each dot
product runs inside codegen on the JVM, no Python transfer. For very wide
vectors or very hot paths a Pandas-UDF/numpy variant can win on SIMD; these
array exprs are the portable default and the oracle-checkable baseline.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_expr(a: Column | str, b: Column | str) -> Column:
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_expr(a: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(_c(a), F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_expr(a: Column | str, b: Column | str) -> Column:
    """Cosine similarity; 0.0 when either norm is zero (guarded — no
    ANSI-mode division error)."""
    a, b = _c(a), _c(b)
    denom = norm_expr(a) * norm_expr(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot_expr(a, b) / denom)


def l2_distance_expr(a: Column | str, b: Column | str) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(_c(a), _c(b), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def unit_expr(a: Column | str) -> Column:
    """L2-normalized copy (zero vectors pass through unchanged)."""
    a = _c(a)
    n = norm_expr(a)
    return F.when(n == 0.0, a).otherwise(
        F.transform(a, lambda v: v / n)
    )


def int8_quantize_expr(a: Column | str) -> Column:
    """Symmetric per-vector int8 quantization: ARRAY<BIGINT> with
    q_i = round(x_i / scale), scale = max|x| / 127 (zero vectors quantize
    to zeros). The memory lever for 100 TB embedding stores — 4x smaller
    than float32 at rest and in shuffle.

    COSINE over quantized vectors needs no scale at all (per-vector scales
    cancel in the ratio), so quantized scoring is pure INTEGER arithmetic
    until the final division — bit-exact across engines by construction,
    which is what lets `v_cosine_topk_int8` carry an exact SQL oracle.
    For dot-product scoring keep `int8_scale_expr` alongside the codes."""
    a = _c(a)
    scale = int8_scale_expr(a)
    return F.transform(
        a,
        lambda v: F.when(scale == 0.0, F.lit(0))
        .otherwise(F.round(v / scale))
        .cast("long"),
    )


def int8_scale_expr(a: Column | str) -> Column:
    """The per-vector dequantization scale max|x|/127 (DOUBLE)."""
    a = _c(a)
    return (
        F.array_max(F.transform(a, lambda v: F.abs(v))) / F.lit(127.0)
    ).cast("double")


def int_dot_expr(a: Column | str, b: Column | str) -> Column:
    """Integer dot product of two quantized vectors (BIGINT — exact)."""
    return F.aggregate(
        F.zip_with(_c(a), _c(b), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def quantized_cosine_expr(qa: Column | str, qb: Column | str) -> Column:
    """Cosine over int8 codes: integer dot / integer norms, one float
    division at the end; 0.0 when either vector quantized to zeros."""
    qa, qb = _c(qa), _c(qb)
    denom = F.sqrt(int_dot_expr(qa, qa).cast("double")) * F.sqrt(
        int_dot_expr(qb, qb).cast("double")
    )
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(
        int_dot_expr(qa, qb).cast("double") / denom
    )


def random_projection_matrix(
    in_dim: int, out_dim: int, seed: int = 1
) -> list[list[float]]:
    """Deterministic Achlioptas-style ±1 sign matrix (Achlioptas 2003:
    database-friendly random projections — ±1 entries satisfy the
    Johnson-Lindenstrauss lemma with the same distortion bounds as
    Gaussian matrices and multiply-free arithmetic). Rows are generated
    by a fixed LCG seeded per (seed, row), so the matrix is a pure
    function of (in_dim, out_dim, seed): the SAME literal matrix can be
    inlined into Spark expressions and oracle SQL (the `PLANES`
    precedent) and regenerated bit-identically on any driver."""
    if in_dim < 1 or out_dim < 1:
        raise ValueError(f"dims must be >= 1, got {in_dim}x{out_dim}")
    rows = []
    for j in range(out_dim):
        h = (seed * 1000003 + j * 7919 + 12345) % 2147483647
        row = []
        for _ in range(in_dim):
            h = (h * 1103515245 + 12345) % 2147483647
            row.append(1.0 if (h >> 7) & 1 else -1.0)
        rows.append(row)
    return rows


def random_project_expr(
    vec: Column | str, matrix: list[list[float]]
) -> Column:
    """ARRAY<DOUBLE> Johnson-Lindenstrauss projection of an embedding
    onto `len(matrix)` output dimensions: out[j] = <vec, matrix[j]> /
    sqrt(out_dim) — with a ±1 `random_projection_matrix` this preserves
    pairwise distances within JL distortion while cutting the stored
    / shuffled embedding width (the cheap pre-LSH / pre-cluster
    shrinker for 100 TB embedding stores).

    Pure higher-order-function arithmetic: one zip_with + fold per
    output dimension over literal sign rows — stays in whole-stage
    codegen, no Python, exactly replayable (left-to-right fold order
    matches the oracle's list_sum). Keep out_dim modest (<= 32): the
    expression tree grows as out_dim × in_dim literals (the janino
    64KB-per-method boundary, see the check_contract gotchas)."""
    import math

    if not matrix:
        raise ValueError("matrix must be non-empty")
    scale = 1.0 / math.sqrt(len(matrix))
    comps = [
        dot_expr(_c(vec), F.array(*[F.lit(x) for x in row])) * F.lit(scale)
        for row in matrix
    ]
    return F.array(*comps)
