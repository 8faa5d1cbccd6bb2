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
