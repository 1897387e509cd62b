"""Vector math over ``array<float>`` embedding columns — extension layer.

All pure higher-order-function expressions (JVM-side, codegen'd): no Python
crossing per row, which is what makes brute-force similarity viable at
cluster scale (the dot product of a 10-billion-row embedding table is a
single scan + reduce, no shuffle).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["dot_product", "l2_norm", "cosine_similarity"]


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot_product(a: Column | str, b: Column | str) -> Column:
    """sum_i a[i]*b[i] via zip_with + aggregate (no UDF)."""
    prods = F.zip_with(_c(a), _c(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column | str) -> Column:
    sq = F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x * x)
    return F.sqrt(sq)


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """dot(a,b) / (|a|*|b|); NULL if either norm is zero."""
    num = dot_product(a, b)
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, num / denom).otherwise(F.lit(None))
