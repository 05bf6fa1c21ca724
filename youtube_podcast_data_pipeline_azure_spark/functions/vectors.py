"""Vector math over ``array<float>`` embedding columns.

Engine extension for similarity search (north star, BASELINE.json).
All pure Column expressions built on higher-order functions
(``zip_with`` / ``aggregate``) — executed JVM-side per row, no Python.
For batch KNN against many query vectors the operators.similarity
module combines these with a broadcast join; for very wide vectors a
Pandas-UDF/numpy path is provided there as the vectorized alternative.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ (double)."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column | str) -> Column:
    """‖a‖₂ (double)."""
    a = F.col(a) if isinstance(a, str) else a
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x)
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """cos(a, b) ∈ [-1, 1]; null-safe on zero-norm vectors."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom)
