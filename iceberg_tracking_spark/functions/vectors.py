"""Vector/array column expressions (SURVEY §2.7 X4, X6, X7).

Native `aggregate`/`zip_with` array expressions keep the similarity
math JVM-side. For very wide vectors in the hottest loops, the
similarity operators in `operators/similarity.py` switch to Arrow-
batched numpy (mapInPandas) — but these column forms are the default
and are what the SQL-checkable queries use.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ over two array<numeric> columns (double math)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """cos(a,b) with 0-guard for zero-norm vectors."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0, dot_product(a, b) / denom).otherwise(F.lit(0.0))


def rescaled_cosine(a: Column, b: Column) -> Column:
    """`(cos + 1) / 2` → [0, 1], the reference's appearance similarity
    (reference feature_extraction.py:255-297)."""
    return (cosine_similarity(a, b) + F.lit(1.0)) / F.lit(2.0)


def min_max_normalize(v: Column, lo: Column, hi: Column) -> Column:
    """`(v - lo) / (hi - lo)` (reference feature_extraction.py:362-378).

    NOTE: call sites in the reference can produce values outside [0,1]
    (tracking.py:896-911) — deliberately no clamping here either.
    """
    rng = hi - lo
    return F.when(rng != 0, (v - lo) / rng).otherwise(F.lit(0.0))


def weighted_score(scores: list[Column], weights: list[float]) -> Column:
    """Weighted mean normalized by Σw (reference feature_extraction.py:335-359)."""
    total = sum(weights)
    acc = F.lit(0.0)
    for s, w in zip(scores, weights):
        acc = acc + s * F.lit(w)
    return acc / F.lit(total)
