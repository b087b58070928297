"""Distributed PCA via Gram-matrix aggregation.

The scale pattern (same as Spark MLlib's RowMatrix.computeGramianMatrix
+ local eigensolve): the cluster reduces X^T X — d(d+1)/2 upper-triangle
sums — and ONLY that d x d matrix reaches the driver, never the data.
For d = 64 that is 2080 doubles from a 100 TB table.

The Gram reduction here is fully relational and join-free: posexplode
each row's vector to (i, x_i), build the per-row upper-triangle products
with slice+transform (map-side array work), posexplode again, and hash-
aggregate on (i, j) — partial aggregation means the shuffle carries at
most 2080 rows per map partition regardless of input size. No UDF, no
self-join of the exploded relation (which would shuffle the whole
dataset x d).

Eigen-decomposition of the 64 x 64 result runs in numpy on the driver
(O(d^3), microseconds); projections go back as broadcast literal
component vectors folded with the same left-to-right dot used
everywhere else (operators/similarity.py:seq_dot).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .similarity import seq_dot


def gram_upper(vectors: DataFrame, dim: int, vec_col: str = "e") -> DataFrame:
    """Upper-triangle Gram sums: (gi, gj, g) with gi <= gj, 0-based.

    g[i][j] = sum over rows of x_i * x_j. Map-side explode work plus
    one tiny (i, j)-keyed aggregate; see module docstring.
    """
    ex = vectors.select(
        vec_col, F.posexplode(F.col(vec_col)).alias("i", "xi")
    )
    prods = ex.select(
        "i",
        F.posexplode(
            F.transform(
                F.slice(
                    F.col(vec_col),
                    F.col("i") + 1,
                    F.lit(dim) - F.col("i"),
                ),
                lambda y: F.col("xi") * y,
            )
        ).alias("dj", "p"),
    )
    return prods.groupBy(
        F.col("i").cast("long").alias("gi"),
        (F.col("i") + F.col("dj")).cast("long").alias("gj"),
    ).agg(F.sum("p").alias("g"))


def pca_components(vectors: DataFrame, dim: int, k: int, vec_col: str = "e"):
    """Top-k principal axes of the (uncentered-optional) data.

    Centers the data by subtracting the mean vector (computed in the
    same pass shape), eigensolves the 64x64 covariance on the driver,
    and returns (components, explained_variance) as plain numpy — the
    d x k matrix is driver-scale by construction.
    """
    import numpy as np

    # One pass yields both the mean vector and n — no separate count()
    # scan. n = max per-position count: deterministic regardless of
    # which grouped row collects first (a "first row's count" would
    # depend on shuffle partitioning for ragged/NULL-element inputs).
    mean_rows = (
        vectors.select(F.posexplode(F.col(vec_col)).alias("i", "xi"))
        .groupBy("i")
        .agg(F.avg("xi").alias("m"), F.count("xi").alias("cnt"))
        .collect()
    )
    n = max((r["cnt"] for r in mean_rows), default=0)
    if n == 0:
        raise ValueError("pca_components: no vector elements to reduce")
    mu = np.zeros(dim)
    for r in mean_rows:
        mu[r["i"]] = r["m"]
    gram_rows = gram_upper(vectors, dim, vec_col).collect()
    g = np.zeros((dim, dim))
    for r in gram_rows:
        g[r["gi"], r["gj"]] = r["g"]
        g[r["gj"], r["gi"]] = r["g"]
    cov = g / n - np.outer(mu, mu)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # k x d
    # sign convention: largest-|coord| entry positive → deterministic
    for c in comps:
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c *= -1
    return comps, evals[order]


def pca_project(
    vectors: DataFrame,
    components,
    mu=None,
    vec_col: str = "e",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project rows onto the given components (k literal axis vectors,
    broadcast into the plan as array literals — no join, no UDF).

    The centered vector is materialized ONCE via withColumn before the
    k dot products — Catalyst does not CSE inside higher-order-function
    lambdas, so inlining the zip_with per component would re-subtract
    the mean k times (the shingle-pipeline lesson)."""
    if mu is not None:
        mu_arr = F.array(*[F.lit(float(m)) for m in mu])
        vectors = vectors.withColumn(
            "_centered", F.zip_with(F.col(vec_col), mu_arr, lambda x, m: x - m)
        )
        src = "_centered"
    else:
        src = vec_col
    out = [F.col(id_col)]
    for ci, comp in enumerate(components):
        axis = F.array(*[F.lit(float(x)) for x in comp])
        out.append(seq_dot(F.col(src), axis).alias(f"pc{ci}"))
    return vectors.select(*out)
