"""Distributed PCA via Gram-matrix aggregation.

The scale pattern (same as Spark MLlib's RowMatrix.computeGramianMatrix
+ local eigensolve): the cluster reduces X^T X — d(d+1)/2 upper-triangle
sums — and ONLY that d x d matrix reaches the driver, never the data.
For d = 64 that is 2080 doubles from a 100 TB table.

The Gram reduction is an Arrow-batched numpy partial aggregation
(optimization guide §4.2: hand whole batches to vectorized native
code): each task accumulates X^T X over its batches with one BLAS
`x.T @ x` per batch and emits a single d(d+1)/2-row partial, so the
shuffle carries at most 2080 rows per task regardless of input size,
and the final hash aggregate sums the partials. No self-join of an
exploded relation (which would shuffle the whole dataset x d).

(History: through r11 this was a pure-Catalyst double-posexplode with
a slice+transform product fan. Higher-order functions are
CodegenFallback — every one of the n·d(d+1)/2 products paid
interpreted-expression overhead, measured r12 at ~2.0 s for 2000
64-dim rows at sf0.1 (~5 µs per product) vs ~0.3 s for the numpy
partial path computing the same sums; the shuffle shape is identical.
Summation grouping differs (per-batch BLAS partials vs per-row
products), which the 4-decimal display rounding absorbs exactly as it
already absorbed hash-aggregate arrival order.)

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

    g[i][j] = sum over rows of x_i * x_j. One numpy X^T X partial per
    task (NULL vectors contribute nothing, matching the previous
    explode semantics; vectors must be exactly `dim` wide — the
    operator's documented contract) plus one tiny (i, j)-keyed
    aggregate; see module docstring.
    """
    import numpy as np

    gi_idx, gj_idx = (a.astype("int64") for a in np.triu_indices(dim))

    def _partials(batches):
        import pandas as pd

        acc = np.zeros((dim, dim), dtype=np.float64)
        seen = False
        for pdf in batches:
            rows = [v for v in pdf[vec_col] if v is not None]
            if not rows:
                continue
            x = np.asarray([np.asarray(v, dtype=np.float64) for v in rows])
            if x.shape[1] != dim:
                raise ValueError(
                    f"gram_upper: vector width {x.shape[1]} != dim {dim}"
                )
            acc += x.T @ x
            seen = True
        if seen:
            yield pd.DataFrame(
                {"gi": gi_idx, "gj": gj_idx, "g": acc[gi_idx, gj_idx]}
            )

    partials = vectors.select(vec_col).mapInPandas(
        _partials, "gi bigint, gj bigint, g double"
    )
    return partials.groupBy("gi", "gj").agg(F.sum("g").alias("g"))


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
