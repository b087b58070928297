"""Invariants for the distributed PCA path (Gram reduction is
oracle-checked as q_gram_matrix; the eigensolve/projection layer is
pinned here)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from iceberg_tracking_spark.operators.decomposition import (
    gram_upper,
    pca_components,
    pca_project,
)
from iceberg_tracking_spark.schemas import EMB_DIM
from iceberg_tracking_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .cache()
    )


def test_gram_matches_numpy(spark, vectors):
    x = np.array([r["e"] for r in vectors.collect()])
    want = x.T @ x
    got = np.zeros((EMB_DIM, EMB_DIM))
    for r in gram_upper(vectors, EMB_DIM).collect():
        got[r["gi"], r["gj"]] = r["g"]
        got[r["gj"], r["gi"]] = r["g"]
    assert np.allclose(got, want, atol=1e-6)


def test_gram_partials_multi_partition_and_null_skip(spark):
    """r12 internals change: gram_upper folds numpy X^T X partials per
    task instead of the Catalyst explode fan. Pin (a) partial sums
    across MANY partitions combine to the full-matrix numpy result and
    (b) NULL vectors contribute nothing (the posexplode-era semantics)."""
    import numpy as np

    rng = np.random.default_rng(7)
    x = rng.normal(size=(64, EMB_DIM))
    rows = [(i, [float(v) for v in x[i]]) for i in range(64)]
    rows.append((999, None))  # NULL vector: must be skipped, not crash
    df = spark.createDataFrame(rows, "vec_id long, e array<double>").repartition(16)
    got = np.zeros((EMB_DIM, EMB_DIM))
    for r in gram_upper(df, EMB_DIM).collect():
        got[r["gi"], r["gj"]] = r["g"]
        got[r["gj"], r["gi"]] = r["g"]
    assert np.allclose(got, x.T @ x, atol=1e-9)


def test_pca_components_orthonormal_and_sorted(vectors):
    comps, ev = pca_components(vectors, EMB_DIM, k=5)
    assert comps.shape == (5, EMB_DIM)
    assert np.allclose(comps @ comps.T, np.eye(5), atol=1e-8)
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(4))
    assert (ev >= -1e-9).all()


def test_pca_projection_variance_matches_eigenvalues(spark, vectors):
    comps, ev = pca_components(vectors, EMB_DIM, k=3)
    x = np.array([r["e"] for r in vectors.collect()])
    mu = x.mean(axis=0)
    proj = pca_project(vectors, comps, mu=mu).toPandas()
    for i in range(3):
        # population variance of the i-th projection == i-th eigenvalue
        v = proj[f"pc{i}"].to_numpy()
        assert abs(v.var() - ev[i]) < 1e-6 * max(1.0, ev[i])


def test_pca_deterministic_across_runs(vectors):
    c1, e1 = pca_components(vectors, EMB_DIM, k=4)
    c2, e2 = pca_components(vectors, EMB_DIM, k=4)
    assert np.allclose(c1, c2)
    assert np.allclose(e1, e2)
