"""Invariant tests for the iterative k-means operator.

The full Lloyd loop is rows-only at the driver gate (iteration is not
SQL-expressible — SURVEY §5); the single-step relational core IS
oracle-checked (`q_kmeans_step`). These tests pin what the oracle
can't: determinism across runs, monotone objective descent, argmin
consistency of the final assignment, and empty-cluster survival.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iceberg_tracking_spark.operators.clustering import (
    assign_clusters,
    kmeans,
    update_centroids,
)
from iceberg_tracking_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def vectors(spark, sf_dir):
    return (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", F.col("embedding").cast("array<double>").alias("e"))
        .cache()
    )


def _objective(assigned) -> float:
    return assigned.agg(F.sum("dist")).collect()[0][0]


def test_kmeans_deterministic_across_runs(vectors):
    _, a1 = kmeans(vectors, k=4, n_iter=2)
    _, a2 = kmeans(vectors, k=4, n_iter=2)
    r1 = sorted((r["vec_id"], r["cid"]) for r in a1.collect())
    r2 = sorted((r["vec_id"], r["cid"]) for r in a2.collect())
    assert r1 == r2


def test_kmeans_objective_non_increasing(vectors):
    objs = []
    for n in (1, 3, 5):
        _, assigned = kmeans(vectors, k=4, n_iter=n)
        objs.append(_objective(assigned))
    assert objs[1] <= objs[0] + 1e-6
    assert objs[2] <= objs[1] + 1e-6


def test_kmeans_assignment_is_argmin(vectors):
    cents, assigned = kmeans(vectors, k=4, n_iter=2)
    re_assigned = assign_clusters(vectors, cents)
    got = {r["vec_id"]: r["cid"] for r in assigned.collect()}
    want = {r["vec_id"]: r["cid"] for r in re_assigned.collect()}
    assert got == want
    n_vecs = vectors.count()
    assert len(got) == n_vecs  # every vector assigned exactly once


def test_kmeans_keeps_k_centroids_with_empty_clusters(spark, vectors):
    # k larger than the natural cluster count forces empties; the
    # centroid table must still come back with exactly k rows.
    cents, _ = kmeans(vectors.limit(6), k=5, n_iter=3)
    assert cents.count() == 5
    assert cents.select("cid").distinct().count() == 5


def test_update_centroids_is_elementwise_mean(spark):
    df = spark.createDataFrame(
        [
            (1, 0, [1.0, 10.0]),
            (2, 0, [3.0, 30.0]),
            (3, 1, [5.0, 50.0]),
        ],
        "vec_id INT, cid INT, e ARRAY<DOUBLE>",
    )
    out = {
        r["cid"]: (list(r["ce"]), r["n_members"])
        for r in update_centroids(df).collect()
    }
    assert out[0] == ([2.0, 20.0], 2)
    assert out[1] == ([5.0, 50.0], 1)


def test_kmeans_rejects_fewer_rows_than_k(vectors):
    with pytest.raises(ValueError, match="k=50"):
        kmeans(vectors.limit(10), k=50, n_iter=1)


def test_salted_join_rejects_right_and_full(spark):
    from iceberg_tracking_spark.operators.joins import salted_join

    probe = spark.range(4).selectExpr("id AS k")
    build = spark.range(2).selectExpr("id AS k")
    for how in ("right", "full", "outer"):
        with pytest.raises(ValueError, match="inner/left"):
            salted_join(probe, build, key="k", how=how)
