"""Connected components via distributed min-label propagation.

The last mile of near-duplicate deduplication: candidate pairs (from
minhash bands, shingle Jaccard, or embedding similarity) form an
undirected graph, and each document keeps only one representative per
connected component. At 100 TB the component structure cannot live on
one machine — label propagation runs as a sequence of join+aggregate
rounds, converging in O(graph diameter) iterations (near-dup graphs
are shallow: chains of transitive duplicates, diameter rarely > a few
hops).

Scale mechanics:
* every iteration is one shuffle (edge ⋈ label join + min-aggregate);
* `localCheckpoint` after each round truncates the lineage — without
  it the plan doubles per iteration and the job dies on planning time
  long before data size matters (the classic iterative-Spark trap);
* convergence is checked with a `limit(1)` existence probe, not a full
  count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iterations: int = 20,
) -> DataFrame:
    """Label each node with the minimum node id of its component.

    `edges` is undirected (symmetrized internally). Returns
    (node, component). Deterministic: the component id is the smallest
    member id, independent of partitioning or iteration order.
    """
    # Checkpoint the symmetrized edge list ONCE: it is re-joined every
    # round, and without lineage truncation each iteration would re-run
    # the (possibly expensive) edge-derivation plan from the scan.
    sym = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).union(
        edges.select(F.col(dst).alias("src"), F.col(src).alias("dst"))
    ).localCheckpoint()
    nodes = sym.select(F.col("src").alias("node")).distinct()
    labels = nodes.withColumn("label", F.col("node")).localCheckpoint()

    converged = False
    for _ in range(max_iterations):
        nbr_min = (
            sym.join(labels, sym["dst"] == labels["node"])
            .groupBy(sym["src"].alias("node"))
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(nbr_min, "node", "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_min"), F.col("label"))
                ).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .filter(F.col("n.label") != F.col("o.label"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            converged = True
            break
    if not converged:
        # Truncated labels look like extra components — silently wrong
        # results are worse than failing (the oracle computes the exact
        # closure). Diameter > max_iterations is the only cause.
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations — raise max_iterations (graph diameter exceeds it)"
        )
    return labels.select("node", F.col("label").alias("component"))
