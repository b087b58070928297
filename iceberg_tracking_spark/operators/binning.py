"""Equal-frequency reference binning — the shared core of the PSI
drift family (plans/queries_advanced.py:q_psi and streaming/drift.py).

The production drift-monitoring contract: bin EDGES are frozen once
from a reference population as EXACT order statistics (max value of
each rank-decile — not approximate percentiles, so any engine or any
rerun derives the identical edges), then every population — the
reference itself, a batch snapshot, each streaming micro-batch — is
re-bucketed by those same edges. Keeping edge derivation and bucket
assignment in one module is what guarantees the streamed monitor and
the batch query can never drift apart on boundary ties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import distributed_cumulative


def reference_edges(
    ref: DataFrame,
    value_col: str,
    key_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """The n_bins-1 upper edges of the reference's equal-frequency
    bins: rank every reference row with `distributed_cumulative`
    (total order = (value, key), no single-partition exchange), assign
    rank-bins floor((rank-1)*n_bins/N), and take each non-final bin's
    max value. Returns a 1-column `edge` relation with ≤ n_bins-1 rows
    (duplicate edges collapse when one value spans several rank-bins —
    both populations then agree the affected bins are empty).
    """
    ranked = distributed_cumulative(ref, [value_col, key_col], out_col="_rn")
    n = ref.agg(F.count(F.lit(1)).alias("_n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            value_col,
            F.expr(f"CAST(((_rn - 1) * {n_bins}) div _n AS INT)").alias("_b"),
        )
        .filter(F.col("_b") <= n_bins - 2)
        .groupBy("_b")
        .agg(F.max(value_col).alias("edge"))
        .select("edge")
    )


def assign_bin_by_edges(
    df: DataFrame,
    edges: DataFrame,
    value_col: str,
    out: str = "bin",
) -> DataFrame:
    """Per-row bucket assignment by the frozen edges: a row's bin is
    the number of edges STRICTLY below its value — a bounded
    (≤ n_bins-1 match) broadcast theta join counted per row, so rows
    below every edge keep bin 0 via the left join's count(NULL)=0.
    Rows of `df` must be distinct (they are grouped back by all their
    columns to fold the edge fan-out).
    """
    return (
        df.join(F.broadcast(edges), F.col(value_col) > F.col("edge"), "left")
        .groupBy(*df.columns)
        .agg(F.count("edge").alias(out))
    )


def bin_counts_by_edges(
    df: DataFrame,
    edges: DataFrame,
    value_col: str,
    key_col: str,
    out: str = "n",
) -> DataFrame:
    """Bucket every row by the frozen edges and count per bin (same
    strictly-below rule as `assign_bin_by_edges`, keyed per row by
    `key_col`). Returns (bin, `out`) with one row per occupied bin."""
    return (
        df.join(F.broadcast(edges), F.col(value_col) > F.col("edge"), "left")
        .groupBy(key_col)
        .agg(F.count("edge").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias(out))
    )
