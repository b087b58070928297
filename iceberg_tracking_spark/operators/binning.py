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
    max value. Returns a 1-column `edge` relation with ≤ n_bins-1 rows.
    When one value spans several rank-bins the same edge value appears
    ONCE PER RANK-BIN — the repeats are load-bearing, do not dedupe
    them: a value above a twice-repeated edge must count it twice
    (bin = number of edge ROWS strictly below), which is what skips
    the rank-bins the tie swallowed and keeps bin ids aligned with the
    rank formula (and with every SQL oracle that mirrors it).
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


def psi_from_counts(ref_counts: DataFrame, cur_counts: DataFrame) -> DataFrame:
    """PSI decomposition from a reference histogram (bin, n_ref) and a
    current histogram (bin, n_cur) — sum(psi_contrib) is the PSI. The
    single shared implementation behind the batch q_psi query and the
    streaming drift monitor, so their arithmetic cannot diverge. Each
    bin's log argument is ONE division of two exactly-derived integers
    (products widened to DECIMAL(38,0) before multiplying — counts can
    pass 2^63 at corpus scale); bins empty on either side contribute
    NULL by explicit contract (no 0-division / ln(0) divergence
    between engines). Population totals re-derive from the histograms
    themselves: every row lands in exactly one bin, so the sums equal
    the population counts."""
    dec = "decimal(38,0)"
    tot = ref_counts.agg(F.sum("n_ref").alias("nr")).crossJoin(
        cur_counts.agg(F.sum("n_cur").alias("nq"))
    )
    return (
        ref_counts.join(cur_counts, "bin", "full_outer")
        .select(
            "bin",
            F.coalesce("n_ref", F.lit(0)).alias("n_ref"),
            F.coalesce("n_cur", F.lit(0)).alias("n_cur"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n_ref",
            "n_cur",
            F.when(
                (F.col("n_ref") > 0) & (F.col("n_cur") > 0),
                F.round(
                    (
                        F.col("n_ref").cast("double") / F.col("nr")
                        - F.col("n_cur").cast("double") / F.col("nq")
                    )
                    * F.log(
                        (
                            F.col("n_ref").cast(dec) * F.col("nq").cast(dec)
                        ).cast("double")
                        / (
                            F.col("n_cur").cast(dec) * F.col("nr").cast(dec)
                        ).cast("double")
                    ),
                    6,
                ),
            ).alias("psi_contrib"),
        )
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
