"""Incrementally-maintained drift monitor: streaming micro-batches
folded into a per-bin count table against FROZEN reference edges.

The 100 TB shape: the reference histogram is built once (exact
order-statistic decile edges, operators/binning.py — the same code
path as the batch q_psi query, so streamed and batch monitors agree
on boundary ties by construction). Each arriving micro-batch is then
bucketed by those frozen edges and its per-bin counts are ADDED into
a maintained `(bin, n_cur)` table — O(delta) per batch, never a
rescan of history. PSI against the reference is a ≤n_bins-row
computation over the maintained table whenever anyone asks.

Exactly-once: per-bin counts are additive, so a redelivered batch
would double-count; each merge commits the (app_id, batch_id) txn
token inside the same atomic manifest swap as the data
(streaming/materialized.py pattern) and redelivery is a no-op.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.binning import bin_counts_by_edges
from ..sources.catalog import VersionedTable


def make_drift_merge_fn(
    table: VersionedTable,
    edges: DataFrame,
    app_id: str,
    value_col: str,
    key_col: str,
    expire_keep: int | None = 10,
):
    """The foreachBatch callable: bucket one micro-batch by the frozen
    `edges` and fold its per-bin counts into `table` (schema:
    bin, n_cur), gated on the manifest's (app_id, batch_id) token for
    replay idempotency."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= table.last_txn(app_id):
            return  # redelivered batch: already committed, skip
        delta = bin_counts_by_edges(
            batch_df, edges, value_col, key_col, out="n_cur"
        )
        table.merge_aggregate(delta, ["bin"], ["n_cur"], txn=(app_id, batch_id))
        if expire_keep is not None:
            table.expire(keep_last=expire_keep)

    return _merge


def psi_from_counts(ref_counts: DataFrame, cur_counts: DataFrame) -> DataFrame:
    """PSI decomposition from a frozen reference histogram (bin, n_ref)
    and the maintained current histogram (bin, n_cur) — the identical
    arithmetic contract as the batch q_psi query: one integer-ratio
    log argument per bin, empty-on-either-side bins contribute NULL."""
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
                        (F.col("n_ref") * F.col("nq")).cast("double")
                        / (F.col("n_cur") * F.col("nr")).cast("double")
                    ),
                    6,
                ),
            ).alias("psi_contrib"),
        )
    )
