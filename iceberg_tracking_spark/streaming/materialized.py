"""Incrementally-maintained rollups: streaming deltas into a
materialized aggregate table.

The 100 TB shape this serves: a dashboard table like
`per (user, event_type): total value, event count` over an unbounded
stream. Recomputing it per batch is O(history); maintaining it is
O(delta). Each micro-batch aggregates ONLY its own rows (map-side
partial agg, tiny shuffle on the delta keys) and folds them into the
table with `VersionedTable.merge_aggregate` (old + delta per column).

Exactly-once: foreachBatch re-delivers a batch after a failure, and an
additive merge applied twice double-counts — so the merge is gated on
the Structured Streaming `batch_id`, persisted next to the table. A
replayed batch id is skipped, making the sink idempotent (the same
pattern Delta/Iceberg streaming sinks use with their txn metadata).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.catalog import VersionedTable


def _marker_path(table: VersionedTable) -> str:
    return os.path.join(table.base, "_last_merged_batch")


def last_merged_batch(table: VersionedTable) -> int:
    try:
        with open(_marker_path(table)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        return -1


def make_merge_fn(
    table: VersionedTable, key_cols: list[str], value_col: str
):
    """The foreachBatch callable: (sum, count) delta of one micro-batch
    folded into `table`, gated on batch_id for replay idempotency.
    Exposed separately so redelivery behavior is directly testable."""

    def _merge(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_merged_batch(table):
            return  # redelivered batch: already folded in, skip
        delta = batch_df.groupBy(*key_cols).agg(
            F.sum(value_col).alias("sum_value"),
            F.count(F.lit(1)).alias("n_events"),
        )
        table.merge_aggregate(delta, key_cols, ["sum_value", "n_events"])
        tmp = _marker_path(table) + ".tmp"
        with open(tmp, "w") as f:
            f.write(str(batch_id))
        os.replace(tmp, _marker_path(table))

    return _merge


def incremental_rollup(
    stream: DataFrame,
    table: VersionedTable,
    key_cols: list[str],
    value_col: str,
    checkpoint: str,
):
    """Start a streaming query maintaining `table` as the running
    (sum, count) rollup of `value_col` per `key_cols`. Returns the
    StreamingQuery; callers own `stop()`."""
    return (
        stream.writeStream.foreachBatch(
            make_merge_fn(table, key_cols, value_col)
        )
        .option("checkpointLocation", checkpoint)
        .start()
    )
