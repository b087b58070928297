"""Structured Streaming windowed aggregations (SURVEY §2.9 note).

The reference has no time windows (frame index = event tick); these are
the engine's streaming generalization of its per-tick processing:
tumbling/sliding windows + watermark (the max_age ageing analog, T4/T5)
and session windows over the `events` stream.

All functions take a *streaming* DataFrame (spark.readStream...) and
return the transformed streaming DataFrame — sinks are the caller's
choice (tests use the memory sink + processAllAvailable).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_tumbling_agg(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling (or sliding, if `slide` given) event-time window counts
    + sums per event_type, with late-data watermark."""
    win = (
        F.window("ts", window_duration, slide)
        if slide
        else F.window("ts", window_duration)
    )
    return (
        events.withWatermark("ts", watermark)
        .groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def streaming_session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Session windows with an inactivity gap per user — the streaming
    form of the batch sessionization in q_session_window."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


def streaming_dedup(
    events: DataFrame,
    key_cols: list[str],
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Exactly-once key dedup on a stream: `dropDuplicatesWithinWatermark`
    keeps the first arrival per key and drops re-deliveries that arrive
    within the watermark horizon — the streaming form of the exact-dedup
    path (q_dedup_exact), with state automatically expired past the
    watermark (bounded memory; a plain dropDuplicates on a stream would
    keep every key forever)."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    upper: str = "15 minutes",
    watermark: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with an event-time interval condition
    (the attribution shape: right events within [left_ts, left_ts +
    upper] for the same key).

    Watermarks on BOTH inputs plus the closed time-range predicate are
    what make this runnable forever at scale: they bound the join
    state — a buffered left row is evicted once the right watermark
    passes `left_ts + upper`, so state size tracks the interval, not
    the stream length. Without the range condition Spark must keep
    every row indefinitely (unbounded state = eventual OOM at 100 TB
    equivalents). Inputs are aliased `l`/`r`; both sides' columns
    survive into the result for the caller to project.
    """
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}")
        )
    )
    return l.join(r, cond, how)
