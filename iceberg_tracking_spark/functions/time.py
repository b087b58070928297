"""Event-time access helpers.

Every epoch-math call site goes through these instead of raw
`F.unix_millis("ts")`, so a future testdata encoding drift (r3 broke 18
queries when `ts` arrived as TIMESTAMP_NTZ) is a one-line fix here.
`load_table` already normalizes `ts` to TIMESTAMP; the defensive cast
below is a no-op on TIMESTAMP input and additionally tolerates NTZ /
string inputs from user-supplied frames.

Reference semantics: frame ids derive from capture timestamps
(reference tracking.py:711-760 uses per-frame sequence indices); the
synthetic events table maps 1 hour -> 1 frame, 1 day -> 1 partition day.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MS_PER_HOUR = 3_600_000
MS_PER_DAY = 86_400_000


def _as_ts(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("timestamp")


def epoch_ms(col: Column | str = "ts") -> Column:
    """Milliseconds since epoch as BIGINT (UTC session tz assumed)."""
    return F.unix_millis(_as_ts(col))


def frame_id(col: Column | str = "ts") -> Column:
    """Synthetic frame id: one frame per hour of event time."""
    return F.floor(epoch_ms(col) / float(MS_PER_HOUR)).cast("long")


def day_id(col: Column | str = "ts") -> Column:
    """Synthetic day bucket: one per 24h of event time."""
    return F.floor(epoch_ms(col) / float(MS_PER_DAY)).cast("long")
