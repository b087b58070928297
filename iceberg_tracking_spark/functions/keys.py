"""Key/format scalar functions (SURVEY §2.7 X10, X11, X13).

Portable across engines: stable hashing goes through md5 (identical hex
in Spark and DuckDB) rather than engine-specific hash functions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def composite_key(frame: Column, obj_id: Column) -> Column:
    """`"{frame}_{id}"` embedding-store key (reference tracking.py:983-984)."""
    return F.concat_ws("_", frame.cast("string"), obj_id.cast("string"))


def zero_pad(col: Column, width: int = 6) -> Column:
    """`f"{int(x):06d}"` for numeric ids; non-numeric ids pass through.

    Mirrors reference helpers.py:368-373, which pads int-parseable frame
    ids and keeps image stems (e.g. '_MG_17310') verbatim. Without the
    guard, format_string renders a failed int cast as the literal
    string 'null'.
    """
    as_int = col.cast("int")
    return F.when(
        as_int.isNotNull(), F.format_string(f"%0{width}d", as_int)
    ).otherwise(col.cast("string"))


def stable_id_hash(*cols: Column) -> Column:
    """Deterministic, engine-portable 31-bit id from string parts.

    Replaces the reference's `hash(f"{seq}_{img}") % 2**31`
    (detection.py:338-340) with md5-derived bits so Spark and any SQL
    oracle agree: first 7 hex digits of md5 → int (< 2^28).
    """
    key = F.concat_ws("_", *[c.cast("string") for c in cols])
    return F.conv(F.substring(F.md5(key), 1, 7), 16, 10).cast("long")
