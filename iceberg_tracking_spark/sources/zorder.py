"""Z-order (Morton-curve) clustering for multi-column data skipping.

Partition pruning handles ONE leading sort column; a 100 TB table
queried by BOTH (user, time) or (x, y) needs its rows clustered so
parquet min/max stats stay tight on BOTH columns at once. Interleaving
the key bits onto a space-filling curve does exactly that: sorting by
the Morton z-value keeps rows that are close in (a, b) space close on
disk, so every file covers a small rectangle of the key space and a
predicate on either column skips most files (the same layout contract
as Iceberg's/Delta's OPTIMIZE ZORDER).

The z-value is pure Catalyst bit math — 2*bits shift/mask terms, fully
whole-stage-codegen'd, no UDF — and therefore oracle-checkable bit for
bit (`q_zorder`). The write path is `repartitionByRange` on the
z-value (contiguous, non-overlapping file ranges) + an in-partition
sort; `tests/test_zorder.py` asserts both the disjoint-range layout
from real parquet footers and that a point-ish predicate prunes files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_BITS = 16


def zvalue(a: Column, b: Column, bits: int = DEFAULT_BITS) -> Column:
    """Morton interleave of the low `bits` of two integer columns.

    Bit i of `a` lands at position 2i, bit i of `b` at 2i+1; result
    fits a long for bits <= 31. Inputs are masked to `bits` first so
    negative values (two's complement) cannot smear sign bits across
    the curve — mask-then-shift is identical in Spark and DuckDB.
    """
    mask = (1 << bits) - 1
    am = a.cast("long").bitwiseAND(F.lit(mask))
    bm = b.cast("long").bitwiseAND(F.lit(mask))
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftright(am, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i))
            + F.shiftright(bm, i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1))
        )
    return z


def duck_zvalue_sql(a: str, b: str, bits: int = DEFAULT_BITS) -> str:
    """DuckDB expression computing the identical Morton z-value."""
    mask = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(
            f"((({a} & {mask}) >> {i}) & 1) * {1 << (2 * i)}"
        )
        terms.append(
            f"((({b} & {mask}) >> {i}) & 1) * {1 << (2 * i + 1)}"
        )
    return "(" + " + ".join(terms) + ")"


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = DEFAULT_BITS,
) -> None:
    """Write `df` as parquet clustered on the (col_a, col_b) z-curve.

    `repartitionByRange` on the z-value gives files with contiguous,
    non-overlapping z ranges (range exchange samples the distribution,
    so files are also size-balanced under skew); the in-partition sort
    tightens every column's min/max footer stats within each file. The
    `_z` column is kept in the output: a reader can push a z-range
    predicate derived from a (a, b) rectangle and let parquet
    row-group stats do the skipping.
    """
    z = zvalue(F.col(col_a), F.col(col_b), bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
