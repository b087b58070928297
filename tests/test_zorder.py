"""Z-order write layout: disjoint file ranges + real file pruning.

The z-VALUE math is oracle-checked (`q_zorder`); these tests pin what
the oracle can't see — the physical layout contract of
`write_zordered` (sources/zorder.py) and that it actually skips files.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from iceberg_tracking_spark.sources.tables import load_table
from iceberg_tracking_spark.sources.zorder import write_zordered, zvalue


def _file_z_ranges(path: str) -> list[tuple[int, int]]:
    ranges = []
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.ParquetFile(f).metadata
        zi = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "_z"
        )
        lo = min(
            md.row_group(g).column(zi).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(zi).statistics.max
            for g in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    return sorted(ranges)


def test_zorder_files_have_disjoint_ranges(spark, sf_dir, tmp_path):
    path = str(tmp_path / "z")
    ev = load_table(spark, sf_dir, "events")
    write_zordered(ev, path, "user_id", "event_id", n_files=6)
    ranges = _file_z_ranges(path)
    assert len(ranges) >= 4
    for (_, hi_prev), (lo_next, _) in zip(ranges, ranges[1:]):
        assert hi_prev <= lo_next, ranges
    # roundtrip: clustering must not lose or duplicate rows
    assert spark.read.parquet(path).count() == ev.count()


def test_zorder_range_predicate_prunes_files(spark, sf_dir, tmp_path):
    path = str(tmp_path / "z")
    ev = load_table(spark, sf_dir, "events")
    write_zordered(ev, path, "user_id", "event_id", n_files=6)
    back = spark.read.parquet(path)
    n_total = back.select(F.input_file_name()).distinct().count()
    # a narrow z-range: everything below the global 10th-ish percentile
    cut = back.selectExpr("percentile_approx(_z, 0.1)").collect()[0][0]
    touched = (
        back.filter(F.col("_z") <= F.lit(int(cut)))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert touched < n_total, (touched, n_total)


def test_zvalue_matches_reference_interleave(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (-1, 2)],
        "a LONG, b LONG",
    )
    got = [
        r["z"]
        for r in df.select(
            zvalue(F.col("a"), F.col("b")).alias("z")
        ).collect()
    ]

    def ref(a: int, b: int, bits: int = 16) -> int:
        a &= (1 << bits) - 1
        b &= (1 << bits) - 1
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    want = [ref(a, b) for a, b in [(0, 0), (1, 0), (0, 1), (3, 5), (65535, 65535), (-1, 2)]]
    assert got == want


def test_zvalue_is_bijective_on_16bit_pairs(spark):
    """Property: interleaving is a bijection on (16-bit, 16-bit) pairs —
    deinterleaving the z-value recovers exactly (a & 0xffff, b & 0xffff),
    so no two distinct masked pairs share a curve position."""
    from hypothesis import given, settings, strategies as st

    # Pure-python mirror of the Catalyst expression, already pinned to
    # it by test_zvalue_matches_reference_interleave.
    def ref(a: int, b: int, bits: int = 16) -> int:
        a &= (1 << bits) - 1
        b &= (1 << bits) - 1
        z = 0
        for i in range(bits):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    def deinterleave(z: int, bits: int = 16) -> tuple[int, int]:
        a = b = 0
        for i in range(bits):
            a |= ((z >> (2 * i)) & 1) << i
            b |= ((z >> (2 * i + 1)) & 1) << i
        return a, b

    @settings(max_examples=300, deadline=None)
    @given(
        st.integers(min_value=-(2**62), max_value=2**62),
        st.integers(min_value=-(2**62), max_value=2**62),
    )
    def check(a, b):
        z = ref(a, b)
        assert 0 <= z < 1 << 32
        assert deinterleave(z) == (a & 0xFFFF, b & 0xFFFF)

    check()
