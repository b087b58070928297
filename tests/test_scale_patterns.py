"""Cluster-scale storage patterns, proven at the plan level.

Two techniques that matter at 100 TB but are invisible in small-data
correctness checks:

* **Bucketed co-located joins** — writing both join sides bucketed by
  the join key lets Spark join without ANY shuffle (no Exchange in the
  plan). This is how a 100 TB fact⋈fact join avoids moving both tables
  over the network every query.
* **Partition pruning** — a filter on the partition column must reduce
  the scan to the matching directories before any data is read
  (the distributed form of the reference's per-sequence directory
  layout, helpers.py:575-662).
"""

from __future__ import annotations

import io
from contextlib import redirect_stdout

from pyspark.sql import functions as F


def _plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    left = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(0, 10_000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    # warehouse.dir is a static conf — use external tables at an
    # explicit path instead.
    wh = str(tmp_path / "wh")
    for name, df in (("bkt_left", left), ("bkt_right", right)):
        (
            df.write.mode("overwrite")
            .bucketBy(8, "k")
            .sortBy("k")
            .option("path", f"{wh}/{name}")
            .saveAsTable(name)
        )
    try:
        a = spark.table("bkt_left")
        b = spark.table("bkt_right")
        # Disable broadcast so the join would otherwise shuffle both sides.
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = a.join(b, "k")
            plan = _plan_of(joined)
            assert "Exchange" not in plan, (
                "bucketed join still shuffles:\n" + plan
            )
            assert joined.count() == 10_000
        finally:
            spark.conf.set(
                "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
            )
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_left")
        spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_partition_pruning_skips_directories(spark, tmp_path):
    path = str(tmp_path / "parted")
    df = spark.range(0, 1000).select(
        (F.col("id") % 10).cast("string").alias("seq"), F.col("id").alias("v")
    )
    df.write.mode("overwrite").partitionBy("seq").parquet(path)
    back = spark.read.parquet(path).filter(F.col("seq") == "3")
    plan = _plan_of(back)
    # The partition filter must appear as scan-level pruning, not a
    # post-scan Filter over all partitions.
    assert "PartitionFilters" in plan
    assert "seq" in plan.split("PartitionFilters", 1)[1].splitlines()[0]
    assert back.count() == 100
    assert back.select(F.countDistinct("seq")).first()[0] == 1


def test_range_clustered_write_enables_file_skipping(spark, tmp_path):
    """Data clustering for scan pruning: writing with repartitionByRange
    + sortWithinPartitions gives each file a narrow min-max range on the
    cluster key, so a range filter touches a strict subset of files
    (parquet row-group stats skipping — the storage-level analog of
    partition pruning for high-cardinality keys, and the poor-man's
    Z-order for one dimension)."""
    path = str(tmp_path / "clustered")
    df = spark.range(0, 100_000).select(
        F.col("id").alias("k"), (F.col("id") % 97).alias("v")
    )
    (
        df.repartitionByRange(16, "k")
        .sortWithinPartitions("k")
        .write.mode("overwrite")
        .parquet(path)
    )
    back = spark.read.parquet(path)
    all_files = back.select(F.input_file_name()).distinct().count()
    hit_files = (
        back.filter((F.col("k") >= 10_000) & (F.col("k") < 15_000))
        .select(F.input_file_name())
        .distinct()
        .count()
    )
    assert all_files == 16
    assert hit_files <= 2, f"range filter touched {hit_files} of {all_files} files"
    assert back.filter((F.col("k") >= 10_000) & (F.col("k") < 15_000)).count() == 5_000
