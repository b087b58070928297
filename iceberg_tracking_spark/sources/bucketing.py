"""Bucketed-table co-location: the shuffle-free repeated-join path.

At 100 TB the fact-to-fact join (orders x lineitem on orderkey) is the
single most expensive shuffle in the pipeline, and it is re-paid by
every downstream job that joins the same keys. Hive-style bucketing
amortizes it ONCE at write time: both tables are written pre-hashed
into the same number of buckets on the join key (and sorted within
each bucket), so every later equi-join on that key is planned as a
sort-merge join with ZERO Exchange on either side — each bucket pair
joins locally on one executor. `tests/test_plans.py::
test_bucketed_join_has_no_exchange` pins that plan shape.

Bucket-count guidance at scale: pick `n_buckets` so one bucket of the
LARGER table is ~128-512 MB (e.g. 100 TB of lineitem at 256 MB →
~400k buckets is too many files; in practice partition by date first,
then 512-4096 buckets per partition). Both sides MUST use the same
bucket count — Spark only elides the shuffle when the bucket specs
match (or one side's count divides the other's with
`spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    n_buckets: int,
    sort_cols: str | list[str] | None = None,
) -> None:
    """Write `df` as a bucketed, in-bucket-sorted managed parquet table.

    Sorting within buckets on the join key makes the later sort-merge
    join skip its sort as well — the scan is already in merge order.
    """
    keys = [key] if isinstance(key, str) else list(key)
    sorts = sort_cols or keys
    sorts = [sorts] if isinstance(sorts, str) else list(sorts)
    (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, *keys)
        .sortBy(*sorts)
        .saveAsTable(table)
    )


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    key: str | list[str],
    how: str = "inner",
) -> DataFrame:
    """Join two tables previously written with `write_bucketed` on the
    same key and bucket count. The plan contains no Exchange: Spark
    reads each table's matching buckets as co-located partitions."""
    keys = [key] if isinstance(key, str) else list(key)
    return spark.table(left_table).join(spark.table(right_table), on=keys, how=how)
