"""Driver contract for the spark-graft builder (PySpark target).

`entry(spark)` runs the flagship query on sf0.001; `queries()` /
`oracle_sql()` expose every implemented operator from SURVEY.md §2 and
the LLM-pipeline surface. The real definitions live in
`iceberg_tracking_spark/plans/` (one module per operator family), with
the oracle SQL co-located next to each Spark implementation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from iceberg_tracking_spark.plans import get_oracles, get_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    TPC-H-Q1-shaped aggregation (SURVEY §7.2): scan → filter pushdown →
    groupBy partial+final agg.
    """
    from iceberg_tracking_spark.plans.queries_core import q_sum_count

    return q_sum_count(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query — since r5 EVERY registered
    query has one (order-sensitive ops are checked through provable
    contract inputs; the stub decode re-derives via md5 arithmetic)."""
    return get_oracles()
