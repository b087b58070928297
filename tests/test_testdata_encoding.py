"""Guards against driver-testdata encoding drift.

Round 3 regression: the driver regenerated /root/testdata with
`events.ts` as parquet timestamp[us] (isAdjustedToUTC=false), which
Spark 4 reads as TIMESTAMP_NTZ; every `unix_millis("ts")` call site
then failed analysis — while the unit suite stayed green because it
exercised synthetic fixtures, not the real parquet. These tests load
the REAL testdata so the suite goes red the moment the driver's
encoding drifts again.
"""

from __future__ import annotations


from iceberg_tracking_spark.plans.registry import DRIVER_PRIORITY, QUERIES
from iceberg_tracking_spark.schemas import SYNTHETIC_TABLES
from iceberg_tracking_spark.sources.tables import load_table


def test_events_ts_normalizes_to_timestamp(spark, sf_dir):
    """Whatever the parquet encoding, post-load `ts` must be TIMESTAMP
    (not TIMESTAMP_NTZ, not bigint) so unix_millis() resolves."""
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    # And epoch math must actually analyze + execute on the real file.
    from pyspark.sql import functions as F

    row = df.select(F.max(F.unix_millis("ts")).alias("mx")).first()
    assert row["mx"] is not None


def test_all_tables_load(spark, sf_dir):
    for t in SYNTHETIC_TABLES:
        assert load_table(spark, sf_dir, t).columns, t


# (The per-query "analyzes on real testdata" sweep was removed in r13:
# tests/test_queries_vs_oracle.py EXECUTES every registered query on
# the same real parquet — execution strictly subsumes analysis, so the
# 239-parameter sweep was pure duplicate coverage inside a pytest
# budget the driver's VERIFY window no longer afforded. The encoding
# canaries below keep the original r3 failure mode covered directly.)


def test_driver_priority_names_resolve():
    missing = [n for n in DRIVER_PRIORITY if n not in QUERIES]
    assert not missing, f"DRIVER_PRIORITY references unknown queries: {missing}"
