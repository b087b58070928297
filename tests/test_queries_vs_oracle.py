"""Every declared oracle-checked query must match DuckDB at sf0.001.

This is a local replica of the driver's t2 correctness gate
(CORRECTNESS_r{N}.json): row count + column names + order-insensitive
values.
"""

from __future__ import annotations

import pytest

from iceberg_tracking_spark.plans import QUERIES

from .oracle_harness import compare, duck_connection

ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duck_connection(sf_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, duck, name):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    odf = duck.execute(q.oracle).fetchdf()
    issues = compare(sdf, odf)
    assert not issues, f"{name}: " + "; ".join(issues[:5])


def test_no_rows_only_queries_remain():
    """Since r5 every registered query carries an oracle (the stub
    decode re-derives via md5 arithmetic). Keep it that way: a new
    `oracle=None` registration must be a conscious decision, not a
    default."""
    assert ROWS_ONLY_QUERIES == [], (
        f"queries registered without an oracle: {ROWS_ONLY_QUERIES}"
    )
