from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from iceberg_tracking_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


def pytest_collection_modifyitems(config, items):
    """Run the all-queries oracle suite FIRST (r12 verdict task #3).

    The driver's VERIFY step runs pytest inside a bounded window; in
    r12 the run was cut off at ~84% with the alphabetically-late
    oracle suite (test_queries_vs_oracle — the local replica of the
    driver's correctness gate, the single highest-value file) not yet
    demonstrably complete. Ordering is correctness-neutral: every test
    uses the same session-scoped spark fixture and no test depends on
    another's side effects.
    """
    front = [i for i in items if "test_queries_vs_oracle" in i.nodeid]
    rest = [i for i in items if "test_queries_vs_oracle" not in i.nodeid]
    items[:] = front + rest


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app_name="tests", shuffle_partitions=8)
    yield s


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
