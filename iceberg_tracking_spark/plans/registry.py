"""Driver-facing query registry.

Each named query pairs a PySpark callable `(spark, sf_dir) -> DataFrame`
with the equivalent ANSI SQL for the DuckDB oracle. Column names are
aliased identically on both sides (the driver sorts columns by name
before value-hashing). Floating aggregates are rounded on BOTH sides so
cross-engine summation-order differences cannot flip the hash.

Queries whose semantics are not SQL-expressible (greedy NMS, the
stateful tracker, approximate sketches) register with `oracle=None` →
the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None
    doc: str


QUERIES: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None):
    """Decorator registering a driver query (and optional oracle SQL)."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = QueryDef(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {n: q.fn for n, q in QUERIES.items()}


def get_oracles() -> dict[str, str]:
    return {n: q.oracle for n, q in QUERIES.items() if q.oracle is not None}
