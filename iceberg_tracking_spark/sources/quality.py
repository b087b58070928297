"""Write-path data-quality gate (Deequ-style "verify before publish").

q_expectations (plans/queries_curation.py) computes constraint audits as
a query; this module turns the same idea into a CIRCUIT BREAKER on the
write path: evaluate a set of expectations in ONE aggregation pass over
the outgoing DataFrame and refuse to commit the snapshot if any fails.
At 100 TB the single-pass property matters — the checks add one scan,
not one scan per rule, and the gate runs BEFORE the copy-on-write, so a
bad batch never becomes a version other readers can see (no
write-then-rollback window).

Expectations are SQL boolean aggregate expressions, e.g.:

    {"no_null_keys":  "count_if(k IS NULL) = 0",
     "value_in_band": "min(v) >= 0 AND max(v) <= 1e6",
     "min_volume":    "count(*) >= 100"}
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .catalog import VersionedTable


class QualityGateError(RuntimeError):
    """Raised when a gated write fails its expectations; carries the
    failing rule names in `failures`."""

    def __init__(self, failures: list[str]):
        self.failures = failures
        super().__init__(
            "quality gate failed: " + ", ".join(failures)
        )


def evaluate_expectations(df: DataFrame, checks: dict[str, str]) -> dict[str, bool]:
    """Evaluate every expectation in ONE aggregation job. Returns
    {rule_name: passed}. An empty DataFrame evaluates the expressions
    over zero rows (count(*) = 0, min/max NULL) — write rules
    accordingly (`count(*) >= n` makes emptiness an explicit failure)."""
    if not checks:
        return {}
    row = df.agg(
        *[F.expr(expr).alias(name) for name, expr in checks.items()]
    ).first()
    # NULL (e.g. min() over zero rows inside a comparison) is a failure,
    # not a pass — unknown is not acceptance on a publish gate.
    return {name: bool(row[name]) for name in checks}


def checked_write(
    table: VersionedTable,
    df: DataFrame,
    checks: dict[str, str],
    **write_kwargs,
) -> int:
    """Commit `df` as a new snapshot ONLY if every expectation passes;
    otherwise raise QualityGateError and leave the table untouched."""
    results = evaluate_expectations(df, checks)
    failures = sorted(name for name, ok in results.items() if not ok)
    if failures:
        raise QualityGateError(failures)
    return table.write(df, **write_kwargs)
