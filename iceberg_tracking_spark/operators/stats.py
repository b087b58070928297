"""Multiple-testing / experimentation statistics operators.

The per-test statistics (z, chi2, KS, ...) live in the query layer as
relational programs; this module holds the FAMILY-level procedures
that operate on a relation of many tests at once — the step every
experimentation platform runs after computing one p-value per
segment/metric. Scale contract: a "family" can be millions of tests
(per-feature drift checks, per-segment readouts), so nothing here may
funnel through a single partition — global ranks ride
`distributed_cumulative`, scalars are 1-row aggregates combined back
broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .windows import distributed_cumulative


def bh_stepup(
    df: DataFrame,
    p_col: str,
    tiebreak_cols: list[str],
    alpha: float = 0.05,
    out_rank: str = "k",
    out_thresh: str = "bh_thresh",
    out_flag: str = "rejected",
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over a relation of tests.

    Adds three columns: the global p-value rank `k` (ascending, ties
    broken by `tiebreak_cols` — include enough columns for a total
    order), the per-rank threshold `k*alpha/m`, and the
    boolean BH decision: with k* = max{k : p_(k) <= k/m * alpha},
    reject exactly the tests ranked <= k*. Note the step-up subtlety
    this implements faithfully: a test whose OWN p exceeds its
    threshold is still rejected when a LATER rank satisfies its
    threshold (p_(k) <= p_(k*) for k <= k* by the rank order).

    Determinism: the threshold is deliberately NOT rounded — it is two
    correctly-rounded IEEE ops (one multiply, one divide) on exact
    integers and a literal, hence bit-identical on any engine, and a
    rounding grid would DISTORT the decision at large m (at m = 10^6,
    alpha = 0.05 the rank-10 threshold 5e-7 would round to 1e-6 —
    inflating FDR — while rank-1's 5e-8 would round to 0, never
    rejecting anything). The caller's p-values should still sit on a
    fixed grid (the house 6dp contract) because THEY come from
    transcendental chains; rank is a total order.

    Scale: m is ONE count aggregate; the rank is the two-pass
    distributed ranking (no single-partition window even at m ~ 10^6
    tests); k* is a 1-row scalar joined back broadcast. The input
    relation is materialized once (it feeds the rank, the scalar, and
    the output).
    """
    # THREE consumers of the test relation (the m-count aggregate, the
    # rank's percentile-boundary job, and the rank's main job) — and a
    # codegen cliff: the caller's p-value is typically a DEEP
    # expression (a z-score chain into a tail polynomial), which
    # CollapseProject would otherwise inline into every node of the
    # rank's bucket WHEN tree, blowing whole-stage codegen past the
    # JVM's 64 KB method limit (observed: janino InternalCompiler-
    # Exception + interpreted fallback on q_benjamini_hochberg).
    # Materializing once cuts the expression tree at a column boundary.
    # The NaN guard folds INTO the consumed p column (a standalone
    # check column would be pruned — the house Catalyst lesson):
    # validate_keys below catches NULL, but a 0/0 in the caller's
    # z-chain yields NaN, which Spark orders GREATEST — it would
    # silently take rank m, inflate m's denominator effect, and
    # deflate every threshold, the same silent-hazard class.
    df = df.withColumn(
        p_col,
        F.when(
            F.isnan(F.col(p_col)),
            F.assert_true(
                F.lit(False), F.lit(f"bh_stepup: NaN in p column '{p_col}'")
            ).cast("double"),
        ).otherwise(F.col(p_col)),
    ).localCheckpoint()
    m = df.agg(F.count(F.lit(1)).alias("_m"))
    # validate_keys: a NULL p-value would otherwise silently route to
    # the lowest rank (bucket 0, asc-nulls-first) and could flip the
    # whole rejected prefix — the r6-ADVICE silent-NULL hazard class.
    # Callers with NULL-able tests (e.g. a zero-variance segment whose
    # z is guarded NULL) must filter or impute BEFORE the step-up;
    # this makes the violation fail loudly instead of mis-ranking.
    ranked = distributed_cumulative(
        df.crossJoin(F.broadcast(m)),
        order_cols=[p_col, *tiebreak_cols],
        agg_col=None,
        out_col=out_rank,
        validate_keys=True,
    ).withColumn(
        out_thresh,
        F.col(out_rank).cast("double")
        * F.lit(float(alpha))
        / F.col("_m").cast("double"),
    )
    # consumed by the k* scalar AND the final projection — one
    # materialization of the bounded (m-row) test relation
    ranked = ranked.localCheckpoint()
    km = ranked.agg(
        F.max(
            F.when(F.col(p_col) <= F.col(out_thresh), F.col(out_rank))
        ).alias("_kmax")
    )
    return (
        ranked.crossJoin(F.broadcast(km))
        .withColumn(
            out_flag,
            F.col("_kmax").isNotNull() & (F.col(out_rank) <= F.col("_kmax")),
        )
        .drop("_m", "_kmax")
    )
