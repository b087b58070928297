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

from pyspark.sql import Column, DataFrame
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


# ---------------------------------------------------- normal-tail p-values

#: A&S 26.2.17 two-sided normal tail — canonical home of the literal
#: coefficients since round 8 (the query layer imports these; the BH
#: oracle f-strings interpolate the SAME Python floats, so both
#: engines always evaluate the identical polynomial)
INV_SQRT_2PI = 0.3989422804014327
NORMAL_TAIL_B = (
    0.319381530,
    -0.356563782,
    1.781477937,
    -1.821255978,
    1.330274429,
)


def normal_two_sided_p(z: Column) -> Column:
    """round(2·pdf(|z|)·poly(1/(1+0.2316419|z|)), 6) — the A&S 26.2.17
    tail evaluated from an ALREADY-6dp-ROUNDED z (the house rule:
    transcendentals are cross-engine-safe only when both engines feed
    the same literal polynomial from the same rounded input and round
    the output; exp()'s 1-ulp spread sits ~10 orders below the 6dp
    grid). NULL z propagates to NULL p on any engine."""
    x = F.abs(z)
    tt = F.lit(1.0) / (F.lit(1.0) + F.lit(0.2316419) * x)
    pdf = F.lit(INV_SQRT_2PI) * F.exp(-(x * x) / F.lit(2.0))
    b = NORMAL_TAIL_B
    poly = tt * (
        F.lit(b[0])
        + tt
        * (F.lit(b[1]) + tt * (F.lit(b[2]) + tt * (F.lit(b[3]) + tt * F.lit(b[4]))))
    )
    return F.round(F.lit(2.0) * pdf * poly, 6)


# ------------------------------------------------ Mann-Whitney (rank-sum)

#: additive per-(segment, cents) count columns `mw_grid` emits — the
#: relation a streaming deployment maintains via merge_aggregate
MW_GRID_COLS = ["na_c", "nb_c"]


def mw_grid(events: DataFrame) -> DataFrame:
    """(event_type, cents, na_c, nb_c) from raw (event_type, user_id,
    value) rows: per-variant counts on the exact cents grid. Additive
    (counts of a union == summed counts of the parts), so any stream
    chopping reproduces the batch grid exactly — the Mann-Whitney
    sibling of msprt.daily_moments. The shuffle is bounded by the
    VALUE GRID × segments, never the row count.

    NULL values are dropped up front (a rank-sum test cannot rank
    them, and a NULL grid key would order differently across engines
    — Spark NULLS FIRST vs DuckDB NULLS LAST — shifting every
    midrank; it would also violate the maintained table's
    non-NULL-key contract)."""
    return (
        events.filter(F.col("value").isNotNull())
        .select(
            "event_type",
            (F.col("user_id") % 2).alias("variant"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("event_type", "cents")
        .agg(
            F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
            .cast("long")
            .alias("na_c"),
            F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
            .cast("long")
            .alias("nb_c"),
        )
    )


def mw_from_grid(grid: DataFrame) -> DataFrame:
    """(event_type, n_a, n_b, u_a, z_score, p_value) from the grid
    relation (maintained table or fresh aggregate): tie-corrected
    Mann-Whitney with midranks computed from counts — the rank sum
    lifted to the integer 2·R_A grid, U / tie term / z numerator exact
    DECIMAL algebra, z a fixed float sequence rounded 6dp, two-sided p
    via `normal_two_sided_p`. Degenerate segments (one variant empty,
    or all values tied) yield NULL z/p. The cumulative is a window
    PARTITIONED by segment over the bounded grid — no global sort."""
    from pyspark.sql import Window

    dec = "decimal(38,0)"
    g = grid.withColumn("t", F.col("na_c") + F.col("nb_c"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.withColumn("cb", F.coalesce(F.sum("t").over(w), F.lit(0)))
    td = F.col("t").cast(dec)
    s = r.groupBy("event_type").agg(
        F.sum("na_c").alias("n_a"),
        F.sum("nb_c").alias("n_b"),
        F.sum(
            F.col("na_c").cast(dec)
            * (2 * F.col("cb") + F.col("t") + 1).cast(dec)
        ).alias("r2a"),
        F.sum(td * td * td - td).alias("tie"),
    )
    na_d = F.col("n_a").cast(dec)
    u2 = F.col("r2a") - na_d * (F.col("n_a") + 1).cast(dec)
    num = (u2 - na_d * F.col("n_b").cast(dec)).cast("double")
    nn = F.col("n_a").cast("double") * F.col("n_b").cast("double")
    nd = (F.col("n_a") + F.col("n_b")).cast("double")
    var = (
        nn
        / F.lit(12.0)
        * (
            (nd + F.lit(1.0))
            - F.col("tie").cast("double") / (nd * (nd - F.lit(1.0)))
        )
    )
    z6 = s.select(
        "event_type",
        "n_a",
        "n_b",
        (u2.cast("double") / F.lit(2.0)).alias("u_a"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0) & (var > 0),
            F.round(num / (F.lit(2.0) * F.sqrt(var)), 6),
        ).alias("z_score"),
    )
    return z6.select(
        "event_type",
        "n_a",
        "n_b",
        "u_a",
        "z_score",
        normal_two_sided_p(F.col("z_score")).alias("p_value"),
    )
