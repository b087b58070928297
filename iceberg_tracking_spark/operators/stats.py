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


# ------------------------------------------ Spearman rank correlation

_DEC = "decimal(38,0)"


def spearman_from_cells(cells: DataFrame) -> DataFrame:
    """(seg, n, rho) from a (seg, x, yc, cnt) CELL relation (rows
    collapsed onto the two integer value grids): tie-corrected Spearman
    = Pearson of pooled midranks, every rank lifted to the integer
    2·rank grid (rx2 = 2·cum_before + t + 1, the mw_grid move) so all
    six Pearson sums are exact DECIMAL algebra over the cells; rho is
    a fixed float sequence (two cast-to-double factors, one sqrt, one
    division) rounded 6dp. Degenerate segments (all x or all y tied)
    are NULL. The cell relation must be materialized by the caller
    (three consumers: both marginal rank tables and the cell join).

    Scale: marginals and joins are grid-sized; windows partition by
    segment over the bounded grid. n·S11 grows as 4n⁴ — inside
    decimal(38) to n ~ 10⁹ rows per segment."""
    from pyspark.sql import Window

    def marginal(col: str, rank_col: str) -> DataFrame:
        g = cells.groupBy("seg", col).agg(F.sum("cnt").alias("t"))
        w = (
            Window.partitionBy("seg")
            .orderBy(col)
            .rowsBetween(Window.unboundedPreceding, -1)
        )
        cb = F.coalesce(F.sum("t").over(w), F.lit(0))
        return g.select(
            "seg", col, (2 * cb + F.col("t") + 1).alias(rank_col)
        )

    xg = marginal("x", "rx2")
    yg = marginal("yc", "ry2")
    j = cells.join(xg, ["seg", "x"]).join(yg, ["seg", "yc"])
    cd = F.col("cnt").cast(_DEC)
    rx = F.col("rx2").cast(_DEC)
    ry = F.col("ry2").cast(_DEC)
    s = j.groupBy("seg").agg(
        F.sum("cnt").cast(_DEC).alias("n"),
        F.sum(cd * rx).alias("s1"),
        F.sum(cd * ry).alias("s2"),
        F.sum(cd * rx * rx).alias("s11"),
        F.sum(cd * ry * ry).alias("s22"),
        F.sum(cd * rx * ry).alias("s12"),
    )
    n = F.col("n")
    varx = n * F.col("s11") - F.col("s1") * F.col("s1")
    vary = n * F.col("s22") - F.col("s2") * F.col("s2")
    num = (n * F.col("s12") - F.col("s1") * F.col("s2")).cast("double")
    return s.select(
        "seg",
        n.cast("long").alias("n"),
        F.when(
            (n > 1) & (varx > 0) & (vary > 0),
            F.round(
                num / F.sqrt(varx.cast("double") * vary.cast("double")), 6
            ),
        ).alias("rho"),
    )


# --------------------------------------------- Kruskal-Wallis (3 groups)

#: additive per-(segment, cents) count columns `kw3_grid` emits — like
#: MW_GRID_COLS, the relation a streaming deployment maintains via
#: make_aggregate_merge_fn
KW_GRID_COLS = ["g0", "g1", "g2"]


def kw3_grid(events: DataFrame) -> DataFrame:
    """(event_type, cents, g0, g1, g2) from raw (event_type, user_id,
    value) rows: per-group counts (grp = user_id % 3) on the exact
    cents grid — the Kruskal-Wallis sibling of `mw_grid`, with the
    same additivity contract (counts of a union == summed counts of
    the parts), so the grid streams via the generic additive fold.
    NULLs drop up front for the same reasons as mw_grid."""
    rows = (
        events.filter(F.col("value").isNotNull())
        .select(
            "event_type",
            (F.col("user_id") % 3).alias("grp"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
    )
    return _kw3_grid_from_projected(rows)


def _kw3_grid_from_projected(rows: DataFrame) -> DataFrame:
    """Grid counts from already-projected (event_type, grp, cents)."""
    return rows.groupBy("event_type", "cents").agg(
        *[
            F.sum(F.when(F.col("grp") == j, 1).otherwise(0))
            .cast("long")
            .alias(f"g{j}")
            for j in range(3)
        ]
    )


def kw3_from_rows(rows: DataFrame) -> DataFrame:
    """(event_type, n0, n1, n2, h_stat, p_value) from (event_type, grp,
    cents) rows with grp ∈ {0,1,2} — projection-level entry point for
    planted-data tests; the production path is
    kw3_from_grid(kw3_grid(events))."""
    return kw3_from_grid(_kw3_grid_from_projected(rows))


def kw3_from_grid(g: DataFrame) -> DataFrame:
    """(event_type, n0, n1, n2, h_stat, p_value) from the grid relation
    (maintained table or fresh aggregate): tie-corrected Kruskal-Wallis
    H via the 2R_j integer-grid rank sums; H a fixed float op sequence
    over exact DECIMALs rounded 6dp; k = 3 ⇒ df = 2 ⇒ the chi² tail is
    EXACTLY exp(−H/2), from the rounded H (the transcendental rule).
    Segments missing a group drop; all-tied segments → NULL H/p."""
    from pyspark.sql import Window

    t = F.col("g0") + F.col("g1") + F.col("g2")
    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    r = g.withColumn("t", t).withColumn(
        "cb", F.coalesce(F.sum("t").over(w), F.lit(0))
    )
    mid2 = (2 * F.col("cb") + F.col("t") + 1).cast(_DEC)
    td = F.col("t").cast(_DEC)
    s = r.groupBy("event_type").agg(
        F.sum("g0").alias("n0"),
        F.sum("g1").alias("n1"),
        F.sum("g2").alias("n2"),
        F.sum(F.col("g0").cast(_DEC) * mid2).alias("r20"),
        F.sum(F.col("g1").cast(_DEC) * mid2).alias("r21"),
        F.sum(F.col("g2").cast(_DEC) * mid2).alias("r22"),
        F.sum(td * td * td - td).alias("tie"),
    ).filter((F.col("n0") > 0) & (F.col("n1") > 0) & (F.col("n2") > 0))
    nd = (F.col("n0") + F.col("n1") + F.col("n2")).cast("double")
    sumterm = (
        (F.col("r20") * F.col("r20")).cast("double")
        / (F.lit(4.0) * F.col("n0").cast("double"))
        + (F.col("r21") * F.col("r21")).cast("double")
        / (F.lit(4.0) * F.col("n1").cast("double"))
        + (F.col("r22") * F.col("r22")).cast("double")
        / (F.lit(4.0) * F.col("n2").cast("double"))
    )
    corr = F.lit(1.0) - F.col("tie").cast("double") / (nd * nd * nd - nd)
    h = s.select(
        "event_type",
        "n0",
        "n1",
        "n2",
        F.when(
            corr > 0,
            F.round(
                (
                    F.lit(12.0) * sumterm / (nd * (nd + F.lit(1.0)))
                    - F.lit(3.0) * (nd + F.lit(1.0))
                )
                / corr,
                6,
            ),
        ).alias("h_stat"),
    )
    return h.select(
        "event_type",
        "n0",
        "n1",
        "n2",
        "h_stat",
        F.round(F.exp(-F.col("h_stat") / F.lit(2.0)), 6).alias("p_value"),
    )


# ----------------------------------------------------- permutation test


def permutation_mean_diff(ua: DataFrame, n_perms: int) -> DataFrame:
    """(event_type, n_a, n_b, obs_diff, p_value) from the per-UNIT
    aggregate (event_type, user_id, sc, nr): permutation test on the
    variant mean difference (variant = user_id % 2 observed; relabeling
    p = first-32-md5-bits(user:p) mod 2 — the q_kfold seeded hash, so
    the label matrix is identical on any engine/partitioning/retry).
    Sums exact integers; each mean ONE division; the add-one p-value
    (Phipson & Smyth 2010) counts |d_p| ≥ |d_obs| over bit-identical
    doubles. obs_diff is rescaled cents → units (÷100, rounded 6dp).

    Scale: the ×(P+1) fan rides the |units|-row aggregate, never raw
    rows; labels are projections (no shuffle); the final aggregate is
    one row per (segment, permutation)."""
    spark = ua.sparkSession
    perms = spark.range(0, n_perms + 1).select(F.col("id").alias("p"))
    lab = ua.crossJoin(F.broadcast(perms)).withColumn(
        "variant",
        F.when(F.col("p") == 0, F.col("user_id") % 2).otherwise(
            F.conv(
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":",
                            F.col("user_id").cast("string"),
                            F.col("p").cast("string"),
                        )
                    ),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 2
        ),
    )
    d = lab.groupBy("event_type", "p").agg(
        F.sum(F.when(F.col("variant") == 0, F.col("sc")).otherwise(0)).alias(
            "sa"
        ),
        F.sum(F.when(F.col("variant") == 0, F.col("nr")).otherwise(0)).alias(
            "ca"
        ),
        F.sum(F.when(F.col("variant") == 1, F.col("sc")).otherwise(0)).alias(
            "sb"
        ),
        F.sum(F.when(F.col("variant") == 1, F.col("nr")).otherwise(0)).alias(
            "cb"
        ),
    )
    diff = F.when(
        (F.col("ca") > 0) & (F.col("cb") > 0),
        F.col("sa").cast("double") / F.col("ca").cast("double")
        - F.col("sb").cast("double") / F.col("cb").cast("double"),
    )
    diffs = d.select(
        "event_type", "p", "ca", "cb", diff.alias("diff")
    ).localCheckpoint()  # two consumers: observed row + permutation rows
    obs = diffs.filter(F.col("p") == 0).select(
        "event_type",
        F.col("ca").alias("n_a"),
        F.col("cb").alias("n_b"),
        F.col("diff").alias("obs_diff"),
    )
    # ≥ indicator BEFORE the aggregate, against the UNROUNDED
    # cents-scale observed diff; only the displayed diff rescales
    ge = (
        F.broadcast(obs)
        .join(diffs.filter(F.col("p") >= 1), "event_type")
        .select(
            "event_type",
            "n_a",
            "n_b",
            "obs_diff",
            F.when(F.abs(F.col("diff")) >= F.abs(F.col("obs_diff")), 1)
            .otherwise(0)
            .alias("ge"),
        )
    )
    return (
        ge.groupBy("event_type", "n_a", "n_b", "obs_diff")
        .agg(F.sum("ge").alias("n_ge"))
        .select(
            "event_type",
            "n_a",
            "n_b",
            F.round(F.col("obs_diff") / 100.0, 6).alias("obs_diff"),
            F.round(
                (F.lit(1.0) + F.col("n_ge").cast("double"))
                / F.lit(1.0 + n_perms),
                6,
            ).alias("p_value"),
        )
    )


# --------------------------------------------- isotonic fit (PAV minimax)


def isotonic_fit(per_bin: DataFrame) -> DataFrame:
    """(ib, g) from an ordered-bin relation (bin, n, s_y): the PAV
    solution via the closed minimax form g(i) = max_{j≤i} min_{k≥i}
    avg(y over bins j..k) (Robertson-Wright-Dykstra 1988, Thm 1.4.4) —
    three bounded relational passes instead of the serial pool-merge
    loop. Every interval average is ONE IEEE division of exact integer
    prefix sums, so min/max match cross-engine bit-for-bit. The caller
    materializes per_bin (three consumers). Cost is O(B³) on a B-row
    relation — constant at any corpus size for fixed B."""
    # prefix sums WITHOUT a global window (even on a B-row relation the
    # house rule is no single-partition stages): each bin's (s_y, n)
    # explodes onto every prefix position ≥ its index and a hash
    # aggregate per position sums them — O(B²) rows, equi all the way
    maxb = per_bin.agg(F.max("bin").alias("maxb"))
    pref = (
        per_bin.crossJoin(F.broadcast(maxb))
        .select(
            "s_y",
            "n",
            F.explode(F.sequence(F.col("bin"), F.col("maxb"))).alias("pbin"),
        )
        .groupBy("pbin")
        .agg(F.sum("s_y").alias("cy"), F.sum("n").alias("cn"))
    )
    pb = per_bin.join(pref, per_bin.bin == pref.pbin).select(
        "bin", "n", "s_y", "cy", "cn"
    )
    # the triangular (j ≤ k) pair set is generated by EXPLODING each
    # j-row over its k-range and equi-joining the k prefix sums back —
    # no non-equi join, no nested loop, no cartesian anywhere
    jk = pb.crossJoin(F.broadcast(maxb)).select(
        F.col("bin").alias("jb"),
        (F.col("cy") - F.col("s_y")).alias("cyb"),
        (F.col("cn") - F.col("n")).alias("cnb"),
        F.explode(F.sequence(F.col("bin"), F.col("maxb"))).alias("kb"),
    )
    pairs = jk.join(
        pb.select(
            F.col("bin").alias("kb"),
            F.col("cy").alias("kcy"),
            F.col("cn").alias("kcn"),
        ),
        "kb",
    ).select(
        "jb",
        "kb",
        (
            (F.col("kcy") - F.col("cyb")).cast("double")
            / (F.col("kcn") - F.col("cnb")).cast("double")
        ).alias("avg_jk"),
    )
    # i ∈ [jb, kb] likewise by explode; phantom i indices (bins absent
    # from per_bin) are dropped by the caller's equi-join on ib
    tri = pairs.select(
        "jb",
        "avg_jk",
        F.explode(F.sequence(F.col("jb"), F.col("kb"))).alias("ib"),
    )
    mins = tri.groupBy("ib", "jb").agg(F.min("avg_jk").alias("m"))
    return mins.groupBy("ib").agg(F.max("m").alias("g"))


#: additive per-(seg, x, yc) count column `spearman_cells` emits — the
#: third maintained grid after MW and KW
SPEARMAN_CELL_COLS = ["cnt"]


def spearman_cells(lineitem: DataFrame) -> DataFrame:
    """(seg, x, yc, cnt) cells from raw lineitem rows — the additive
    aggregate stage of q_spearman (counts of a union == summed counts
    of the parts), so the cell relation streams via the generic
    additive fold like the MW/KW grids."""
    return (
        lineitem.select(
            F.col("l_returnflag").alias("seg"),
            F.col("l_quantity").cast("long").alias("x"),
            F.round(F.col("l_extendedprice") * 100, 0)
            .cast("long")
            .alias("yc"),
        )
        .groupBy("seg", "x", "yc")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


# --------------------------------------------- Kendall tau-b (binned)

#: additive count column of the kendall cell relation — streamed via
#: the same generic fold as the Spearman/MW/KW grids
KENDALL_CELL_COLS = ["cnt"]


def kendall_cells(lineitem: DataFrame) -> DataFrame:
    """(seg, x, yb, cnt) cells for q_kendall_tau — quantity vs a
    BOUNDED price grid (5000-unit buckets, ~22 values). Additive like
    spearman_cells, so the relation streams via the generic fold.

    The bounded y-grid is the honest scale contract: tau needs
    PAIRWISE concordance, and the cell-pair fan is |X|·|Y| squared —
    fixed by the schema's value grids (50 × ~22 here), never by the
    row count. Exact continuous-value tau would need a global
    merge-sort inversion count (not relational); the binned tau IS
    the streaming-maintainable statistic, stated as such."""
    return (
        lineitem.select(
            F.col("l_returnflag").alias("seg"),
            F.col("l_quantity").cast("long").alias("x"),
            F.floor(F.col("l_extendedprice") / 5000).cast("long").alias("yb"),
        )
        .groupBy("seg", "x", "yb")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def kendall_from_cells(cells: DataFrame) -> DataFrame:
    """(seg, n, concordant, discordant, tau_b) from a (seg, x, yb,
    cnt) cell relation: tau-b with full tie correction, every count
    exact DECIMAL algebra. C − D comes from ONE cell self-join per
    segment restricted to x1 < x2 (pair fan = cells², bounded by the
    value grids — the kendall_cells contract); tie terms n1/n2 come
    from the marginals. The ½ factors cancel: with N0 = n(n−1),
    N1 = Σ tx(tx−1), N2 = Σ ty(ty−1), tau_b = 2(C−D) /
    sqrt((N0−N1)(N0−N2)) — every term a PURE-INTEGER decimal (no
    decimal division anywhere), then one fixed float sequence (one
    sqrt, one division) rounded 6dp. Degenerate segments (all x or
    all y tied) EMIT a row with tau_b NULL: the marginals (tx/ty)
    always have one row per segment, and cd — empty when a segment
    has a single distinct x, since the x1 < x2 self-join fans zero
    pairs — is LEFT-joined onto them with conc/disc coalesced to 0
    (r10 ADVICE #1: an inner join silently dropped such segments,
    contradicting this contract). N0² stays inside the double's
    range and decimal(38) to n ~ 1e9 rows per segment."""
    c1 = cells.select(
        "seg",
        F.col("x").alias("x1"),
        F.col("yb").alias("y1"),
        F.col("cnt").alias("c1"),
    )
    c2 = cells.select(
        F.col("seg").alias("seg2"),
        F.col("x").alias("x2"),
        F.col("yb").alias("y2"),
        F.col("cnt").alias("c2"),
    )
    pair = c1.join(
        c2, (F.col("seg") == F.col("seg2")) & (F.col("x1") < F.col("x2"))
    )
    prod = (F.col("c1") * F.col("c2")).cast(_DEC)
    cd = pair.groupBy("seg").agg(
        F.sum(F.when(F.col("y1") < F.col("y2"), prod).otherwise(0)).alias(
            "conc"
        ),
        F.sum(F.when(F.col("y1") > F.col("y2"), prod).otherwise(0)).alias(
            "disc"
        ),
    )
    tx = (
        cells.groupBy("seg", "x")
        .agg(F.sum("cnt").alias("t"))
        .groupBy("seg")
        .agg(
            F.sum("t").cast(_DEC).alias("n_x"),
            F.sum(F.col("t").cast(_DEC) * (F.col("t") - 1)).alias("n1"),
        )
    )
    ty = (
        cells.groupBy("seg", "yb")
        .agg(F.sum("cnt").alias("t"))
        .groupBy("seg")
        .agg(
            F.sum(F.col("t").cast(_DEC) * (F.col("t") - 1)).alias("n2"),
        )
    )
    s = (
        tx.join(ty, "seg")
        .join(cd, "seg", "left")
        .withColumn("conc", F.coalesce(F.col("conc"), F.lit(0).cast(_DEC)))
        .withColumn("disc", F.coalesce(F.col("disc"), F.lit(0).cast(_DEC)))
    )
    n = F.col("n_x")
    n0 = n * (n - 1)
    dx = (n0 - F.col("n1")).cast("double")
    dy = (n0 - F.col("n2")).cast("double")
    num = (F.col("conc") - F.col("disc")).cast("double")
    return s.select(
        "seg",
        n.cast("long").alias("n"),
        F.col("conc").cast("long").alias("concordant"),
        F.col("disc").cast("long").alias("discordant"),
        F.when(
            (dx > 0) & (dy > 0),
            F.round(F.lit(2.0) * num / F.sqrt(dx * dy), 6),
        ).alias("tau_b"),
    )


# --------------------------------------------- Cliff's delta


def cliffs_from_grid(grid: DataFrame) -> DataFrame:
    """(event_type, n_a, n_b, cliffs_delta) from the mw_grid relation:
    the dominance effect size δ = Σ sign(a − b) / (n_a·n_b) — the
    magnitude companion to mw_from_grid's significance (a huge n makes
    tiny shifts 'significant'; δ says whether they MATTER). Entirely
    exact: Σ sign = Σ_cells na_c·(B_below − B_above) over the bounded
    value grid, ONE division rounded 6dp — no float sums at all.
    Single pass: the per-segment totals ride an unbounded window over
    the same grid partition the cumulative uses, so the grid relation
    has ONE consumer chain (no join-back, no second scan — the
    mw_from_grid shape)."""
    from pyspark.sql import Window

    w = (
        Window.partitionBy("event_type")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy("event_type").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    r = grid.select(
        "event_type",
        "na_c",
        "nb_c",
        F.coalesce(F.sum("nb_c").over(w), F.lit(0)).alias("b_below"),
        F.sum("na_c").over(wall).alias("n_a"),
        F.sum("nb_c").over(wall).alias("n_b"),
    )
    s = r.groupBy("event_type").agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum(
            F.col("na_c").cast(_DEC)
            * (
                F.col("b_below")
                - (F.col("n_b") - F.col("b_below") - F.col("nb_c"))
            ).cast(_DEC)
        ).alias("signsum"),
    )
    return s.select(
        "event_type",
        "n_a",
        "n_b",
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0),
            F.round(
                F.col("signsum").cast("double")
                / (
                    F.col("n_a").cast("double") * F.col("n_b").cast("double")
                ),
                6,
            ),
        ).alias("cliffs_delta"),
    )


# --------------------------------------------- Kendall tau-b (capped exact)


def kendall_exact_capped(pts: DataFrame, cap: int) -> DataFrame:
    """(seg, n, concordant, discordant, tau_b) — EXACT (unbinned)
    tie-corrected tau-b on a per-segment hash-capped sample of
    (seg, x, y, hk, k1, k2) points. Closes the one stated
    approximation in kendall_from_cells: that operator bins y onto a
    bounded grid because exact continuous tau needs pairwise
    concordance over raw values, which is quadratic. Here the
    quadratic runs — but on a BOUNDED sample: each segment keeps its
    first `cap` rows in (hk, k1, k2, x, y) order, where hk is the
    engine-portable md5 row hash (functions/keys.py:stable_id_hash's
    move) and the trailing (x, y) make the order total even when the
    caller's (k1, k2) key is NOT unique (the synthetic lineitem has
    duplicate (orderkey, linenumber) rows — without the value
    tie-break, engines disagreed at tie boundaries and even DuckDB
    was nondeterministic run-to-run); remaining ties are fully
    IDENTICAL rows, interchangeable for the statistic. The kept set
    is a UNIFORM deterministic subsample
    (hash order is independent of x and y — ordering by data columns
    would truncate the distribution and bias tau) and both engines
    select identical rows. tau-b on a uniform subsample is the
    U-statistic estimator: consistent, s.e. ~ O(1/cap).

    The pair fan is the Theil-Sen cap pattern
    (plans/queries_features.py): seg-equi self-join restricted to
    rn1 < rn2 — at most cap(cap−1)/2 pairs per segment, FIXED by the
    cap, never by row count. Every count is integer (conc/disc ≤
    cap²/2 ≈ 10⁶ — longs, no decimal needed); tau is one sqrt + one
    division, rounded 6dp. Degenerate segments emit tau_b NULL with
    0/0 counts (the kendall_from_cells left-join contract).

    The cap itself is TWO-PHASE so no full-table per-segment sort
    ever runs (a row_number window partitioned by a few-valued seg
    funnels the whole table through |seg| tasks — the scale-killer
    class): first a scan-level THRESHOLD filter keeps rows whose
    32-bit hash prefix falls below ~2·cap/n_seg of the keyspace
    (md5 is uniform, so survivors ≈ 2·cap per segment; the per-seg
    counts are a broadcast-sized dimension aggregate, the
    q_winsorize baseline pattern), then the row_number window runs
    on that cap-bounded relation only. The filtered set contains the
    full hk-order prefix whenever ≥ cap rows survive (all rows below
    the threshold are kept, so the cap-th row's prefix is complete —
    P(<cap survivors) < e^(−cap/4) by Chernoff, and segments smaller
    than the margin pass entirely); both engines apply the identical
    filter + cap, so cross-engine row selection is exact
    UNCONDITIONALLY."""
    from pyspark.sql import Window

    cnt = pts.groupBy("seg").agg(F.count(F.lit(1)).alias("n_seg"))
    # threshold on the first 8 hex chars of hk (32-bit keyspace):
    # the SAME float literal and op order as the SQL mirror
    thr = F.least(
        F.lit(4294967296),
        F.ceil(F.lit(float(4294967296.0 * 2 * cap)) / F.col("n_seg")).cast(
            "long"
        ),
    )
    pre = (
        pts.join(F.broadcast(cnt), "seg")
        .filter(F.conv(F.substring("hk", 1, 8), 16, 10).cast("long") < thr)
        .select("seg", "x", "y", "hk", "k1", "k2")
    )
    w = Window.partitionBy("seg").orderBy("hk", "k1", "k2", "x", "y")
    capped = (
        pre.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .select("seg", "x", "y", "rn")
        .localCheckpoint()  # three consumers: both pair sides + marginals
    )
    a, b = capped.alias("a"), capped.alias("b")
    dprod = (F.col("a.x") - F.col("b.x")) * (F.col("a.y") - F.col("b.y"))
    cd = (
        a.join(
            b,
            (F.col("a.seg") == F.col("b.seg"))
            & (F.col("a.rn") < F.col("b.rn")),
        )
        .groupBy(F.col("a.seg").alias("seg"))
        .agg(
            F.sum(F.when(dprod > 0, 1).otherwise(0)).alias("conc"),
            F.sum(F.when(dprod < 0, 1).otherwise(0)).alias("disc"),
        )
    )
    tx = (
        capped.groupBy("seg", "x")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("seg")
        .agg(
            F.sum("t").alias("n"),
            F.sum(F.col("t") * (F.col("t") - 1)).alias("n1"),
        )
    )
    ty = (
        capped.groupBy("seg", "y")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("seg")
        .agg(F.sum(F.col("t") * (F.col("t") - 1)).alias("n2"))
    )
    s = (
        tx.join(ty, "seg")
        .join(cd, "seg", "left")
        .withColumn("conc", F.coalesce(F.col("conc"), F.lit(0)))
        .withColumn("disc", F.coalesce(F.col("disc"), F.lit(0)))
    )
    n0 = F.col("n") * (F.col("n") - 1)
    dx = (n0 - F.col("n1")).cast("double")
    dy = (n0 - F.col("n2")).cast("double")
    return s.select(
        "seg",
        "n",
        F.col("conc").alias("concordant"),
        F.col("disc").alias("discordant"),
        F.when(
            (dx > 0) & (dy > 0),
            F.round(
                F.lit(2.0)
                * (F.col("conc") - F.col("disc")).cast("double")
                / F.sqrt(dx * dy),
                6,
            ),
        ).alias("tau_b"),
    )


# --------------------------------------------- Mann-Kendall trend test

#: additive count column of the MK cell relation — streamable via the
#: same generic fold as the Spearman/Kendall/MW/KW grids
MK_CELL_COLS = ["cnt"]


def mk_cells(events: DataFrame) -> DataFrame:
    """(seg, x, y, cnt) cells for q_mann_kendall: x = UTC epoch day of
    ts, y = the 5-unit value bucket. Additive (counts of a union ==
    summed counts of the parts) like the sibling grids, so a stream
    maintains it via merge_aggregate. NULL values dropped up front
    (the mw_grid convention — a trend test cannot rank them and a
    NULL key orders differently across engines). The y-grid is
    bounded by the value RANGE; the x-grid grows with the OBSERVATION
    WINDOW (days), not with row volume — the honest MK contract
    (see mann_kendall_from_cells)."""
    return (
        events.filter(F.col("value").isNotNull())
        .select(
            F.col("event_type").alias("seg"),
            F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("x"),
            F.floor(F.col("value") / 5).cast("long").alias("y"),
        )
        .groupBy("seg", "x", "y")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def mann_kendall_from_cells(cells: DataFrame) -> DataFrame:
    """(seg, n, s_stat, z, p_value, trend) — the Mann-Kendall trend
    test from a (seg, x=time-bucket, y=value-bucket, cnt) cell
    relation: S = Σ_{t_i<t_j} sign(y_j − y_i) is EXACTLY Kendall's
    C − D between time and value, so S reuses the kendall_from_cells
    pair algebra (ONE cell self-join per segment restricted to
    x1 < x2, fan bounded by the two grids). The tie-corrected
    variance (Kendall 1975, the form Hirsch-Slack-Smith water-quality
    MK uses, with BOTH margins tied — time buckets tie heavily by
    construction):

      Var(S) = [A0 − Vx − Vy]/18
             + A2x·A2y / (9·n(n−1)(n−2))
             + A3x·A3y / (2·n(n−1))

    with A0 = n(n−1)(2n+5), V = Σ t(t−1)(2t+5), A2 = Σ t(t−1)(t−2),
    A3 = Σ t(t−1) over each margin's tie groups — every A-term an
    exact DECIMAL integer from the marginals (n ≤ 1e9 keeps n³ inside
    decimal(38)); the three variance terms are ONE fixed double
    sequence each (the cross products lift to double BEFORE
    multiplying — A2x·A2y can exceed decimal(38) as integers), then
    z = (S ∓ 1)/sqrt(Var) continuity-corrected, rounded 6dp, and the
    two-sided p comes from the house A&S 26.2.17 polynomial
    (normal_two_sided_p — both engines evaluate the identical literal
    chain). trend labels at α = 0.05. Segments with n < 3 or
    non-positive variance emit NULL z/p (and 'no trend' stays NULL).

    Scale: the pair fan is |X grid|·|Y grid| squared PER SEGMENT —
    the y-grid is bounded by the value range, the x-grid by the
    OBSERVATION WINDOW (days), so cost grows with window length
    squared, never with row volume; production MK runs on bounded
    windows (seasonal/monthly MK) exactly because of this, and the
    cell relation itself is streaming-maintainable (additive)."""
    c1 = cells.select(
        "seg",
        F.col("x").alias("x1"),
        F.col("y").alias("y1"),
        F.col("cnt").alias("c1"),
    )
    c2 = cells.select(
        F.col("seg").alias("seg2"),
        F.col("x").alias("x2"),
        F.col("y").alias("y2"),
        F.col("cnt").alias("c2"),
    )
    pair = c1.join(
        c2, (F.col("seg") == F.col("seg2")) & (F.col("x1") < F.col("x2"))
    )
    prod = (F.col("c1") * F.col("c2")).cast(_DEC)
    cd = pair.groupBy("seg").agg(
        F.sum(F.when(F.col("y1") < F.col("y2"), prod).otherwise(0)).alias("conc"),
        F.sum(F.when(F.col("y1") > F.col("y2"), prod).otherwise(0)).alias("disc"),
    )

    def _margin(col: str, pfx: str) -> DataFrame:
        t = F.col("t").cast(_DEC)
        agg = [
            F.sum(t * (t - 1) * (2 * t + 5)).alias(f"v{pfx}"),
            F.sum(t * (t - 1) * (t - 2)).alias(f"a2{pfx}"),
            F.sum(t * (t - 1)).alias(f"a3{pfx}"),
        ]
        if pfx == "x":
            agg.insert(0, F.sum("t").cast(_DEC).alias("n"))
        return (
            cells.groupBy("seg", col)
            .agg(F.sum("cnt").alias("t"))
            .groupBy("seg")
            .agg(*agg)
        )

    s = (
        _margin("x", "x")
        .join(_margin("y", "y"), "seg")
        .join(cd, "seg", "left")
        .withColumn("conc", F.coalesce(F.col("conc"), F.lit(0).cast(_DEC)))
        .withColumn("disc", F.coalesce(F.col("disc"), F.lit(0).cast(_DEC)))
    )
    n = F.col("n")
    a0 = n * (n - 1) * (2 * n + 5)
    term1 = (a0 - F.col("vx") - F.col("vy")).cast("double") / F.lit(18.0)
    term2 = (
        F.col("a2x").cast("double")
        * F.col("a2y").cast("double")
        / (F.lit(9.0) * (n * (n - 1) * (n - 2)).cast("double"))
    )
    term3 = (
        F.col("a3x").cast("double")
        * F.col("a3y").cast("double")
        / (F.lit(2.0) * (n * (n - 1)).cast("double"))
    )
    var_s = term1 + term2 + term3
    s_stat = (F.col("conc") - F.col("disc")).cast("double")
    z_raw = F.when(
        (n >= 3) & (var_s > 0),
        F.when(s_stat > 0, (s_stat - 1) / F.sqrt(var_s))
        .when(s_stat < 0, (s_stat + 1) / F.sqrt(var_s))
        .otherwise(F.lit(0.0)),
    )
    out = s.select(
        "seg",
        n.cast("long").alias("n"),
        (F.col("conc") - F.col("disc")).cast("long").alias("s_stat"),
        F.round(z_raw, 6).alias("z"),
    )
    p = normal_two_sided_p(F.col("z"))
    return out.select(
        "seg",
        "n",
        "s_stat",
        "z",
        p.alias("p_value"),
        F.when(
            F.col("z").isNotNull(),
            F.when((p < 0.05) & (F.col("s_stat") > 0), F.lit("increasing"))
            .when((p < 0.05) & (F.col("s_stat") < 0), F.lit("decreasing"))
            .otherwise(F.lit("no trend")),
        ).alias("trend"),
    )
