"""Mixture SPRT (always-valid sequential A/B test) as a maintained
relation: per-day additive moments + the bounded-relation Lambda/p
algebra on top.

Factored out of plans/queries_advanced.py:q_msprt (round 8) so the
batch query and the streaming maintenance (streaming/msprt.py) share
one definition — the same shared-operator guarantee streaming/als.py
carries: the per-day moments are exact BIGINT/DECIMAL(38,0) sums,
ADDITIVE under any partition of the stream, so a merge_aggregate-
maintained moment table is BIT-IDENTICAL to a batch rebuild, and
`msprt_from_daily` over either produces the same bytes.

Method: Johari, Pekelis & Walsh, "Peeking at A/B Tests" (KDD 2017) —
at every analysis day t the running mixture likelihood ratio
Lambda_t = sqrt(V/(V+tau)) * exp(delta^2 tau / (2 V (V+tau))) over the
cumulative two-sample mean difference, and the always-valid p-value
p_t = min(1, 1/max_{s<=t} Lambda_s).

Reference tie-in: the reference evaluates tracking quality once per
run (evaluation.py); this is the continuous-monitoring analog a
production experimentation stack needs beside q_cuped and
q_benjamini_hochberg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.time import day_id

__all__ = ["MSPRT_MOMENT_COLS", "MSPRT_TAU", "daily_moments", "msprt_from_daily"]

MSPRT_TAU = 10000.0  # mixture prior scale for the effect, cents^2

_DEC = "decimal(38,0)"

#: the per-day sufficient-statistic columns `daily_moments` emits
#: (besides the day_num key) — all additive exact integers
MSPRT_MOMENT_COLS = ["n0", "s0", "q0", "n1", "s1", "q1"]


def daily_moments(events: DataFrame) -> DataFrame:
    """(day_num, n0, s0, q0, n1, s1, q1) from raw (ts, user_id, value)
    event rows: per-variant count / cents-sum / cents-square-sum per
    day. Additive: moments of a union == column-wise sum of moments of
    the parts, so any stream chopping reproduces the batch table
    exactly (counts are BIGINT; sums are DECIMAL(38,0); squares cast
    each operand to decimal BEFORE multiplying — the q_anova pattern —
    because cents*cents in LongType wraps past ~3e9 cents)."""
    dec = _DEC
    e = events.filter(F.col("ts").isNotNull()).select(
        day_id("ts").alias("day_num"),
        (F.col("user_id") % 2).alias("variant"),
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    return e.groupBy("day_num").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).alias("n0"),
        F.sum(
            F.when(F.col("variant") == 0, F.col("cents"))
            .otherwise(0)
            .cast(dec)
        ).alias("s0"),
        F.sum(
            F.when(
                F.col("variant") == 0,
                F.col("cents").cast(dec) * F.col("cents").cast(dec),
            ).otherwise(F.lit(0).cast(dec))
        ).alias("q0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(
            F.when(F.col("variant") == 1, F.col("cents"))
            .otherwise(0)
            .cast(dec)
        ).alias("s1"),
        F.sum(
            F.when(
                F.col("variant") == 1,
                F.col("cents").cast(dec) * F.col("cents").cast(dec),
            ).otherwise(F.lit(0).cast(dec))
        ).alias("q1"),
    )


def msprt_from_daily(daily: DataFrame, tau: float = MSPRT_TAU) -> DataFrame:
    """(day_num, n_a, n_b, mean_diff_cents, lam, p_always_valid) from
    the per-day moment relation (maintained table or fresh aggregate).

    Cumulatives via a triangular join over the bounded day relation
    (<=366 rows at any scale — the q_histogram_quantiles bounded-
    relation pattern, not a data-sized funnel); every float after the
    exact cumulative sums is the SAME op sequence on any engine, with
    Lambda rounded to 6dp BEFORE the running max so the argmax cannot
    flip on exp()'s 1-ulp spread, and p rounded to 6dp."""
    tau_ = F.lit(float(tau))
    # two consumers (both sides of the triangular cumulative)
    daily = daily.localCheckpoint()
    t_, s_ = daily.alias("t"), daily.alias("s")
    cum = (
        t_.join(s_, F.col("s.day_num") <= F.col("t.day_num"))
        .groupBy(F.col("t.day_num").alias("day_num"))
        .agg(
            F.sum(F.col("s.n0")).alias("cn0"),
            F.sum(F.col("s.s0")).alias("cs0"),
            F.sum(F.col("s.q0")).alias("cq0"),
            F.sum(F.col("s.n1")).alias("cn1"),
            F.sum(F.col("s.s1")).alias("cs1"),
            F.sum(F.col("s.q1")).alias("cq1"),
        )
    )
    mean0 = F.col("cs0").cast("double") / F.col("cn0").cast("double")
    mean1 = F.col("cs1").cast("double") / F.col("cn1").cast("double")
    stats = cum.filter((F.col("cn0") > 1) & (F.col("cn1") > 1)).select(
        "day_num",
        "cn0",
        "cn1",
        mean0.alias("mean0"),
        mean1.alias("mean1"),
        (
            (
                (F.col("cq0") + F.col("cq1")).cast("double")
                - F.col("cn0").cast("double") * mean0 * mean0
                - F.col("cn1").cast("double") * mean1 * mean1
            )
            / (F.col("cn0") + F.col("cn1") - 2).cast("double")
        ).alias("s2"),
    )
    vv = F.col("s2") * (
        F.lit(1.0) / F.col("cn0").cast("double")
        + F.lit(1.0) / F.col("cn1").cast("double")
    )
    delta = F.col("mean0") - F.col("mean1")
    lam_rel = (
        stats.filter(F.col("s2") > 0)
        .select(
            "day_num",
            "cn0",
            "cn1",
            delta.alias("delta"),
            vv.alias("vv"),
        )
        .filter(F.col("vv") > 0)
        .select(
            "day_num",
            "cn0",
            "cn1",
            "delta",
            F.round(
                F.sqrt(F.col("vv") / (F.col("vv") + tau_))
                * F.exp(
                    F.col("delta")
                    * F.col("delta")
                    * tau_
                    / (F.lit(2.0) * F.col("vv") * (F.col("vv") + tau_))
                ),
                6,
            ).alias("lam"),
        )
        # two consumers (both sides of the triangular running max)
        .localCheckpoint()
    )
    lt, ls = lam_rel.alias("lt"), lam_rel.alias("ls")
    rm = (
        lt.join(ls, F.col("ls.day_num") <= F.col("lt.day_num"))
        .groupBy(F.col("lt.day_num").alias("day_num"))
        .agg(F.max(F.col("ls.lam")).alias("run_max"))
    )
    out = lam_rel.select(
        "day_num",
        F.col("cn0").alias("n_a"),
        F.col("cn1").alias("n_b"),
        F.round(F.col("delta"), 6).alias("mean_diff_cents"),
        "lam",
    ).join(rm.select("day_num", "run_max"), "day_num")
    return out.select(
        "day_num",
        "n_a",
        "n_b",
        "mean_diff_cents",
        "lam",
        F.round(
            F.when(
                F.col("run_max") > 1.0, F.lit(1.0) / F.col("run_max")
            ).otherwise(1.0),
            6,
        ).alias("p_always_valid"),
    )
