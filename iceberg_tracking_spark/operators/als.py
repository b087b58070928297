"""ALS (alternating least squares) normal-equations operators.

The k=3 user-factor half-step (Zhou et al. 2008) split into its three
relational stages so the BATCH query (plans/queries_features.py:
q_als_step) and the STREAMING factor maintenance (streaming/als.py)
share one implementation:

* `item_factor_grid`  — the fixed item-factor table (deterministic
  small-integer grid derived from the part key; a real pipeline reads
  the previous iteration's factors — same plan shape, a broadcast
  equi-join).
* `gram_sums`         — per-user sufficient statistics: the six Gram
  sums, three right-hand sides, and the item count, ONE map-side-
  combined hash aggregate. All DECIMAL(38,0)-exact integers, which is
  what makes the streaming path exact: the statistics are ADDITIVE,
  so micro-batch deltas fold into a maintained table with
  `merge_aggregate` and the solve over the maintained sums is
  bit-identical to a batch rebuild — no approximation, no refresh.
* `solve_factors`     — Cramer's-rule 3x3 solve over the (maintained
  or freshly aggregated) sums: exact integer determinants, each
  emitted factor ONE IEEE division, det=0 guarded NULL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ALS_LAMBDA = 2  # integer ridge weight (scaled by the user's item count)
_DEC = "decimal(38,0)"

#: the sufficient-statistic columns `gram_sums` emits (besides the key)
GRAM_SUM_COLS = [
    "n_items",
    "a11s",
    "a12",
    "a13",
    "a22s",
    "a23",
    "a33s",
    "b1",
    "b2",
    "b3",
]


def item_factor_grid(part: DataFrame) -> DataFrame:
    """(p_partkey, f1, f2, f3): the fixed k=3 item-factor table."""
    return part.select(
        "p_partkey",
        ((F.col("p_partkey") % 7) - 3).cast("long").alias("f1"),
        (((F.col("p_partkey") * 31) % 11) - 5).cast("long").alias("f2"),
        (((F.col("p_partkey") * 17) % 5) - 2).cast("long").alias("f3"),
    )


def gram_sums(inter: DataFrame, user_col: str = "o_custkey") -> DataFrame:
    """Per-user normal-equation sufficient statistics from interaction
    rows carrying (user_col, f1, f2, f3, r). Additive: gram_sums of a
    union == column-wise sum of gram_sums of the parts (n_items is a
    count; every other column is an exact DECIMAL(38,0) sum)."""
    return inter.groupBy(user_col).agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum((F.col("f1") * F.col("f1")).cast(_DEC)).alias("a11s"),
        F.sum((F.col("f1") * F.col("f2")).cast(_DEC)).alias("a12"),
        F.sum((F.col("f1") * F.col("f3")).cast(_DEC)).alias("a13"),
        F.sum((F.col("f2") * F.col("f2")).cast(_DEC)).alias("a22s"),
        F.sum((F.col("f2") * F.col("f3")).cast(_DEC)).alias("a23"),
        F.sum((F.col("f3") * F.col("f3")).cast(_DEC)).alias("a33s"),
        F.sum((F.col("f1") * F.col("r")).cast(_DEC)).alias("b1"),
        F.sum((F.col("f2") * F.col("r")).cast(_DEC)).alias("b2"),
        F.sum((F.col("f3") * F.col("r")).cast(_DEC)).alias("b3"),
    )


def solve_factors(sums: DataFrame, user_col: str = "o_custkey") -> DataFrame:
    """Cramer 3x3 solve of (Q'Q + lambda*n*I) p = Q'r per user row.

    Exact integer determinants (DECIMAL(38,0) algebra); each factor is
    ONE IEEE division of two exact integers — bit-identical on any
    engine and independent of how the sums were accumulated (one batch
    aggregate or a maintained streaming table)."""
    ridge = F.lit(ALS_LAMBDA).cast(_DEC) * F.col("n_items").cast(_DEC)
    a11 = F.col("a11s") + ridge
    a22 = F.col("a22s") + ridge
    a33 = F.col("a33s") + ridge
    a12, a13, a23 = F.col("a12"), F.col("a13"), F.col("a23")
    b1, b2, b3 = F.col("b1"), F.col("b2"), F.col("b3")
    m11 = a22 * a33 - a23 * a23
    m12 = a12 * a33 - a23 * a13
    m13 = a12 * a23 - a22 * a13
    det = a11 * m11 - a12 * m12 + a13 * m13
    det1 = b1 * m11 - a12 * (b2 * a33 - a23 * b3) + a13 * (b2 * a23 - a22 * b3)
    det2 = a11 * (b2 * a33 - a23 * b3) - b1 * m12 + a13 * (a12 * b3 - b2 * a13)
    det3 = (
        a11 * (a22 * b3 - b2 * a23)
        - a12 * (a12 * b3 - b2 * a13)
        + b1 * m13
    )

    def _solve(num):
        return F.when(det != 0, num.cast("double") / det.cast("double"))

    return sums.select(
        user_col,
        "n_items",
        _solve(det1).alias("p1"),
        _solve(det2).alias("p2"),
        _solve(det3).alias("p3"),
    )
