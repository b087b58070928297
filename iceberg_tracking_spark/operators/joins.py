"""Join operator library (SURVEY §2.3).

The centerpiece is the grid spatial radius join — the distributed
re-expression of the reference's in-memory grid index
(reference tracking.py:442-554): bucket both sides on grid cells,
explode the probe side to its neighbor cells, equi-join on cell, then
apply the exact distance predicate. Catalyst executes it as a plain
shuffled (or broadcast) hash join on the cell key; AQE handles skewed
cells (dense frames). Neighbor-explode amplification is bounded at
(2·⌈r/cell⌉+1)^d rows on the probe side only.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def grid_radius_join(
    left: DataFrame,
    right: DataFrame,
    left_x: str,
    left_y: str,
    right_x: str,
    right_y: str,
    radius: float,
    cell_size: float | None = None,
    extra_on=None,
) -> DataFrame:
    """All (left, right) pairs with Euclidean center distance ≤ radius.

    2-D analog of reference SpatialIndex.query_radius
    (tracking.py:509-554): candidate cells = ±⌈r/cell⌉ around the probe
    cell, then the exact distance filter. `extra_on` adds equi-join
    conjuncts (e.g. same frame). Output keeps all columns of both
    inputs plus `dist`; right-side columns whose names collide with
    left columns come back prefixed `r_` (prefix grows to `rr_`… if a
    right column already uses it).
    """
    cell = float(cell_size if cell_size is not None else max(radius, 1e-9))
    reach = int(math.ceil(radius / cell))
    offsets = F.array(*[F.lit(o) for o in range(-reach, reach + 1)])

    # Self-joins are the common case — disambiguate by prefixing any
    # right column whose name collides with a left column ('r_<name>'),
    # so the output contract (all columns of both inputs) stays usable.
    lcols, rcols = set(left.columns), set(right.columns)
    taken = lcols | rcols
    prefix = "r_"
    while any((prefix + c) in taken for c in rcols):
        prefix = "r" + prefix
    renames = {c: prefix + c for c in right.columns if c in lcols}
    for old, new in renames.items():
        right = right.withColumnRenamed(old, new)
    right_x = renames.get(right_x, right_x)
    right_y = renames.get(right_y, right_y)
    if extra_on:
        extra_on = [(lc, renames.get(rc, rc)) for lc, rc in extra_on]

    l = left.withColumn("_lcx", F.floor(F.col(left_x) / cell).cast("long")).withColumn(
        "_lcy", F.floor(F.col(left_y) / cell).cast("long")
    )
    # Explode only the probe (left) side to neighbor cells.
    l = (
        l.withColumn("_ox", F.explode(offsets))
        .withColumn("_oy", F.explode(offsets))
        .withColumn("_cx", F.col("_lcx") + F.col("_ox"))
        .withColumn("_cy", F.col("_lcy") + F.col("_oy"))
        .drop("_lcx", "_lcy", "_ox", "_oy")
    )
    r = right.withColumn("_cx", F.floor(F.col(right_x) / cell).cast("long")).withColumn(
        "_cy", F.floor(F.col(right_y) / cell).cast("long")
    )
    on = [l["_cx"] == r["_cx"], l["_cy"] == r["_cy"]]
    if extra_on:
        for lc, rc in extra_on:
            on.append(l[lc] == r[rc])
    dist = F.sqrt(
        (l[left_x] - r[right_x]) ** 2 + (l[left_y] - r[right_y]) ** 2
    )
    joined = (
        l.join(r, on, "inner")
        .withColumn("dist", dist)
        .filter(F.col("dist") <= F.lit(float(radius)))
        .drop(l["_cx"]).drop(l["_cy"]).drop(r["_cx"]).drop(r["_cy"])
    )
    return joined


def grid_cell_join(
    left: DataFrame,
    right: DataFrame,
    left_x: str,
    left_y: str,
    right_x: str,
    right_y: str,
    cell_size: float,
    extra_on=None,
    cell_size_y: float | None = None,
) -> DataFrame:
    """Lossless grid prefilter for bounded-reach theta joins (IoU,
    containment): all (left, right) pairs whose 2-D anchor points fall
    within one grid cell of each other (3x3 neighborhood), no distance
    filter — the caller applies the exact predicate.

    LOSSLESS when the predicate implies |Δx| < cell_x AND |Δy| < cell_y
    at the anchors: |Δ| < cell ⇒ cell indices differ by ≤ 1, so every
    qualifying pair survives the equi-join. For box IoU with centers as
    anchors, overlap implies |Δcx| < (w_a + w_b)/2, so any cell ≥ the
    maximum box extent qualifies. Replaces a per-frame O(n²) pair
    explosion with Σ|cell|·9-bounded candidates — the difference
    between quadratic and data-linear at dense frames.

    `cell_size_y` (default: `cell_size`) sets the y-axis cell
    independently: candidate volume scales with cell_x · cell_y, so
    when the y-reach bound is tighter than the x-reach bound (flat
    boxes), an anisotropic grid cuts candidates for free — the same
    3x3 explode, smaller cells (guide §2.3: fewer pairs through the
    join; r12, measured on q_iou_argmax's 64→(49,40) tightening:
    3.35M → 2.24M candidate rows at sf0.1, identical survivors).

    Column-collision handling matches grid_radius_join (right side
    prefixed `r_` on collision).
    """
    offsets = F.array(F.lit(-1), F.lit(0), F.lit(1))
    lcols = set(left.columns)
    rcols = set(right.columns)
    taken = lcols | rcols
    prefix = "r_"
    while any((prefix + c) in taken for c in rcols):
        prefix = "r" + prefix
    renames = {c: prefix + c for c in right.columns if c in lcols}
    for old, new in renames.items():
        right = right.withColumnRenamed(old, new)
    right_x = renames.get(right_x, right_x)
    right_y = renames.get(right_y, right_y)
    if extra_on:
        extra_on = [(lc, renames.get(rc, rc)) for lc, rc in extra_on]

    cell = float(cell_size)
    cell_y = float(cell_size_y if cell_size_y is not None else cell_size)
    l = (
        left.withColumn("_lcx", F.floor(F.col(left_x) / cell).cast("long"))
        .withColumn("_lcy", F.floor(F.col(left_y) / cell_y).cast("long"))
        .withColumn("_ox", F.explode(offsets))
        .withColumn("_oy", F.explode(offsets))
        .withColumn("_cx", F.col("_lcx") + F.col("_ox"))
        .withColumn("_cy", F.col("_lcy") + F.col("_oy"))
        .drop("_lcx", "_lcy", "_ox", "_oy")
    )
    r = right.withColumn(
        "_cx", F.floor(F.col(right_x) / cell).cast("long")
    ).withColumn("_cy", F.floor(F.col(right_y) / cell_y).cast("long"))
    on = [l["_cx"] == r["_cx"], l["_cy"] == r["_cy"]]
    if extra_on:
        for lc, rc in extra_on:
            on.append(l[lc] == r[rc])
    return (
        l.join(r, on, "inner")
        .drop(l["_cx"]).drop(l["_cy"]).drop(r["_cx"]).drop(r["_cy"])
    )


def grid_radius_join_1d(
    df: DataFrame,
    value_col: str,
    radius: float,
    cell_size: float | None = None,
    id_col: str = "event_id",
) -> DataFrame:
    """1-D self radius join: unordered pairs with |a − b| ≤ radius.

    Same bucket-and-neighbor strategy on a single axis; `id_col` breaks
    symmetry (a.id < b.id) so each pair appears once.
    """
    cell = float(cell_size if cell_size is not None else max(radius, 1e-9))
    reach = int(math.ceil(radius / cell))
    offsets = F.array(*[F.lit(o) for o in range(-reach, reach + 1)])

    a = df.select(
        F.col(id_col).alias("a_id"),
        F.col(value_col).alias("a_value"),
        F.explode(
            F.transform(offsets, lambda o: F.floor(F.col(value_col) / cell).cast("long") + o)
        ).alias("_cell"),
    )
    b = df.select(
        F.col(id_col).alias("b_id"),
        F.col(value_col).alias("b_value"),
        F.floor(F.col(value_col) / cell).cast("long").alias("_cell"),
    )
    return (
        a.join(b, "_cell", "inner")
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("a_value") - F.col("b_value")) <= F.lit(float(radius)))
        )
        .drop("_cell")
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    right_cols: list[str],
) -> DataFrame:
    """As-of join: each left row gets the latest right row with
    right_time ≤ left_time for the same key (inner semantics — left
    rows with no prior right row are dropped).

    Implemented as union → single window pass (the scalable form): tag
    the streams, sort within key by (time, side) with right first at
    ties, and carry the WHOLE right row forward as one struct with
    last_value(ignore nulls) — per-column carry would stitch attributes
    from different right rows whenever a right column holds a NULL, and
    would misread a legitimately-NULL first column as "no match". ONE
    shuffle, no pair explosion — a join+argmax formulation would
    materialize |L|·|R| pairs per key before pruning, which is exactly
    what kills as-of joins at scale. Same pattern as the reference's
    per-frame "most recent track state" lookup (tracking.py:788-799),
    generalized to two tables.
    """
    collisions = set(right_cols) & set(left.columns)
    if collisions:
        raise ValueError(
            f"right_cols collide with left columns: {sorted(collisions)}; "
            "rename one side before the as-of join"
        )
    lt = (
        left.withColumn("_t", F.col(left_time))
        .withColumn("_side", F.lit(1))
        .withColumn("_r", F.lit(None).cast(
            "struct<" + ", ".join(
                f"{c}: {dict(right.dtypes)[c]}" for c in right_cols
            ) + ">"
        ))
    )
    rt = right.select(
        F.col(key),
        F.col(right_time).alias("_t"),
        F.struct(*[F.col(c) for c in right_cols]).alias("_r"),
    ).withColumn("_side", F.lit(0))
    unioned = lt.select(
        *([key, "_t", "_side", "_r"] + [c for c in left.columns if c != key])
    ).unionByName(rt, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*", F.last(F.col("_r"), ignorenulls=True).over(w).alias("_asof")
    )
    out = (
        carried.filter(F.col("_side") == 1)
        .filter(F.col("_asof").isNotNull())
        .drop("_side", "_r", "_t")
    )
    for c in right_cols:
        out = out.withColumn(c, F.col(f"_asof.{c}"))
    return out.drop("_asof")


def consecutive_frame_join(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    attr_cols: list[str] | None = None,
) -> DataFrame:
    """As-of join on the frame/time axis via `lead()` per key.

    Re-expresses the reference's consecutive-frame positive-pair
    extraction (helpers.py:481-530): for each key, pair each row with
    the same key's next row in `order_col` order. One window shuffle,
    no self-join.
    """
    attr_cols = attr_cols or [
        c for c in df.columns if c not in key_cols and c != order_col
    ]
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    out = df.select(
        *key_cols,
        F.col(order_col).alias("cur_" + order_col),
        *[F.col(c).alias("cur_" + c) for c in attr_cols],
        F.lead(order_col).over(w).alias("next_" + order_col),
        *[F.lead(c).over(w).alias("next_" + c) for c in attr_cols],
    )
    return out.filter(F.col("next_" + order_col).isNotNull())


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str | list[str],
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: the hot-key analog of the two-phase
    salted aggregation (`q_salted_agg`).

    When the probe side concentrates on a handful of key values (at
    100 TB one hot key can pin a single reducer for hours) and the
    build side is too large to broadcast, salt the probe rows into
    `n_salts` sub-keys and replicate each build row once per salt, so
    every hot key spreads across `n_salts` reducers. The result set is
    identical to the plain join — only the shuffle layout changes.

    The salt on the probe side is derived from a hash of the whole row
    (deterministic — no `rand()`, so retried tasks and the driver's
    oracle replay produce the same partitioning); the build side gets a
    `sequence`+`explode` replication, amplifying it ×`n_salts`, which
    is why this targets *medium* build sides: small ones should just
    broadcast, and Spark AQE's skew-join handles the case where both
    sides are huge. `how` supports inner/left — the salt never changes
    match semantics because every probe salt value has its replica.
    """
    if how not in ("inner", "left"):
        # right/full would emit every unmatched build REPLICA (once per
        # salt) — silently wrong rows, so reject rather than surprise.
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [key] if isinstance(key, str) else list(key)
    salt = F.pmod(F.hash(*[F.col(c) for c in skewed.columns]), F.lit(n_salts))
    probe = skewed.withColumn("__salt", salt)
    build = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return probe.join(build, on=keys + ["__salt"], how=how).drop("__salt")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket: int,
) -> DataFrame:
    """All (point, interval) pairs with start ≤ point ≤ end for the same
    key — the temporal containment join (event→session attribution,
    reading→maintenance-window matching).

    Scale path (the 1-D sibling of grid_radius_join): each interval is
    exploded to the fixed-width buckets it covers, each point maps to
    exactly ONE bucket, and candidates come from an equi-join on
    (key, bucket) with the exact containment predicate applied after.
    Catalyst executes a plain shuffled hash join — never the
    BroadcastNestedLoopJoin a raw BETWEEN condition degenerates to.
    A point meets an interval in precisely one bucket (its own), so no
    post-join dedup is needed; amplification is interval-side only,
    bounded by ⌈len/bucket⌉ + 1. Choose `bucket` near the typical
    interval length: big enough that explode stays ~2-3×, small enough
    that a bucket's candidates stay selective.

    `point_col`/`start_col`/`end_col` are numeric (e.g. epoch millis) —
    callers convert timestamps first. Column names must be disjoint
    across the two inputs (except `key`).
    """
    collisions = (set(points.columns) & set(intervals.columns)) - {key}
    if collisions:
        raise ValueError(
            f"point/interval columns collide: {sorted(collisions)}; "
            "rename one side before the interval join"
        )
    b = F.lit(int(bucket))
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / b), F.floor(F.col(end_col) / b)
            )
        ),
    )
    pt = points.withColumn("_bkt", F.floor(F.col(point_col) / b))
    return (
        pt.join(iv, [key, "_bkt"])
        .filter(
            (F.col(point_col) >= F.col(start_col))
            & (F.col(point_col) <= F.col(end_col))
        )
        .drop("_bkt")
    )
