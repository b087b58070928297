"""Lloyd's k-means as an iterative DataFrame program.

The missing piece between the data-sampled IVF quantizer
(`similarity.py:ivf_topk`, reference embedding.py clustering usage) and
a trained one: each Lloyd iteration is (1) assign every vector to its
nearest centroid — a broadcast of the k-row centroid table and a hash
AGGREGATE argmin (`windows.py:argmax_agg`), no sort window — and (2)
recompute centroids as per-cluster element-wise means via
`posexplode` + groupBy(cid, pos). Both shuffles carry only k·dim rows
after map-side combine, so an iteration at 100 TB costs one broadcast
pass over the data plus a tiny aggregate; the data relation is never
collected. Only the k-row centroid table hits the driver per iteration
(the same contract as Spark MLlib's own KMeans driver loop).

Determinism: initial centroids are the k lowest `hash(id)` rows (a
seedless deterministic pseudo-shuffle — re-runs and retried stages pick
identical seeds), distance folds are left-to-right (`(a-b)^2` sequence
fold, bit-identical to the DuckDB oracle's `list_reduce`), and argmin
ties break toward the lowest centroid id. Empty clusters keep their
previous centroid.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .windows import argmax_agg


def sq_dist(a: Column, b: Column) -> Column:
    """Left-to-right squared-L2 fold (order-stable across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def duck_sqdist_sql(a: str, b: str, dim: int) -> str:
    """DuckDB squared-L2, bit-identical fold order to `sq_dist`."""
    return (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"i -> ({a}[i] - {b}[i]) * ({a}[i] - {b}[i])), (x, y) -> x + y)"
    )


def assign_clusters(
    vectors: DataFrame,
    centroids: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "e",
) -> DataFrame:
    """Nearest-centroid assignment: (id, vec, cid, dist) per vector.

    Broadcast crossJoin against the k-row centroid table `(cid, ce)`,
    argmin as a single hash aggregate (max of (-dist, -cid) struct —
    ties go to the lowest cid on both engines).
    """
    scored = vectors.crossJoin(F.broadcast(centroids)).withColumn(
        "_d", sq_dist(F.col(vec_col), F.col("ce"))
    )
    return argmax_agg(
        scored,
        [id_col],
        F.struct((-F.col("_d")).alias("_nd"), (-F.col("cid")).alias("_nc")),
        {
            "cid": F.col("cid"),
            vec_col: F.col(vec_col),
            "dist": F.col("_d"),
        },
    )


def update_centroids(
    assigned: DataFrame, vec_col: str = "e", round_digits: int | None = None
) -> DataFrame:
    """Per-cluster element-wise mean -> (cid, ce, n_members).

    posexplode + groupBy(cid, pos) keeps the shuffle at k*dim rows
    after partial aggregation regardless of input size; the array is
    rebuilt by sorting (pos, mean) structs — `array_sort` on structs
    orders by the leading field, so positions reassemble in order.

    `round_digits` quantizes each mean component — the oracle-parity
    knob: double means depend on summation order, so an engine-mirrored
    iterative loop rounds centroids every iteration to keep the two
    trajectories bit-identical (q_kmeans uses 4, like q_kmeans_step).
    """
    ex = assigned.select(
        "cid", F.posexplode(F.col(vec_col)).alias("pos", "v")
    )
    mean = F.avg("v") if round_digits is None else F.round(F.avg("v"), round_digits)
    m = ex.groupBy("cid", "pos").agg(
        mean.alias("m"), F.count(F.lit(1)).alias("n")
    )
    return (
        m.groupBy("cid")
        .agg(
            F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("pm"),
            F.max("n").alias("n_members"),
        )
        .select(
            "cid",
            F.transform("pm", lambda s: s["m"]).alias("ce"),
            "n_members",
        )
    )


def kmeans(
    vectors: DataFrame,
    k: int,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "e",
    init: DataFrame | None = None,
    round_digits: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Full Lloyd loop; returns (centroids, assignments) DataFrames.

    Centroids are re-created as literal DataFrames each iteration (k
    rows through the driver — deliberate, it truncates the iterative
    lineage so the plan does not grow with n_iter).

    `init`: optional (cid, ce) seed table; default seeds are the k
    lowest `hash(id)` rows (deterministic pseudo-shuffle). Pass an
    explicit engine-portable seed (e.g. a vec_id stride) plus
    `round_digits` when the trajectory must be mirrored in SQL on
    another engine (q_kmeans's exact 3-iteration DuckDB oracle).
    """
    spark = vectors.sparkSession
    if init is not None:
        seed_rows = init.orderBy("cid").collect()
        cents = [
            (int(r["cid"]), [float(x) for x in r["ce"]]) for r in seed_rows
        ]
    else:
        seed_rows = (
            vectors.orderBy(
                F.pmod(F.hash(F.col(id_col)), F.lit(1 << 30)).asc(),
                F.col(id_col).asc(),
            )
            .limit(k)
            .select(vec_col)
            .collect()
        )
        cents = [
            (i, [float(x) for x in row[vec_col]])
            for i, row in enumerate(seed_rows)
        ]
    if len(cents) < k:
        raise ValueError(
            f"kmeans needs >= k rows to seed centroids: k={k}, rows={len(cents)}"
        )
    schema = "cid INT, ce ARRAY<DOUBLE>"
    for _ in range(n_iter):
        cdf = spark.createDataFrame(cents, schema)
        assigned = assign_clusters(vectors, cdf, id_col, vec_col)
        got = {
            row["cid"]: [float(x) for x in row["ce"]]
            for row in update_centroids(assigned, vec_col, round_digits).collect()
        }
        cents = [(cid, got.get(cid, ce)) for cid, ce in cents]
    cdf = spark.createDataFrame(cents, schema)
    return cdf, assign_clusters(vectors, cdf, id_col, vec_col)
