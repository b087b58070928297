"""Core relational queries (SURVEY §2.1-§2.6 scans/filters/aggs/joins/windows).

Every query here is a Catalyst-native plan: filters/projections push to
the parquet scan, joins broadcast when a side is small, aggregates get
map-side partial aggregation for free. Rounding of float aggregates is
applied identically in the oracle SQL so cross-engine hashes match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..functions.time import epoch_ms
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------- scans

@query(
    "q_scan_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem WHERE l_shipdate < TIMESTAMP '1997-01-01'
    """,
)
def q_scan_project(spark, sf_dir):
    """S1: typed projection + pushdown filter on the fact table
    (reference MOT CSV scan, helpers.py:339-395)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    )


@query(
    "q_distinct",
    oracle="SELECT DISTINCT o_orderpriority FROM orders",
)
def q_distinct(spark, sf_dir):
    """S5: distinct projection (reference detection.py:263 unique())."""
    return _t(spark, sf_dir, "orders").select("o_orderpriority").distinct()


@query(
    "q_embed_scan",
    oracle="""
    SELECT count(*) AS n_vecs,
           CAST(avg(len(embedding)) AS DOUBLE) AS avg_dim,
           count(DISTINCT label) AS n_labels
    FROM embeddings
    """,
)
def q_embed_scan(spark, sf_dir):
    """S9: embedding-store scan (reference tracking.py:693-696)."""
    return _t(spark, sf_dir, "embeddings").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.avg(F.size("embedding")).cast("double").alias("avg_dim"),
        F.countDistinct("label").alias("n_labels"),
    )


@query(
    "q_group_collect",
    oracle="""
    SELECT user_id,
           string_agg(CAST(epoch_ms(ts) AS VARCHAR) || ':' || CAST(event_id AS VARCHAR),
                      ',' ORDER BY epoch_ms(ts), event_id) AS series
    FROM events GROUP BY user_id
    """,
)
def q_group_collect(spark, sf_dir):
    """S3: grouped nested scan — per-key ordered series collected into one
    value (reference load_icebergs_by_frame, helpers.py:398-443).
    Fingerprinted as a string so the oracle hash is portable."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.select(
            "user_id",
            F.struct(
                epoch_ms("ts").alias("t"), F.col("event_id").alias("e")
            ).alias("p"),
        )
        .groupBy("user_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("p")),
                    lambda x: F.concat_ws(":", x["t"], x["e"]),
                ),
                ",",
            ).alias("series")
        )
    )


# ------------------------------------------------------------- filters

@query(
    "q_filter_conf",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_discount
    FROM lineitem WHERE l_discount >= 0.05
    """,
)
def q_filter_conf(spark, sf_dir):
    """F1: confidence-style threshold filter (reference detection.py:1067-1069)."""
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount") >= 0.05)
        .select("l_orderkey", "l_linenumber", "l_discount")
    )


@query(
    "q_filter_expr",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           round(l_extendedprice * (1 - l_discount), 4) AS net_price
    FROM lineitem WHERE l_extendedprice * (1 - l_discount) > 30000
    """,
)
def q_filter_expr(spark, sf_dir):
    """F2: computed-column predicate — min-area-style filter `w*h >= s`
    (reference detection.py:1071-1075)."""
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(net > 30000)
        .select(
            "l_orderkey", "l_linenumber", F.round(net, 4).alias("net_price")
        )
    )


@query(
    "q_filter_range",
    oracle="""
    SELECT event_id, user_id, value
    FROM events WHERE value BETWEEN 50 AND 150
    """,
)
def q_filter_range(spark, sf_dir):
    """F3: boundary/range predicate — edge-proximity filter analog
    (reference detection.py:1077-1084)."""
    return (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").between(50, 150))
        .select("event_id", "user_id", "value")
    )


@query(
    "q_string_fmt",
    oracle="""
    SELECT event_id,
           printf('%06d', user_id) AS ukey,
           CAST(user_id AS VARCHAR) || '_' || CAST(event_id AS VARCHAR) AS ckey,
           substr(md5(CAST(user_id AS VARCHAR) || '_' || CAST(event_id AS VARCHAR)), 1, 7) AS hkey,
           ('0x' || substr(md5(CAST(user_id AS VARCHAR) || '_' || CAST(event_id AS VARCHAR)), 1, 7))::BIGINT AS hid
    FROM events
    """,
)
def q_string_fmt(spark, sf_dir):
    """F7/X10/X11/X13: zero-pad frame-id normalization, composite
    embedding key, stable md5 id hash (reference helpers.py:368-373,
    tracking.py:983-984, detection.py:338-340) — via the functions.keys
    library so the query exercises the exported expressions."""
    from ..functions.keys import composite_key, stable_id_hash, zero_pad

    ev = _t(spark, sf_dir, "events")
    ckey = composite_key(F.col("user_id"), F.col("event_id"))
    return ev.select(
        "event_id",
        zero_pad(F.col("user_id"), 6).alias("ukey"),
        ckey.alias("ckey"),
        F.substring(F.md5(ckey), 1, 7).alias("hkey"),
        stable_id_hash(F.col("user_id"), F.col("event_id")).alias("hid"),
    )


@query(
    "q_limit_offset",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_extendedprice, rnk FROM (
        SELECT l_orderkey, l_linenumber, l_extendedprice,
               row_number() OVER (ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rnk
        FROM lineitem
    ) WHERE rnk > 100 AND rnk <= 200
    """,
)
def q_limit_offset(spark, sf_dir):
    """F8/W1/W2: global order + limit/offset slice. Spark side takes
    top-200 via TakeOrderedAndProject (scalable: per-partition top-k then
    merge) and ranks only the 200 survivors."""
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    order = [
        F.col("l_extendedprice").desc(),
        F.col("l_orderkey").asc(),
        F.col("l_linenumber").asc(),
    ]
    top = li.orderBy(*order).limit(200)
    w = Window.orderBy(*order)
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") > 100)
    )


@query(
    "q_json_extract",
    oracle="""
    SELECT event_type,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
           count(*) AS n
    FROM events GROUP BY event_type
    """,
)
def q_json_extract(spark, sf_dir):
    """JSON scalar extraction over events.props (engine extension,
    SURVEY §2.7 note)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.withColumn("k", F.get_json_object("props", "$.k").cast("int"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )


# ---------------------------------------------------------------- aggs

@query(
    "q_sum_count",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           round(sum(l_extendedprice), 2) AS sum_base,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
           round(avg(l_quantity), 4) AS avg_qty,
           round(avg(l_extendedprice), 4) AS avg_price,
           round(avg(l_discount), 6) AS avg_disc,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q_sum_count(spark, sf_dir):
    """A7: TPC-H-Q1-shaped rollup — sum/avg/count with map-side partial
    aggregation (reference eval.py:260-264 count rollups)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp")
    )
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base"),
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
        ).alias("sum_disc_price"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


@query(
    "q_count_distinct",
    oracle="""
    SELECT count(DISTINCT o_custkey) AS n_customers,
           count(DISTINCT o_orderpriority) AS n_priorities,
           count(*) AS n_orders
    FROM orders
    """,
)
def q_count_distinct(spark, sf_dir):
    """A2: exact distinct counting (reference detection.py:370-375)."""
    return _t(spark, sf_dir, "orders").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@query(
    "q_approx_count_distinct",
    oracle="""
    SELECT count(DISTINCT l_partkey) AS exact_parts,
           count(DISTINCT l_orderkey) AS exact_orders,
           true AS parts_within_tol,
           true AS orders_within_tol
    FROM lineitem
    """,
)
def q_approx_count_distinct(spark, sf_dir):
    """A2 (scale path): approx_count_distinct — the 100 TB form of
    distinct counting. The HLL estimate itself is engine-specific, so
    the checkable contract is the estimate's relative error vs the
    exact count: `*_within_tol` asserts |approx-exact|/exact ≤ 5%
    (HLL at rsd=0.01 — 5σ headroom), which the oracle states as a
    constant `true` next to the exact counts. A sketch regression
    (wrong column, wrong rsd, broken merge) flips the boolean and
    fails the hash."""
    tol = 0.05
    agg = _t(spark, sf_dir, "lineitem").agg(
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_partkey", 0.01).alias("ap"),
        F.approx_count_distinct("l_orderkey", 0.01).alias("ao"),
    )
    return agg.select(
        "exact_parts",
        "exact_orders",
        (
            F.abs(F.col("ap") - F.col("exact_parts"))
            / F.col("exact_parts")
            <= tol
        ).alias("parts_within_tol"),
        (
            F.abs(F.col("ao") - F.col("exact_orders"))
            / F.col("exact_orders")
            <= tol
        ).alias("orders_within_tol"),
    )


@query(
    "q_approx_quantile",
    oracle="""
    SELECT round(quantile_cont(l_extendedprice, 0.25), 4) AS exact_p25,
           round(quantile_cont(l_extendedprice, 0.50), 4) AS exact_p50,
           round(quantile_cont(l_extendedprice, 0.75), 4) AS exact_p75,
           true AS p25_ok, true AS p50_ok, true AS p75_ok
    FROM lineitem
    """,
)
def q_approx_quantile(spark, sf_dir):
    """A3 (scale path): percentile_approx — the sketch form of quantile
    computation (one pass, mergeable, the 100 TB way to get
    distribution stats). Sketch values are engine-specific, so the
    checkable contract mirrors q_approx_count_distinct: each approx
    quantile must land between the exact quantiles at p±0.01
    (percentile_approx at accuracy=1000 bounds rank error to 0.1% —
    10× headroom); the oracle states the booleans as `true` next to
    the exact interpolated quantiles."""
    probes = "array(0.24, 0.25, 0.26, 0.49, 0.50, 0.51, 0.74, 0.75, 0.76)"
    agg = _t(spark, sf_dir, "lineitem").agg(
        F.expr(f"percentile(l_extendedprice, {probes})").alias("ex"),
        F.expr(
            "percentile_approx(l_extendedprice, array(0.25, 0.50, 0.75), 1000)"
        ).alias("ap"),
    )
    def ok(i: int) -> F.Column:
        return (F.col("ap")[i] >= F.col("ex")[3 * i]) & (
            F.col("ap")[i] <= F.col("ex")[3 * i + 2]
        )
    return agg.select(
        F.round(F.col("ex")[1], 4).alias("exact_p25"),
        F.round(F.col("ex")[4], 4).alias("exact_p50"),
        F.round(F.col("ex")[7], 4).alias("exact_p75"),
        ok(0).alias("p25_ok"),
        ok(1).alias("p50_ok"),
        ok(2).alias("p75_ok"),
    )


@query(
    "q_stats",
    oracle="""
    SELECT round(avg(l_extendedprice), 4) AS mean_price,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
           round(stddev_pop(l_extendedprice), 4) AS std_price,
           min(l_extendedprice) AS min_price,
           max(l_extendedprice) AS max_price
    FROM lineitem
    """,
)
def q_stats(spark, sf_dir):
    """A3: the 5-stat aggregate — Mean/Median/Std/Min/Max per feature
    (reference feature_extraction.py:112-122; population stddev as the
    reference uses np.std)."""
    return _t(spark, sf_dir, "lineitem").agg(
        F.round(F.avg("l_extendedprice"), 4).alias("mean_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        F.round(F.stddev_pop("l_extendedprice"), 4).alias("std_price"),
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
    )


@query(
    "q_global_norm",
    oracle="""
    SELECT event_id,
           round(value / (SELECT max(value) FROM events), 6) AS norm_value
    FROM events
    """,
)
def q_global_norm(spark, sf_dir):
    """A5: global-max normalization — two-pass agg-then-transform
    (reference feature_extraction.py:109-111). Implemented as scalar agg
    + broadcast cross join (no single-partition window)."""
    ev = _t(spark, sf_dir, "events")
    mx = ev.agg(F.max("value").alias("_mx"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .select(
            "event_id", F.round(F.col("value") / F.col("_mx"), 6).alias("norm_value")
        )
    )


@query(
    "q_cond_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_disc,
           CAST(sum(CASE WHEN l_quantity >= 25 THEN 1 ELSE 0 END) AS BIGINT) AS n_bulk,
           CAST(sum(CASE WHEN l_tax > 0.04 AND l_discount <= 0.02 THEN 1 ELSE 0 END) AS BIGINT) AS n_taxed_cheap,
           count(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_cond_agg(spark, sf_dir):
    """A8: conditional tallies — CLR_TP/CLR_FN-style `sum(when(cond,1))`
    (reference eval.py:216-254)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.sum(F.when(F.col("l_discount") > 0.05, 1).otherwise(0)).alias("n_high_disc"),
        F.sum(F.when(F.col("l_quantity") >= 25, 1).otherwise(0)).alias("n_bulk"),
        F.sum(
            F.when((F.col("l_tax") > 0.04) & (F.col("l_discount") <= 0.02), 1).otherwise(0)
        ).alias("n_taxed_cheap"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q_weighted_avg",
    oracle="""
    SELECT n.n_name,
           round(sum(o.o_totalprice * ln.n_items) / sum(ln.n_items), 4) AS w_avg_price
    FROM orders o
    JOIN (SELECT l_orderkey, count(*) AS n_items FROM lineitem GROUP BY l_orderkey) ln
      ON o.o_orderkey = ln.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q_weighted_avg(spark, sf_dir):
    """A10: weighted average across groups — combined LocA
    `Σ(v·w)/Σw` (reference eval.py:494-499)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    per_order = li.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("n_items"))
    return (
        o.join(per_order, o.o_orderkey == per_order.l_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(
                F.sum(F.col("o_totalprice") * F.col("n_items")) / F.sum("n_items"), 4
            ).alias("w_avg_price")
        )
    )


@query(
    "q_two_level_agg",
    oracle="""
    SELECT bucket, count(*) AS n_users FROM (
        SELECT user_id,
               CASE WHEN purchase_ratio >= 0.5 THEN 'high'
                    WHEN purchase_ratio >= 0.2 THEN 'mid'
                    ELSE 'low' END AS bucket
        FROM (
            SELECT user_id,
                   CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS DOUBLE)
                     / count(*) AS purchase_ratio
            FROM events GROUP BY user_id
        )
    ) GROUP BY bucket
    """,
)
def q_two_level_agg(spark, sf_dir):
    """A9: two-level aggregation — per-key coverage ratio → bucket →
    bucket counts (reference MT/PT/ML, eval.py:319-349)."""
    ev = _t(spark, sf_dir, "events")
    ratios = ev.groupBy("user_id").agg(
        (
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).cast("double")
            / F.count(F.lit(1))
        ).alias("purchase_ratio")
    )
    bucketed = ratios.select(
        "user_id",
        F.when(F.col("purchase_ratio") >= 0.5, "high")
        .when(F.col("purchase_ratio") >= 0.2, "mid")
        .otherwise("low")
        .alias("bucket"),
    )
    return bucketed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_users"))


@query(
    "q_rollup",
    oracle="""
    SELECT r.r_name, n.n_name,
           round(sum(o.o_totalprice), 2) AS revenue,
           count(*) AS n_orders
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
)
def q_rollup(spark, sf_dir):
    """A11: per-group rows + COMBINED rollup row (reference
    combine_metrics, eval.py:460-508) via ROLLUP grouping sets."""
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        F.count(F.lit(1)).alias("n_orders"),
    )


# --------------------------------------------------------------- joins

@query(
    "q_equijoin",
    oracle="""
    SELECT p.p_brand,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue,
           count(*) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
)
def q_equijoin(spark, sf_dir):
    """J4: dimension equi-join (embedding-lookup analog,
    tracking.py:981-998). `part` is broadcast — no shuffle of the fact
    table on the join."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@query(
    "q_semi_anti",
    oracle="""
    SELECT c_custkey, 'with' AS status FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    UNION ALL
    SELECT c_custkey, 'without' AS status FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def q_semi_anti(spark, sf_dir):
    """J7: matched/unmatched split via left_semi + left_anti
    (reference eval.py:245-254 TP vs FN)."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    with_o = c.join(o, "c_custkey", "left_semi").select(
        "c_custkey", F.lit("with").alias("status")
    )
    without_o = c.join(o, "c_custkey", "left_anti").select(
        "c_custkey", F.lit("without").alias("status")
    )
    return with_o.unionByName(without_o)


@query(
    "q_having_semijoin",
    oracle="""
    SELECT e.event_id, e.user_id FROM events e
    WHERE e.user_id IN (
        SELECT user_id FROM events GROUP BY user_id HAVING count(*) >= 50
    )
    """,
)
def q_having_semijoin(spark, sf_dir):
    """S12/A6: group-count HAVING + semi-join back — the track-length
    post-filter (reference tracking.py:1152-1174)."""
    ev = _t(spark, sf_dir, "events")
    keep = (
        ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 50)
        .select("user_id")
    )
    return ev.join(F.broadcast(keep), "user_id", "left_semi").select(
        "event_id", "user_id"
    )


@query(
    "q_antijoin_sample",
    oracle="""
    SELECT o.o_orderkey, o.o_orderpriority FROM orders o
    WHERE NOT EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_discount > 0.08
    ) AND o.o_orderkey % 7 = 0
    """,
)
def q_antijoin_sample(spark, sf_dir):
    """J6: anti-join + deterministic sampling. The reference samples
    negatives with `random.sample` (embedding.py:917-931); cross-engine
    RNG parity is impossible, so the declared query uses a deterministic
    modulus sample (SURVEY §4 note 4)."""
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_discount") > 0.08).select(
        F.col("l_orderkey").alias("o_orderkey")
    )
    return (
        o.join(li, "o_orderkey", "left_anti")
        .filter(F.col("o_orderkey") % 7 == 0)
        .select("o_orderkey", "o_orderpriority")
    )


@query(
    "q_union",
    oracle="""
    SELECT event_id, user_id, event_type FROM events WHERE event_type = 'error'
    UNION
    SELECT event_id, user_id, event_type FROM events WHERE value > 250
    """,
)
def q_union(spark, sf_dir):
    """SO1: union + dedup of two slices (reference ConcatDataset,
    detection.py:735)."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "event_type", "value")
    a = ev.filter(F.col("event_type") == "error")
    b = ev.filter(F.col("value") > 250)
    return a.unionByName(b).select("event_id", "user_id", "event_type").distinct()


@query(
    "q_intersect",
    oracle="""
    SELECT user_id FROM events WHERE ts < TIMESTAMP '2024-01-08'
    INTERSECT
    SELECT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-22'
    """,
)
def q_intersect(spark, sf_dir):
    """SO3: membership intersection — ids alive in both periods
    (reference helpers.py:517-522)."""
    ev = _t(spark, sf_dir, "events")
    early = ev.filter(F.col("ts") < F.lit("2024-01-08").cast("timestamp")).select("user_id")
    late = ev.filter(F.col("ts") >= F.lit("2024-01-22").cast("timestamp")).select("user_id")
    return early.intersect(late)


@query(
    "q_group_percentiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.25), 4) AS p25,
           round(quantile_cont(l_quantity, 0.5), 4) AS p50,
           round(quantile_cont(l_quantity, 0.75), 4) AS p75,
           round(quantile_cont(l_quantity, 0.99), 4) AS p99
    FROM lineitem GROUP BY l_returnflag
    """,
)
def q_group_percentiles(spark, sf_dir):
    """Exact interpolated percentiles per group (p25/p50/p75/p99) —
    the distribution profile behind threshold derivation (A4) and data
    audits. Spark's `percentile` is the exact sort-based aggregate;
    at 100 TB swap for `percentile_approx` (t-digest, one pass,
    mergeable) — the rows-only q_approx_count_distinct pattern."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        *[
            F.round(
                F.expr(f"percentile(l_quantity, {p})"), 4
            ).alias(f"p{int(p * 100)}")
            for p in (0.25, 0.5, 0.75, 0.99)
        ]
    )


@query(
    "q_corr_covar",
    oracle="""
    SELECT l_linestatus,
           round(corr(l_quantity, l_extendedprice), 6) AS corr_qty_price,
           round(covar_pop(l_quantity, l_extendedprice), 4) AS covar_qty_price,
           round(stddev_samp(l_discount), 6) AS std_discount
    FROM lineitem GROUP BY l_linestatus
    """,
)
def q_corr_covar(spark, sf_dir):
    """Bivariate statistics per group: Pearson correlation, population
    covariance, sample stddev — single-pass mergeable moment aggregates
    (the same co-moment recurrences Spark uses distributed)."""
    li = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("corr_qty_price"),
        F.round(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias(
            "covar_qty_price"
        ),
        F.round(F.stddev_samp("l_discount"), 6).alias("std_discount"),
    )


@query(
    "q_string_funcs",
    oracle="""
    SELECT o_orderkey,
           upper(substring(o_orderpriority, 1, 3)) AS pri3,
           replace(o_orderpriority, '-', '_') AS pri_snake,
           CAST(length(o_orderpriority) AS BIGINT) AS pri_len,
           left(o_orderstatus || '/' || o_orderpriority, 8) AS status_key,
           CAST(strpos(o_orderpriority, '-') AS BIGINT) AS dash_at
    FROM orders
    """,
)
def q_string_funcs(spark, sf_dir):
    """String function family: substring/upper/replace/length/concat/
    left/position — all native codegen expressions (the engine has no
    Python in any scalar path)."""
    o = _t(spark, sf_dir, "orders")
    combo = F.concat(F.col("o_orderstatus"), F.lit("/"), F.col("o_orderpriority"))
    return o.select(
        "o_orderkey",
        F.upper(F.substring("o_orderpriority", 1, 3)).alias("pri3"),
        F.replace(
            F.col("o_orderpriority"), F.lit("-"), F.lit("_")
        ).alias("pri_snake"),
        F.length("o_orderpriority").cast("long").alias("pri_len"),
        F.substring(combo, 1, 8).alias("status_key"),
        F.instr(F.col("o_orderpriority"), "-").cast("long").alias("dash_at"),
    )


@query(
    "q_array_funcs",
    oracle=f"""
    SELECT doc_id,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct,
           list_sort(list_distinct(toks))[1] AS first_token,
           array_to_string(list_sort(list_distinct(toks))[1:3], '|') AS top3_joined,
           CAST(list_contains(toks, 'the') AS BIGINT) AS has_the
    FROM (SELECT doc_id, {{toks}} AS toks FROM documents)
    """.format(toks="list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"),
)
def q_array_funcs(spark, sf_dir):
    """Array function family: distinct/sort/slice/join/contains over the
    token array — the collection algebra used by the shingle and
    vocabulary pipelines, all JVM-side. Array-typed outputs are reduced
    to scalars (element/joined string) because engines stringify array
    cells differently in the hash compare."""
    from .queries_llm import _spark_tokens

    d = _t(spark, sf_dir, "documents").withColumn(
        "toks", _spark_tokens(F.col("text"))
    )
    dedup_sorted = F.array_sort(F.array_distinct("toks"))
    return d.select(
        "doc_id",
        F.size(F.array_distinct("toks")).cast("long").alias("n_distinct"),
        F.element_at(dedup_sorted, 1).alias("first_token"),
        F.array_join(F.slice(dedup_sorted, 1, 3), "|").alias("top3_joined"),
        F.array_contains("toks", "the").cast("long").alias("has_the"),
    )


@query(
    "q_star_join",
    oracle="""
    SELECT r_name, n_name,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(*) AS n_items
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN supplier ON s_nationkey = n_nationkey
    JOIN lineitem ON l_suppkey = s_suppkey
    JOIN orders   ON o_orderkey = l_orderkey
    WHERE o_orderstatus = 'F'
    GROUP BY r_name, n_name
    """,
)
def q_star_join(spark, sf_dir):
    """Five-way star join (TPC-H Q5 shape): region→nation→supplier are
    broadcast dimensions chained onto the lineitem fact, orders joins on
    the fact key with its filter pushed below the join. One fact shuffle
    total; Catalyst's join reordering + broadcast promotion handle the
    rest — the canonical warehouse query the MOT reference never needed
    but a complete engine must run well."""
    r = _t(spark, sf_dir, "region")
    n = _t(spark, sf_dir, "nation")
    s = _t(spark, sf_dir, "supplier")
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    joined = (
        li.join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
    )
    return joined.groupBy("r_name", "n_name").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q_ship_priority",
    oracle="""
    SELECT l_orderkey,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1996-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q_ship_priority(spark, sf_dir):
    """TPC-H Q3 shape (shipping priority): selective dimension filter
    broadcast onto the fact, date predicates pushed to both scans,
    aggregate, then global top-10 by revenue — executed as
    TakeOrderedAndProject (per-partition top-k, never a full sort)."""
    c = _t(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1996-01-01").cast("timestamp")
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).join(
        F.broadcast(c), o["o_custkey"] == c["c_custkey"]
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
        ).alias("revenue")
    )
    return (
        agg.select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


@query(
    "q_big_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, round(o_totalprice, 2) AS o_totalprice,
           round(total_qty, 2) AS total_qty
    FROM orders
    JOIN (
        SELECT l_orderkey, sum(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 150
    ) big ON o_orderkey = big.l_orderkey
    """,
)
def q_big_orders(spark, sf_dir):
    """TPC-H Q18 shape (large-volume orders): aggregate the fact first
    (map-side combine shrinks it to one row per order), HAVING-filter,
    then join the small survivor set back to orders — aggregate-before-
    join, the order-of-operations that matters at 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    return o.join(F.broadcast(big), o["o_orderkey"] == big["l_orderkey"]).select(
        "o_orderkey",
        "o_custkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
        F.round("total_qty", 2).alias("total_qty"),
    )


@query(
    "q_corr_scalar_subquery",
    oracle="""
    SELECT p.p_brand,
           count(*) AS n_small_lots,
           round(sum(l.l_extendedprice), 2) AS small_lot_revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_quantity < (
        SELECT 0.5 * avg(l2.l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
    )
    GROUP BY p.p_brand
    """,
)
def q_corr_scalar_subquery(spark, sf_dir):
    """TPC-H Q17 shape — correlated scalar subquery (per-part average
    quantity) gating the outer row. The DataFrame form IS the
    decorrelated plan Catalyst would produce: aggregate the fact once
    per correlation key (map-side combine), broadcast-join the tiny
    per-part averages back, filter, aggregate. One pass over lineitem
    per side, no per-row subquery execution — the only formulation that
    survives 100 TB."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand")
    part_avg = li.groupBy("l_partkey").agg(
        (F.avg("l_quantity") * 0.5).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(part_avg), "l_partkey")
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_small_lots"),
            F.round(F.sum("l_extendedprice"), 2).alias("small_lot_revenue"),
        )
    )


@query(
    "q_not_exists",
    oracle="""
    SELECT c.c_mktsegment,
           count(*) AS n_never_urgent,
           round(avg(c.c_acctbal), 2) AS avg_balance
    FROM customer c
    WHERE c.c_acctbal > (
        SELECT avg(c2.c_acctbal) FROM customer c2
        WHERE c2.c_mktsegment = c.c_mktsegment AND c2.c_acctbal < 5000
    )
    AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderpriority = '1-URGENT'
    )
    GROUP BY c.c_mktsegment
    """,
)
def q_not_exists(spark, sf_dir):
    """TPC-H Q22 shape — correlated NOT EXISTS plus a correlated scalar
    aggregate: above-segment-threshold customers who never placed an
    URGENT-priority order. Decorrelated form: per-segment thresholds
    (5-row broadcast), then a LEFT ANTI join against the filtered
    orders for the NOT EXISTS — the anti join is the only shuffle, the
    priority filter pushes to the orders scan, and only customer keys
    ship through it."""
    c = _t(spark, sf_dir, "customer")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    seg_avg = (
        c.filter(F.col("c_acctbal") < 5000)
        .groupBy("c_mktsegment")
        .agg(F.avg("c_acctbal").alias("seg_avg"))
    )
    return (
        c.join(F.broadcast(seg_avg), "c_mktsegment")
        .filter(F.col("c_acctbal") > F.col("seg_avg"))
        .join(o, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_never_urgent"),
            F.round(F.avg("c_acctbal"), 2).alias("avg_balance"),
        )
    )


@query(
    "q_minmax_by",
    oracle="""
    SELECT o_custkey,
           max(CASE WHEN rn_hi = 1 THEN o_orderkey END) AS best_order,
           round(max(o_totalprice), 2) AS best_price,
           max(CASE WHEN rn_lo = 1 THEN o_orderkey END) AS cheapest_order,
           round(min(o_totalprice), 2) AS cheapest_price
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice DESC, o_orderkey DESC) AS rn_hi,
               row_number() OVER (PARTITION BY o_custkey
                   ORDER BY o_totalprice ASC, o_orderkey ASC) AS rn_lo
        FROM orders
    )
    GROUP BY o_custkey
    """,
)
def q_minmax_by(spark, sf_dir):
    """`max_by`/`min_by` argmax aggregates: each customer's priciest and
    cheapest order in ONE hash aggregate — no window, no self-join, no
    sort. The ordering value is a (price, orderkey) struct so ties are
    deterministic (bare max_by on a tied price is engine-unstable).
    DuckDB's arg_max can't take a struct ordering key, so the oracle is
    the row_number() formulation — same result, but the Spark plan is
    the one that scales: a single partial-aggregating shuffle instead
    of a per-customer sort."""
    o = _t(spark, sf_dir, "orders")
    hi = F.struct(F.col("o_totalprice"), F.col("o_orderkey"))
    return o.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", hi).alias("best_order"),
        F.round(F.max("o_totalprice"), 2).alias("best_price"),
        F.min_by("o_orderkey", hi).alias("cheapest_order"),
        F.round(F.min("o_totalprice"), 2).alias("cheapest_price"),
    )


@query(
    "q_unpivot",
    oracle="""
    SELECT l_orderkey, l_linenumber, measure, round(val, 2) AS val
    FROM (
        UNPIVOT (SELECT l_orderkey, l_linenumber,
                        l_quantity, l_extendedprice, l_discount
                 FROM lineitem)
        ON l_quantity, l_extendedprice, l_discount
        INTO NAME measure VALUE val
    )
    """,
)
def q_unpivot(spark, sf_dir):
    """Wide-to-long melt (the inverse of `q_pivot`): each lineitem's
    three measures become (measure, value) rows via the native
    `unpivot` operator — a zero-shuffle map-side explode (Expand node),
    NOT a 3-way self-union that would re-scan the table per measure.
    The long layout is what metric stores and plotting pipelines
    ingest at scale."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.select(
            "l_orderkey", "l_linenumber",
            "l_quantity", "l_extendedprice", "l_discount",
        )
        .unpivot(
            ["l_orderkey", "l_linenumber"],
            ["l_quantity", "l_extendedprice", "l_discount"],
            "measure",
            "val",
        )
        # DuckDB's UNPIVOT drops NULL-valued cells; Spark keeps them.
        # Pin the drop-NULLs contract so the engines can't diverge on
        # schema-evolved data with NULL measures.
        .filter(F.col("val").isNotNull())
        .select(
            "l_orderkey", "l_linenumber", "measure",
            F.round("val", 2).alias("val"),
        )
    )
