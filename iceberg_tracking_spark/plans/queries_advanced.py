"""Advanced relational queries: windows, theta-joins, spatial joins,
sessionization (SURVEY §2.3 J1-J3, §2.5 W3-W8, §2.9 analogs)."""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..operators.joins import consecutive_frame_join, grid_radius_join_1d
from ..operators.windows import (
    argmax_agg,
    islands_longest_streak,
    mutual_argmax,
    top_k_per_group,
)
from ..sources.tables import load_table, scatter
from ..functions.time import epoch_ms
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str):
    return load_table(spark, sf_dir, name)


@query(
    "q_theta_argmax",
    oracle="""
    SELECT o_orderkey, l_linenumber, round(net, 4) AS best_net FROM (
        SELECT o.o_orderkey, l.l_linenumber,
               l.l_extendedprice * (1 - l.l_discount) AS net,
               row_number() OVER (
                   PARTITION BY o.o_orderkey
                   ORDER BY l.l_extendedprice * (1 - l.l_discount) DESC, l.l_linenumber
               ) AS rn
        FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    ) WHERE rn = 1
    """,
)
def q_theta_argmax(spark, sf_dir):
    """J2: join + per-left argmax on a computed expression — the greedy
    IoU matching shape (reference eval.py:221-254): best candidate per
    key by score desc with a deterministic tie-break. Executed as a
    single hash aggregate (`argmax_agg`: max of a (score, -tiebreak)
    struct with map-side combine), not a sort window — 3× faster at
    sf0.1 and the shuffle carries one row per group per partition. The
    oracle states the equivalent row_number() form."""
    o = _t(spark, sf_dir, "orders").select("o_orderkey")
    li = _t(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    pairs = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderkey", "l_linenumber", net.alias("net")
    )
    best = argmax_agg(
        pairs,
        ["o_orderkey"],
        F.struct(F.col("net"), (-F.col("l_linenumber")).alias("_neg_ln")),
        {"l_linenumber": F.col("l_linenumber"), "net": F.col("net")},
    )
    return best.select(
        "o_orderkey", "l_linenumber", F.round("net", 4).alias("best_net")
    )


@query(
    "q_dedup_rank",
    oracle="""
    SELECT user_id, event_id, value FROM (
        SELECT user_id, event_id, value,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY value DESC, ts, event_id
               ) AS rn
        FROM events
    ) WHERE rn = 1
    """,
)
def q_dedup_rank(spark, sf_dir):
    """W3 (core): rank-dedup — keep the best row per key, the
    window-dedup heart of NMS (reference detection.py:1223-1261)."""
    ev = _t(spark, sf_dir, "events")
    return top_k_per_group(
        ev.select("user_id", "event_id", "value", "ts"),
        ["user_id"],
        [F.col("value").desc(), F.col("ts").asc(), F.col("event_id").asc()],
        k=1,
    ).select("user_id", "event_id", "value")


@query(
    "q_lag_change",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN prev_type IS NOT NULL AND prev_type <> event_type
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_changes,
           CAST(sum(CASE WHEN prev_ts IS NOT NULL
                         AND epoch_ms(ts) - epoch_ms(prev_ts) > 3600000
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps
    FROM (
        SELECT user_id, ts, event_type,
               lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type,
               lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        FROM events
    ) GROUP BY user_id
    """,
)
def q_lag_change(spark, sf_dir):
    """W8: lag-based change detection — ID-switch + fragmentation
    counters (reference eval.py:291-316)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    with_lags = ev.select(
        "user_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lag("ts").over(w).alias("prev_ts"),
    )
    return with_lags.groupBy("user_id").agg(
        F.sum(
            F.when(
                F.col("prev_type").isNotNull()
                & (F.col("prev_type") != F.col("event_type")),
                1,
            ).otherwise(0)
        ).alias("n_changes"),
        F.sum(
            F.when(
                F.col("prev_ts").isNotNull()
                & (
                    epoch_ms("ts") - epoch_ms("prev_ts") > 3600000
                ),
                1,
            ).otherwise(0)
        ).alias("n_gaps"),
    )


@query(
    "q_selfjoin_lead",
    oracle="""
    SELECT user_id, event_id AS cur_event_id, next_event_id,
           CAST(epoch_ms(next_ts) - epoch_ms(ts) AS BIGINT) AS delta_ms
    FROM (
        SELECT user_id, event_id, ts,
               lead(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_event_id,
               lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        FROM events
    ) WHERE next_event_id IS NOT NULL
    """,
)
def q_selfjoin_lead(spark, sf_dir):
    """J3: consecutive-row as-of self-join via lead() — the
    consecutive-frame positive-pair extraction (reference
    helpers.py:481-530). One window shuffle, no join."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            "user_id",
            F.col("event_id").alias("cur_event_id"),
            "ts",
            F.lead("event_id").over(w).alias("next_event_id"),
            F.lead("ts").over(w).alias("next_ts"),
        )
        .filter(F.col("next_event_id").isNotNull())
        .select(
            "user_id",
            "cur_event_id",
            "next_event_id",
            (epoch_ms("next_ts") - epoch_ms("ts")).alias("delta_ms"),
        )
    )


@query(
    "q_islands",
    oracle="""
    SELECT user_id, event_type, longest_streak FROM (
        SELECT user_id, event_type, streak AS longest_streak,
               row_number() OVER (
                   PARTITION BY user_id ORDER BY streak DESC, event_type
               ) AS rn
        FROM (
            SELECT user_id, event_type, grp, count(*) AS streak
            FROM (
                SELECT user_id, event_type,
                       row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
                     - row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts, event_id)
                       AS grp
                FROM events
            ) GROUP BY user_id, event_type, grp
        )
    ) WHERE rn = 1
    """,
)
def q_islands(spark, sf_dir):
    """A12: gaps-and-islands — longest contiguous same-value run per key
    (reference IDTP longest-segment computation, eval.py:355-418)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "_ord", F.struct(F.col("ts"), F.col("event_id"))
    )
    return islands_longest_streak(
        ev, key_cols=["user_id"], order_col="_ord", island_col="event_type"
    )


@query(
    "q_mutual_argmax",
    oracle="""
    WITH pairs AS (
        SELECT s.s_suppkey, c.c_custkey, s.s_nationkey AS nationkey,
               round(abs(s.s_acctbal - c.c_acctbal), 2) AS affinity
        FROM supplier s JOIN customer c ON s.s_nationkey = c.c_nationkey
    ), ranked AS (
        SELECT *,
               row_number() OVER (PARTITION BY s_suppkey
                                  ORDER BY affinity, c_custkey) AS rs,
               row_number() OVER (PARTITION BY c_custkey
                                  ORDER BY affinity, s_suppkey) AS rc
        FROM pairs
    )
    SELECT s_suppkey, c_custkey, nationkey, affinity
    FROM ranked WHERE rs = 1 AND rc = 1
    """,
)
def q_mutual_argmax(spark, sf_dir):
    """W5/W6: bidirectional mutual-best matching — keep (track, det)
    pairs where each is the other's argmax (reference
    tracking.py:977-1035). Affinity here = closest account balance
    within a nation."""
    s = _t(spark, sf_dir, "supplier")
    c = _t(spark, sf_dir, "customer")
    pairs = s.join(c, s.s_nationkey == c.c_nationkey).select(
        "s_suppkey",
        "c_custkey",
        F.col("s_nationkey").alias("nationkey"),
        F.round(F.abs(F.col("s_acctbal") - F.col("c_acctbal")), 2).alias("affinity"),
    )
    w_s = Window.partitionBy("s_suppkey").orderBy(
        F.col("affinity").asc(), F.col("c_custkey").asc()
    )
    w_c = Window.partitionBy("c_custkey").orderBy(
        F.col("affinity").asc(), F.col("s_suppkey").asc()
    )
    return (
        pairs.withColumn("rs", F.row_number().over(w_s))
        .withColumn("rc", F.row_number().over(w_c))
        .filter((F.col("rs") == 1) & (F.col("rc") == 1))
        .drop("rs", "rc")
    )


@query(
    "q_grid_join",
    oracle="""
    SELECT bucket, count(*) AS n_pairs,
           round(sum(dist), 2) / count(*) AS avg_dist FROM (
        SELECT CAST(floor(a.value / 0.5) AS BIGINT) AS bucket,
               abs(a.value - b.value) AS dist
        FROM events a JOIN events b
          ON a.event_id < b.event_id AND abs(a.value - b.value) <= 0.5
    ) GROUP BY bucket
    """,
)
def q_grid_join(spark, sf_dir):
    """J1: grid spatial radius join — bucket both sides on cells of the
    radius size, explode probe side to neighbor cells, equi-join, exact
    distance post-filter (reference SpatialIndex, tracking.py:442-554).
    The oracle states the naive theta-join; the Spark plan is the
    grid-accelerated equi-join form that scales."""
    ev = scatter(_t(spark, sf_dir, "events").select("event_id", "value"))
    pairs = grid_radius_join_1d(ev, "value", radius=0.5, id_col="event_id")
    return (
        pairs.select(
            F.floor(F.col("a_value") / 0.5).cast("long").alias("bucket"),
            F.abs(F.col("a_value") - F.col("b_value")).alias("dist"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            # round(sum,2)/count, not round(avg,4): dist is 2dp-exact, so
            # the rounded sum sits ON the grid and the quotient is
            # bit-identical cross-engine (no .xxxx5 edge; see
            # q_forward_fill for the edge this dodges).
            (F.round(F.sum("dist"), 2) / F.count(F.lit(1))).alias("avg_dist"),
        )
    )


@query(
    "q_containment_antijoin",
    oracle="""
    SELECT a.event_id, a.user_id, a.value FROM events a
    WHERE NOT EXISTS (
        SELECT 1 FROM events b
        WHERE b.user_id = a.user_id
          AND b.event_id <> a.event_id
          AND b.value >= 2 * a.value
          AND abs(epoch_ms(b.ts) - epoch_ms(a.ts)) <= 3600000
    )
    """,
)
def q_containment_antijoin(spark, sf_dir):
    """W4: containment-based suppression — drop rows "contained" by a
    dominating row in the same group (reference nested-box removal,
    detection.py:1120-1198). Anti-join on equi key + theta predicate."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "value", "ts")
    a = ev.alias("a")
    b = ev.alias("b")
    cond = (
        (F.col("a.user_id") == F.col("b.user_id"))
        & (F.col("b.event_id") != F.col("a.event_id"))
        & (F.col("b.value") >= 2 * F.col("a.value"))
        & (
            F.abs(epoch_ms(F.col("b.ts")) - epoch_ms(F.col("a.ts")))
            <= 3600000
        )
    )
    return a.join(b, cond, "left_anti").select("event_id", "user_id", "value")


@query(
    "q_tumbling_window",
    oracle="""
    SELECT date_trunc('hour', ts) AS hour_start, event_type,
           count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY date_trunc('hour', ts), event_type
    """,
)
def q_tumbling_window(spark, sf_dir):
    """§2.9: tumbling event-time window aggregation — the batch form of
    the streaming `window(ts, '1 hour')` group (generalizes the
    reference's per-frame tick processing)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(F.col("w.start").alias("hour_start"), "event_type", "n", "sum_value")
    )


@query(
    "q_session_window",
    oracle="""
    SELECT user_id, session_id, count(*) AS n_events,
           round(sum(value), 2) AS sum_value,
           CAST(epoch_ms(max(ts)) - epoch_ms(min(ts)) AS BIGINT) AS duration_ms
    FROM (
        SELECT user_id, ts, value,
               CAST(sum(CASE WHEN prev_ts IS NULL
                             OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
                             THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        FROM (
            SELECT user_id, ts, value, event_id,
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
            FROM events
        )
    ) GROUP BY user_id, session_id
    """,
)
def q_session_window(spark, sf_dir):
    """§2.9/T4: sessionization with a 30-minute inactivity gap — the
    batch analog of session_window + state timeout (the reference's
    max_age track ageing, tracking.py:815-823)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_run = w.rowsBetween(Window.unboundedPreceding, 0)
    sessions = (
        ev.select("user_id", "ts", "value", "event_id")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_ts").isNull()
                | (epoch_ms("ts") - epoch_ms("prev_ts") > 1800000),
                1,
            ).otherwise(0),
        )
        .withColumn("session_id", F.sum("new_session").over(w_run))
    )
    return sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
        (epoch_ms(F.max("ts")) - epoch_ms(F.min("ts"))).alias("duration_ms"),
    )


@query(
    "q_funnel",
    oracle="""
    WITH v AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM v) AS n_viewed,
           (SELECT count(*) FROM c) AS n_clicked_after,
           (SELECT count(*) FROM p) AS n_purchased_after
    """,
)
def q_funnel(spark, sf_dir):
    """Ordered-event funnel (view -> later click -> later purchase per
    user): each stage is a per-user min-timestamp aggregate joined to
    the next stage with a strict time predicate — conditional aggs +
    equi-joins on user_id, so every shuffle is on the user key and the
    per-stage relations shrink monotonically. The window-free shape
    matters at 100 TB: no per-user event-array materialization, and
    stage N's input is only stage N-1 survivors."""
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_clicked_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchased_after")))
    )


@query(
    "q_cohort_retention",
    oracle="""
    WITH first_seen AS (
        SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
        FROM events GROUP BY user_id
    ),
    active AS (
        SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events
    )
    SELECT f.cohort_week,
           CAST(date_diff('day', f.cohort_week, a.wk) / 7 AS BIGINT)
             AS week_offset,
           count(DISTINCT a.user_id) AS n_active
    FROM active a JOIN first_seen f ON a.user_id = f.user_id
    GROUP BY f.cohort_week, week_offset
    """,
)
def q_cohort_retention(spark, sf_dir):
    """Cohort retention: users bucketed by first-seen week, activity
    counted per (cohort, week-offset) cell — the standard triangle.
    Two shuffles on user_id (first-seen agg, distinct-activity agg) and
    one on the tiny (cohort, offset) key. Both engines truncate weeks
    to Monday, and offsets are exact multiples of 7 days, so integer
    division is engine-stable."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    first = ev.groupBy("user_id").agg(F.min("wk").alias("cohort_week"))
    active = ev.distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            "cohort_week",
            (F.datediff(F.col("wk"), F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "q_scd2",
    oracle="""
    WITH ordered AS (
        SELECT user_id, event_type, ts, event_id,
               CASE WHEN event_type IS DISTINCT FROM lag(event_type) OVER w
                    THEN 1 ELSE 0 END AS chg
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    runs AS (
        SELECT *, sum(chg) OVER (
            PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
        FROM ordered
    ),
    intervals AS (
        SELECT user_id, run_id, event_type,
               min(ts) AS valid_from, count(*) AS n_events
        FROM runs GROUP BY user_id, run_id, event_type
    )
    SELECT user_id, event_type, valid_from,
           lead(valid_from) OVER (
               PARTITION BY user_id ORDER BY valid_from, run_id) AS valid_to,
           n_events
    FROM intervals
    """,
)
def q_scd2(spark, sf_dir):
    """SCD-2 (slowly-changing-dimension) interval build: collapse each
    user's consecutive same-state events into [valid_from, valid_to)
    rows, the open (NULL valid_to) row being current — the standard
    warehouse dimension-history shape. Run detection is the
    gaps-and-islands trick (lag + running sum, one window shuffle per
    user key); valid_to comes from lead over the collapsed intervals,
    so the second window runs on the already-shrunk relation. Total
    ordering (ts, event_id) makes runs engine-deterministic."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    runs = ev.withColumn(
        "chg",
        F.when(
            ~F.col("event_type").eqNullSafe(F.lag("event_type").over(w)), 1
        ).otherwise(0),
    ).withColumn(
        "run_id",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    intervals = runs.groupBy("user_id", "run_id", "event_type").agg(
        F.min("ts").alias("valid_from"),
        F.count(F.lit(1)).alias("n_events"),
    )
    w2 = Window.partitionBy("user_id").orderBy("valid_from", "run_id")
    return intervals.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
        "n_events",
    )


@query(
    "q_event_pattern",
    oracle="""
    WITH s AS (
        SELECT user_id,
               string_agg(substr(event_type, 1, 1), ''
                          ORDER BY ts, event_id) AS seq
        FROM events GROUP BY user_id
    )
    SELECT user_id,
           CAST(length(seq) AS BIGINT) AS seq_len,
           CAST(len(regexp_extract_all(seq, 'vp')) AS BIGINT) AS n_vp,
           CAST(len(regexp_extract_all(seq, 'v[ce]*p')) AS BIGINT)
             AS n_funnel
    FROM s
    """,
)
def q_event_pattern(spark, sf_dir):
    """Sequence pattern matching over per-user event strings — the
    relational MATCH_RECOGNIZE analog: each user's history becomes a
    symbol string (first letter of event_type, totally ordered by
    (ts, event_id)), then regexes count behavioral motifs (immediate
    view→purchase, and view→purchase through clicks/errors). One
    shuffle on user_id; per-user strings stay small (history length),
    and the regex work is codegen'd. Ordering parity comes from
    array_sort on (ts, event_id, sym) structs vs the oracle's ORDER BY
    inside string_agg — event_id uniqueness makes the order total."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id",
        F.substring("event_type", 1, 1).alias("sym"),
    )
    g = ev.groupBy("user_id").agg(
        F.array_sort(
            F.collect_list(F.struct("ts", "event_id", "sym"))
        ).alias("arr")
    )
    g = g.withColumn(
        "seq",
        F.array_join(F.transform("arr", lambda x: x["sym"]), ""),
    )
    return g.select(
        "user_id",
        F.length("seq").cast("long").alias("seq_len"),
        F.regexp_count("seq", F.lit("vp")).cast("long").alias("n_vp"),
        F.regexp_count("seq", F.lit("v[ce]*p")).cast("long").alias("n_funnel"),
    )


@query(
    "q_ab_test",
    oracle="""
    WITH g AS (
        SELECT event_type,
               count(*) AS n,
               avg(value) AS m,
               var_samp(value) AS v
        FROM events
        WHERE event_type IN ('click', 'view')
        GROUP BY event_type
    ),
    a AS (SELECT n, m, v FROM g WHERE event_type = 'click'),
    b AS (SELECT n, m, v FROM g WHERE event_type = 'view')
    SELECT CAST(a.n AS BIGINT) AS n_a, CAST(b.n AS BIGINT) AS n_b,
           round(a.m - b.m, 4) AS mean_diff,
           round((a.m - b.m) / sqrt(a.v / a.n + b.v / b.n), 4) AS t_stat,
           round(power(a.v / a.n + b.v / b.n, 2) /
                 (power(a.v / a.n, 2) / (a.n - 1)
                  + power(b.v / b.n, 2) / (b.n - 1)), 1) AS dof
    FROM a, b
    """,
)
def q_ab_test(spark, sf_dir):
    """Welch's two-sample t-test as a relational program (the
    experimentation readout every event pipeline runs): per-variant
    (n, mean, sample variance) from one grouped aggregate, then the
    t-statistic and Welch-Satterthwaite degrees of freedom as scalar
    algebra over the two 1-row sides. All heavy work is a single
    map-side-combining pass over the fact table; the final formula
    touches six numbers."""
    ev = _t(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view")
    )
    g = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("value").alias("m"),
        F.var_samp("value").alias("v"),
    )
    a = g.filter(F.col("event_type") == "click").select(
        F.col("n").alias("n_a"), F.col("m").alias("m_a"), F.col("v").alias("v_a")
    )
    b = g.filter(F.col("event_type") == "view").select(
        F.col("n").alias("n_b"), F.col("m").alias("m_b"), F.col("v").alias("v_b")
    )
    se_a = F.col("v_a") / F.col("n_a")
    se_b = F.col("v_b") / F.col("n_b")
    return a.crossJoin(b).select(
        "n_a",
        "n_b",
        F.round(F.col("m_a") - F.col("m_b"), 4).alias("mean_diff"),
        F.round(
            (F.col("m_a") - F.col("m_b")) / F.sqrt(se_a + se_b), 4
        ).alias("t_stat"),
        F.round(
            F.pow(se_a + se_b, 2)
            / (
                F.pow(se_a, 2) / (F.col("n_a") - 1)
                + F.pow(se_b, 2) / (F.col("n_b") - 1)
            ),
            1,
        ).alias("dof"),
    )


@query(
    "q_drift_chi2",
    oracle="""
    WITH halves AS (
        SELECT event_type,
               CASE WHEN epoch_ms(ts) <
                    (SELECT (epoch_ms(min(ts)) + epoch_ms(max(ts))) / 2.0
                     FROM events WHERE ts IS NOT NULL)
                    THEN 'ref' ELSE 'cur' END AS half
        FROM events WHERE ts IS NOT NULL
    ),
    counts AS (
        SELECT event_type,
               sum(CASE WHEN half = 'ref' THEN 1 ELSE 0 END) AS n_ref,
               sum(CASE WHEN half = 'cur' THEN 1 ELSE 0 END) AS n_cur
        FROM halves GROUP BY event_type
    ),
    tot AS (SELECT sum(n_ref) AS tr, sum(n_cur) AS tc FROM counts)
    SELECT event_type, CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cur AS BIGINT) AS n_cur,
           round(CAST(n_cur AS DOUBLE) / tc - CAST(n_ref AS DOUBLE) / tr, 6)
             AS share_shift,
           CASE WHEN n_ref = 0 THEN NULL
                ELSE round(power(CAST(n_cur AS DOUBLE) / tc
                                 - CAST(n_ref AS DOUBLE) / tr, 2)
                           / (CAST(n_ref AS DOUBLE) / tr), 6) END AS chi2_term
    FROM counts, tot
    """,
)
def q_drift_chi2(spark, sf_dir):
    """Distribution-drift monitor: the event-type mix of the newer half
    of the stream compared against the older half — per-category share
    shift and the chi-square contribution (the alert statistic a
    training pipeline watches so a upstream mix change can't silently
    poison a dataset). Two grouped passes: the time midpoint (scalar)
    and the per-category split counts; everything after is scalar
    algebra broadcast onto categories."""
    # NULL-ts rows are excluded on BOTH sides (Spark's when/otherwise
    # would silently bin them into 'cur'); a category seen ONLY in the
    # newer half keeps chi2_term NULL by explicit contract (share_shift
    # and n_ref=0 still flag it) — an inline 0-division would return
    # NULL on Spark but Infinity on DuckDB >= 1.1.
    ev = _t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    # epoch-millis midpoint on both engines (timestamp+interval/2
    # arithmetic rounds differently across engines; integer millis
    # averaged in double are exact far past any realistic clock).
    ms = epoch_ms(F.col("ts"))
    mid = ev.agg(
        ((F.min(ms) + F.max(ms)) / F.lit(2.0)).alias("mid")
    )
    counts = (
        ev.crossJoin(F.broadcast(mid))
        .groupBy("event_type")
        .agg(
            F.sum(F.when(ms < F.col("mid"), 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(ms >= F.col("mid"), 1).otherwise(0)).alias("n_cur"),
        )
    )
    tot = counts.agg(
        F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc")
    )
    share_ref = F.col("n_ref").cast("double") / F.col("tr")
    share_cur = F.col("n_cur").cast("double") / F.col("tc")
    return counts.crossJoin(F.broadcast(tot)).select(
        "event_type",
        "n_ref",
        "n_cur",
        F.round(share_cur - share_ref, 6).alias("share_shift"),
        F.when(
            F.col("n_ref") > 0,
            F.round(F.pow(share_cur - share_ref, 2) / share_ref, 6),
        ).alias("chi2_term"),
    )


@query(
    "q_interval_join",
    oracle="""
    WITH iv AS (
        SELECT user_id, date_trunc('day', ts) AS day, min(ts) AS start_ts
        FROM events GROUP BY user_id, date_trunc('day', ts)
    ),
    m AS (
        SELECT iv.user_id, iv.day, e.value
        FROM iv JOIN events e ON e.user_id = iv.user_id
        WHERE e.event_type = 'purchase'
          AND epoch_ms(e.ts) >= epoch_ms(iv.start_ts)
          AND epoch_ms(e.ts) <= epoch_ms(iv.start_ts) + 7200000
    )
    SELECT user_id, day, count(*) AS n_purchases,
           round(sum(value), 2) AS sum_value
    FROM m GROUP BY user_id, day
    """,
)
def q_interval_join(spark, sf_dir):
    """Interval-containment join (operators/joins.interval_join): each
    user's per-day opening window [first event, +2 h] is matched to the
    purchases falling inside it — the session-attribution shape.

    The oracle states the naive BETWEEN theta-join; the Spark plan
    never runs it: intervals explode to their covered 1-hour buckets
    (≤3 rows each), purchases hash to one bucket, and the containment
    predicate filters an equi-join on (user_id, bucket). One shuffle,
    join fan-in bounded per bucket — survives a 100× events scale-up
    where the BETWEEN join becomes an O(|points|·|intervals|/|keys|)
    nested loop.
    """
    from ..operators.joins import interval_join

    ev = scatter(load_table(spark, sf_dir, "events"))
    iv = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("day"))
        .agg(F.min("ts").alias("start_ts"))
        .select(
            "user_id",
            "day",
            epoch_ms("start_ts").alias("start_ms"),
            (epoch_ms("start_ts") + F.lit(7200000)).alias("end_ms"),
        )
    )
    pts = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", epoch_ms("ts").alias("ts_ms"), "value"
    )
    matched = interval_join(
        pts, iv, key="user_id", point_col="ts_ms",
        start_col="start_ms", end_col="end_ms", bucket=3600000,
    )
    return matched.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


@query(
    "q_ks_test",
    oracle="""
    WITH s AS (
        SELECT event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_type IN ('click', 'view')
    ),
    cells AS (
        SELECT cents,
               sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
               sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c2
        FROM s GROUP BY cents
    ),
    cum AS (
        SELECT cents,
               CAST(sum(c1) OVER (ORDER BY cents) AS BIGINT) AS f1,
               CAST(sum(c2) OVER (ORDER BY cents) AS BIGINT) AS f2
        FROM cells
    ),
    tot AS (
        SELECT CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(c2) AS BIGINT) AS n2
        FROM cells
    )
    SELECT n1, n2,
           CAST(max(abs(CAST(f1 AS HUGEINT) * n2
                        - CAST(f2 AS HUGEINT) * n1)) AS BIGINT) AS d_num,
           CAST(max(abs(CAST(f1 AS HUGEINT) * n2
                        - CAST(f2 AS HUGEINT) * n1)) AS DOUBLE)
             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS d_stat,
           1.358 * sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                        / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
             AS ks_crit,
           (CAST(max(abs(CAST(f1 AS HUGEINT) * n2
                         - CAST(f2 AS HUGEINT) * n1)) AS DOUBLE)
              / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)))
             > (1.358 * sqrt((CAST(n1 AS DOUBLE) + CAST(n2 AS DOUBLE))
                             / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE))))
             AS reject
    FROM cum CROSS JOIN tot
    GROUP BY n1, n2
    """,
)
def q_ks_test(spark, sf_dir):
    """Two-sample Kolmogorov-Smirnov test between the value
    distributions of two event types — the CONTINUOUS-feature drift
    monitor beside q_drift_chi2's categorical one. D = max |F1 - F2|
    over the pooled support, with the asymptotic alpha=0.05 decision
    c(a)*sqrt((n1+n2)/(n1*n2)), c(0.05)=1.358.

    Exactness: values sit on the cents grid; both empirical CDFs are
    integer counts, and D's numerator max|F1*n2 - F2*n1| is computed
    entirely in integers (the division by n1*n2 happens ONCE on the
    scalar max). The critical value is the identical literal*sqrt
    IEEE sequence on both engines (sqrt is correctly rounded), so the
    reject boolean cannot diverge.

    Scale: one hash aggregate to the distinct-value relation, both
    running counts in ONE `distributed_cumulative` pass (shared
    boundaries job), scalar reduction at the end — no global sort, no
    single-partition exchange.
    """
    from ..operators.windows import distributed_cumulative

    s = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "view"))
        .select(
            "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
    )
    cells = s.groupBy("cents").agg(
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("c2"),
    ).localCheckpoint()  # consumed by the rank pass (x2 internally) + tot
    cum = distributed_cumulative(
        cells, ["cents"], agg_col=["c1", "c2"], out_col=["f1", "f2"]
    )
    tot = cells.agg(F.sum("c1").alias("n1"), F.sum("c2").alias("n2"))
    # products widen to DECIMAL(38,0) BEFORE multiplying (F*n passes
    # 2^63 around 3e9 rows/side); the emitted d_num casts back to long
    # for schema parity with the oracle's BIGINT (exact far past any
    # driver-tested scale; d_stat derives from the wide value)
    dec = "decimal(38,0)"
    diff = F.abs(
        F.col("f1").cast(dec) * F.col("n2").cast(dec)
        - F.col("f2").cast(dec) * F.col("n1").cast(dec)
    )
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    d_stat = F.col("d_wide").cast("double") / (n1d * n2d)
    crit = F.lit(1.358) * F.sqrt((n1d + n2d) / (n1d * n2d))
    return (
        cum.crossJoin(F.broadcast(tot))
        .groupBy("n1", "n2")
        .agg(F.max(diff).alias("d_wide"))
        .withColumn("d_num", F.col("d_wide").cast("long"))
        .select(
            "n1",
            "n2",
            "d_num",
            d_stat.alias("d_stat"),
            crit.alias("ks_crit"),
            (d_stat > crit).alias("reject"),
        )
    )


@query(
    "q_psi",
    oracle="""
    WITH ref AS (
        SELECT event_id, CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_id % 2 = 0
    ),
    cur AS (
        SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_id % 2 = 1
    ),
    r AS (
        SELECT cents,
               row_number() OVER (ORDER BY cents, event_id) AS rn,
               count(*) OVER () AS n
        FROM ref
    ),
    edges AS (
        SELECT max(cents) AS edge
        FROM (SELECT cents, ((rn - 1) * 10) // n AS b FROM r)
        WHERE b <= 8 GROUP BY b
    ),
    cr AS (
        SELECT (SELECT count(*) FROM edges e WHERE ref.cents > e.edge)
                 AS bin,
               count(*) AS c
        FROM ref GROUP BY 1
    ),
    cc AS (
        SELECT (SELECT count(*) FROM edges e WHERE cur.cents > e.edge)
                 AS bin,
               count(*) AS c
        FROM cur GROUP BY 1
    ),
    tot AS (
        SELECT (SELECT count(*) FROM ref) AS nr,
               (SELECT count(*) FROM cur) AS nq
    )
    SELECT coalesce(cr.bin, cc.bin) AS bin,
           coalesce(cr.c, 0) AS n_ref,
           coalesce(cc.c, 0) AS n_cur,
           CASE WHEN coalesce(cr.c, 0) = 0 OR coalesce(cc.c, 0) = 0
                THEN NULL
                ELSE round((CAST(cr.c AS DOUBLE) / nr
                            - CAST(cc.c AS DOUBLE) / nq)
                           * ln(CAST(CAST(cr.c AS HUGEINT) * nq AS DOUBLE)
                                / CAST(CAST(cc.c AS HUGEINT) * nr
                                       AS DOUBLE)), 6)
           END AS psi_contrib
    FROM cr FULL OUTER JOIN cc ON cr.bin = cc.bin
    CROSS JOIN tot
    """,
)
def q_psi(spark, sf_dir):
    """Population stability index — the standard production drift
    metric for a CONTINUOUS model feature: decile bins are fixed from
    the reference population (even event_ids), both populations are
    re-bucketed by those edges, and PSI = sum (p_i - q_i) ln(p_i/q_i)
    (>0.2 conventionally triggers retraining). Emits the per-bin
    decomposition; the total is the sum of psi_contrib.

    Determinism: bin EDGES are exact order statistics (max cents of
    each reference rank-decile, ranks from `distributed_cumulative`),
    not approximate percentiles, so both engines derive identical
    edges; each ln argument is one division of two exactly-derived
    integers; a bin empty on either side yields NULL by explicit
    contract on both engines (no 0-division / ln(0) divergence).

    Scale: ranks are the two-pass distributed ranking; the 9-row edge
    relation broadcast-joins onto each population (bin = count of
    edges below — a bounded fan-in theta join); everything downstream
    is ≤10-row algebra. Edge derivation and bucket assignment live in
    operators/binning.py, SHARED with the incremental monitor
    (streaming/drift.py) so the streamed and batch drift numbers can
    never disagree on boundary semantics.
    """
    from ..operators.binning import (
        bin_counts_by_edges,
        psi_from_counts,
        reference_edges,
    )

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    # materialize the ≤9-row edge relation ONCE (r13): it is consumed
    # by BOTH bucket-assignment joins, and each consumer re-derived
    # the whole two-pass ranked-reference pipeline behind it (executed
    # plan before: 46 parquet scans, ReusedExchange only 6 — the
    # broadcast sides never dedup). Same "checkpoint the small derived
    # relation, not the big input" pattern as operators/graph.py.
    edges = reference_edges(ref, "cents", "event_id", n_bins=10).localCheckpoint()
    cr = bin_counts_by_edges(ref, edges, "cents", "event_id", out="n_ref")
    cc = bin_counts_by_edges(cur, edges, "cents", "event_id", out="n_cur")
    # ONE shared implementation with the streaming monitor — the
    # population totals re-derive from the histograms (every row gets
    # exactly one bin, so the sums equal the population counts)
    return psi_from_counts(cr, cc)


@query(
    "q_markov_transitions",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
               ) AS next_type
        FROM events WHERE ts IS NOT NULL
    ),
    trans AS (
        SELECT event_type AS from_type, next_type AS to_type,
               count(*) AS c
        FROM seq WHERE next_type IS NOT NULL
        GROUP BY 1, 2
    ),
    rt AS (
        SELECT from_type, CAST(sum(c) AS BIGINT) AS row_n
        FROM trans GROUP BY from_type
    )
    SELECT t.from_type, t.to_type, t.c,
           CAST(t.c AS DOUBLE) / CAST(r.row_n AS DOUBLE) AS prob
    FROM trans t JOIN rt r USING (from_type)
    """,
)
def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences — the behavioral model a synthetic-data generator or
    next-event predictor is fit from. Each user's events are ordered
    by (ts, event_id); consecutive pairs are counted into the
    |types|x|types| transition relation with row-normalized
    probabilities (one integer-ratio division).

    NULL-ts rows are excluded on both sides (engines disagree on NULL
    sort position: Spark NULLS FIRST asc, DuckDB NULLS LAST).

    Scale: ONE hash-partitioned window per user (no global order),
    then a map-side-combined aggregate to a bounded matrix; row
    totals re-derive from the matrix itself and join back broadcast.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            "ts",
            "event_id",
            "event_type",
        )
        .withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
    )
    trans = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).alias("c"))
    rt = trans.groupBy("from_type").agg(F.sum("c").alias("row_n"))
    return trans.join(F.broadcast(rt), "from_type").select(
        "from_type",
        "to_type",
        "c",
        (F.col("c").cast("double") / F.col("row_n").cast("double")).alias(
            "prob"
        ),
    )


@query(
    "q_attribution",
    oracle="""
    WITH touched AS (
        SELECT event_type, value,
               last_value(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS channel
        FROM events WHERE ts IS NOT NULL
    )
    SELECT coalesce(channel, '(direct)') AS channel,
           count(*) AS n_purchases,
           round(sum(value), 2) AS revenue
    FROM touched WHERE event_type = 'purchase'
    GROUP BY 1
    """,
)
def q_attribution(spark, sf_dir):
    """Last-touch attribution: each purchase is credited to the most
    recent PRIOR non-purchase event of the same user (its "channel");
    purchases with no prior touch fall to '(direct)'. The classic
    marketing/conversion attribution shape — an as-of lookup expressed
    as a running last-non-null (LOCF) window, NOT a per-purchase
    backward join.

    Revenue sums on the 2-decimal grid re-land exactly under
    round(.,2) (the house money rule); NULL-ts rows are excluded on
    both engines (NULL sort-position divergence).

    Scale: one hash-partitioned window per user, then a map-side-
    combined aggregate to |channels| rows. No self-join — at 100 TB
    the per-purchase backward theta-join this replaces would fan out
    quadratically within hot users.
    """
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touched = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .withColumn(
            "channel",
            F.last(
                F.when(F.col("event_type") != "purchase", F.col("event_type")),
                ignorenulls=True,
            ).over(w),
        )
    )
    return (
        touched.filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("channel", F.lit("(direct)")).alias("channel"))
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.round(F.sum("value"), 2).alias("revenue"),
        )
    )


@query(
    "q_cuped",
    oracle="""
    WITH e AS (
        SELECT user_id, epoch_ms(ts) AS ms,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE ts IS NOT NULL
    ),
    mid AS (
        SELECT (CAST(min(ms) AS DOUBLE) + CAST(max(ms) AS DOUBLE)) / 2.0
                 AS mid
        FROM e
    ),
    u AS (
        SELECT user_id, user_id % 2 AS variant,
               CAST(sum(CASE WHEN ms < m.mid THEN cents ELSE 0 END)
                    AS BIGINT) AS x,
               CAST(sum(CASE WHEN ms >= m.mid THEN cents ELSE 0 END)
                    AS BIGINT) AS y
        FROM e CROSS JOIN mid m GROUP BY user_id, m.mid
    ),
    pooled AS (
        SELECT count(*) AS n,
               CAST(sum(x) AS HUGEINT) AS sx,
               CAST(sum(y) AS HUGEINT) AS sy,
               CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
               CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
        FROM u
    ),
    th AS (
        SELECT n, sx,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / CAST(nullif(n * sxx - sx * sx, 0) AS DOUBLE) AS theta
        FROM pooled
    ),
    v AS (
        SELECT variant, count(*) AS n_users,
               CAST(sum(x) AS BIGINT) AS sx_v,
               CAST(sum(y) AS BIGINT) AS sy_v
        FROM u GROUP BY variant
    )
    SELECT v.variant, v.n_users,
           CAST(v.sy_v AS DOUBLE) / CAST(v.n_users AS DOUBLE) AS mean_y,
           CAST(v.sy_v AS DOUBLE) / CAST(v.n_users AS DOUBLE)
             - t.theta * (CAST(v.sx_v AS DOUBLE) / CAST(v.n_users AS DOUBLE)
                          - CAST(t.sx AS DOUBLE) / CAST(t.n AS DOUBLE))
             AS adj_mean,
           t.theta
    FROM v CROSS JOIN th t
    """,
)
def q_cuped(spark, sf_dir):
    """CUPED variance reduction (Deng et al., WSDM 2013) — the standard
    experimentation-platform adjustment: each unit's post-period metric
    Y is shifted by theta*(X - mean(X)) using its PRE-period covariate
    X, with theta = cov(X,Y)/var(X) pooled across variants. The
    adjusted variant means keep the same expectation but shed the
    pre-existing between-user variance (often 40-60% tighter CIs).
    Periods split at the stream's time midpoint; variants by user
    parity.

    Determinism: X/Y are exact cents sums; the four pooled moments
    accumulate as HUGEINT/DECIMAL(38,0) so theta's numerator and
    denominator are exact integers and theta is ONE IEEE division
    (degenerate var(X)=0 yields NULL on both engines). The adjusted
    mean is the identical fixed sequence of IEEE ops on
    integer-exact ratios — algebraically rearranged to per-variant
    SUMS (mean(Y_v) - theta*(mean(X_v) - mean(X)) ), so no float is
    ever summed across rows.

    Scale: two hash aggregates (per-user, then per-variant) plus a
    1-row pooled-moments relation broadcast back — the classic
    map-side-combine shape; nothing is ever sorted or windowed.
    """
    from ..functions.time import epoch_ms

    dec = "decimal(38,0)"
    e = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .select(
            "user_id",
            epoch_ms("ts").alias("ms"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
    )
    mid = e.agg(
        (
            (F.min("ms").cast("double") + F.max("ms").cast("double")) / 2.0
        ).alias("mid")
    )
    u = (
        e.crossJoin(F.broadcast(mid))
        .groupBy("user_id", (F.col("user_id") % 2).alias("variant"))
        .agg(
            F.sum(
                F.when(F.col("ms") < F.col("mid"), F.col("cents")).otherwise(0)
            ).alias("x"),
            F.sum(
                F.when(F.col("ms") >= F.col("mid"), F.col("cents")).otherwise(0)
            ).alias("y"),
        )
        # consumed by `pooled` AND `v` — materialize the bounded
        # per-user relation once instead of re-scanning the events
        # fact per consumer (house multi-consumer rule)
        .localCheckpoint()
    )
    pooled = u.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    th = pooled.select(
        "n",
        "sx",
        F.when(den != 0, num.cast("double") / den.cast("double")).alias(
            "theta"
        ),
    )
    v = u.groupBy("variant").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("x").alias("sx_v"),
        F.sum("y").alias("sy_v"),
    )
    yv = F.col("sy_v").cast("double") / F.col("n_users").cast("double")
    xv = F.col("sx_v").cast("double") / F.col("n_users").cast("double")
    xg = F.col("sx").cast("double") / F.col("n").cast("double")
    return v.crossJoin(F.broadcast(th)).select(
        "variant",
        "n_users",
        yv.alias("mean_y"),
        (yv - F.col("theta") * (xv - xg)).alias("adj_mean"),
        "theta",
    )


# Poisson(1) CDF thresholds on the 2^28 grid of the md5-derived hash:
# floor(cum_k * 2^28) for k = 0..5 (k>=6 keeps the ELSE weight 6).
# Integer comparisons only — no float anywhere in the weight draw.
_POIS_T = [98751885, 197503771, 246879713, 263338361, 267453023, 268275955]
_BOOT_R = 32  # bootstrap replicates


@query(
    "q_poisson_bootstrap",
    oracle=f"""
    WITH reps AS (SELECT unnest(range(0, {_BOOT_R})) AS r),
    w AS (
        SELECT r,
               CAST(round(value * 100, 0) AS BIGINT) AS cents,
               CASE
                 WHEN ('0x' || substr(md5(event_id || '_' || r), 1, 7))::BIGINT
                      < {_POIS_T[0]} THEN 0
                 WHEN ('0x' || substr(md5(event_id || '_' || r), 1, 7))::BIGINT
                      < {_POIS_T[1]} THEN 1
                 WHEN ('0x' || substr(md5(event_id || '_' || r), 1, 7))::BIGINT
                      < {_POIS_T[2]} THEN 2
                 WHEN ('0x' || substr(md5(event_id || '_' || r), 1, 7))::BIGINT
                      < {_POIS_T[3]} THEN 3
                 WHEN ('0x' || substr(md5(event_id || '_' || r), 1, 7))::BIGINT
                      < {_POIS_T[4]} THEN 4
                 WHEN ('0x' || substr(md5(event_id || '_' || r), 1, 7))::BIGINT
                      < {_POIS_T[5]} THEN 5
                 ELSE 6
               END AS w
        FROM events CROSS JOIN reps
    )
    SELECT r AS replicate,
           CAST(sum(w) AS BIGINT) AS n_eff,
           CAST(sum(w * cents) AS BIGINT) AS sum_cents,
           CAST(sum(w * cents) AS DOUBLE) / CAST(sum(w) AS DOUBLE)
             AS mean_cents
    FROM w GROUP BY r
    """,
)
def q_poisson_bootstrap(spark, sf_dir):
    """Poisson bootstrap (Hanley & MacGibbon 2006; the streaming-scale
    resampling used for massive-data confidence intervals): instead of
    multinomial resampling — impossible without knowing N up front —
    each row enters replicate r with weight ~ Poisson(1), drawn
    DETERMINISTICALLY from the md5 hash of (event_id, r) via integer
    CDF thresholds on the 2^28 grid. The 32 replicate means' spread is
    the bootstrap SE of the mean; the replicate relation (32 rows of
    exact integer sums + one division each) is the checkable core.

    Determinism: the weight draw is pure integer comparison (no float
    RNG), weighted sums sit on the cents grid, each replicate mean is
    ONE division of two exact integers.

    Scale: a 32-way row explosion (pure projection) followed by ONE
    map-side-combined hash aggregate keyed by replicate —
    embarrassingly parallel, no joins, no windows, no resample
    materialization. This is exactly why Poisson beats multinomial
    bootstrap on unbounded data.
    """
    from ..functions.keys import stable_id_hash

    reps = F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("r")
    base = _t(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        reps,
    )
    h = stable_id_hash(F.col("event_id"), F.col("r"))
    w = F.when(h < _POIS_T[0], 0)
    for k, t in enumerate(_POIS_T[1:], start=1):
        w = w.when(h < t, k)
    w = w.otherwise(6)
    return (
        base.select(F.col("r").alias("replicate"), "cents", w.alias("w"))
        .groupBy("replicate")
        .agg(
            F.sum("w").alias("n_eff"),
            F.sum(F.col("w") * F.col("cents")).alias("sum_cents"),
        )
        .withColumn(
            "mean_cents",
            F.col("sum_cents").cast("double") / F.col("n_eff").cast("double"),
        )
    )


@query(
    "q_anova",
    oracle="""
    WITH s AS (
        SELECT event_type,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events
    ),
    g AS (
        SELECT event_type, count(*) AS n,
               CAST(sum(cents) AS HUGEINT) AS sx,
               CAST(sum(CAST(cents AS HUGEINT) * cents) AS HUGEINT) AS sxx
        FROM s GROUP BY event_type
    ),
    arr AS (
        SELECT count(*) AS k, CAST(sum(n) AS BIGINT) AS big_n,
               CAST(sum(sx) AS HUGEINT) AS gx,
               CAST(sum(sxx) AS HUGEINT) AS gxx,
               list_reduce(
                   list_prepend(0.0,
                       list_transform(
                           list_sort(list(struct_pack(
                               event_type := event_type,
                               sx := sx, n := n))),
                           x -> CAST(x.sx AS DOUBLE) * CAST(x.sx AS DOUBLE)
                                / CAST(x.n AS DOUBLE))),
                   (a, b) -> a + b) AS between_raw
        FROM g
    ),
    parts AS (
        SELECT k, big_n,
               between_raw
                 - CAST(gx AS DOUBLE) * CAST(gx AS DOUBLE)
                   / CAST(big_n AS DOUBLE) AS ssb,
               CAST(gxx AS DOUBLE) - between_raw AS ssw
        FROM arr
    )
    SELECT k, big_n, round(ssb, 4) AS ssb, round(ssw, 4) AS ssw,
           round((ssb / (k - 1)) / (ssw / (big_n - k)), 6) AS f_stat
    FROM parts
    """,
)
def q_anova(spark, sf_dir):
    """One-way ANOVA F-statistic across the five event types — does
    mean value differ by group? SSB/SSW from per-group moments:
    SSB = Σ S_g²/n_g − G²/N, SSW = ΣΣx² − Σ S_g²/n_g, F = (SSB/(k−1))
    / (SSW/(N−k)). Completes the hypothesis-test family beside the
    two-sample t (q_ab_test), KS (q_ks_test), and χ²-drift.

    Determinism: all moments are exact HUGEINT/DECIMAL integers on the
    cents grid; S_g²/n_g is one IEEE division per GROUP, and the only
    cross-group float sum folds over the event_type-SORTED group list
    (F.aggregate ↔ list_reduce, 0.0-seeded — the q_ewma idiom), so the
    addition sequence is identical on both engines regardless of
    partitioning; emitted sums round at 4dp, F at 6.

    Scale: one map-side-combined aggregate to k rows; everything after
    is k-row algebra.
    """
    dec = "decimal(38,0)"
    s = _t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    g = s.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("cents").cast(dec)).alias("sx"),
        F.sum(F.col("cents").cast(dec) * F.col("cents").cast(dec)).alias(
            "sxx"
        ),
    )
    # the only cross-group FLOAT reduction (Σ S_g²/n_g) rides the
    # house deterministic-fold idiom (F.aggregate ↔ DuckDB list_reduce
    # over the event_type-sorted group list, 0.0-seeded) — a plain
    # SUM's combine order varies with partitioning, and at these
    # magnitudes the ulp exceeds the 4dp rounding grid
    arr = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("big_n"),
        F.sum("sx").alias("gx"),
        F.sum("sxx").alias("gxx"),
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("event_type", "sx", "n"))
                ),
                lambda x: x["sx"].cast("double")
                * x["sx"].cast("double")
                / x["n"].cast("double"),
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        ).alias("between_raw"),
    )
    parts = arr.select(
        "k",
        "big_n",
        (
            F.col("between_raw")
            - F.col("gx").cast("double")
            * F.col("gx").cast("double")
            / F.col("big_n").cast("double")
        ).alias("ssb"),
        (F.col("gxx").cast("double") - F.col("between_raw")).alias("ssw"),
    )
    return parts.select(
        "k",
        "big_n",
        F.round("ssb", 4).alias("ssb"),
        F.round("ssw", 4).alias("ssw"),
        F.round(
            (F.col("ssb") / (F.col("k") - 1))
            / (F.col("ssw") / (F.col("big_n") - F.col("k"))),
            6,
        ).alias("f_stat"),
    )


@query(
    "q_chi2_independence",
    oracle="""
    WITH cell AS (
        SELECT o_orderpriority AS prio, o_orderstatus AS status,
               count(*) AS o
        FROM orders GROUP BY 1, 2
    ),
    rx AS (SELECT prio, CAST(sum(o) AS BIGINT) AS r FROM cell GROUP BY prio),
    cy AS (
        SELECT status, CAST(sum(o) AS BIGINT) AS s FROM cell GROUP BY status
    ),
    tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM cell)
    SELECT cell.prio, cell.status, cell.o,
           round(CAST(CAST(r.r AS HUGEINT) * c2.s AS DOUBLE)
                 / CAST(t.n AS DOUBLE), 6) AS expected,
           round(CAST((CAST(cell.o AS HUGEINT) * t.n
                       - CAST(r.r AS HUGEINT) * c2.s) AS DOUBLE)
                 * CAST((CAST(cell.o AS HUGEINT) * t.n
                         - CAST(r.r AS HUGEINT) * c2.s) AS DOUBLE)
                 / (CAST(CAST(r.r AS HUGEINT) * c2.s AS DOUBLE)
                    * CAST(CAST(t.n AS HUGEINT) * t.n AS DOUBLE)
                    / CAST(t.n AS DOUBLE)), 6) AS chi2_term
    FROM cell
    JOIN rx r USING (prio)
    JOIN cy c2 USING (status)
    CROSS JOIN tot t
    """,
)
def q_chi2_independence(spark, sf_dir):
    """Pearson chi-squared test of independence over the (priority x
    status) contingency table — the frequency-domain dual of
    q_mutual_information's information-theoretic view. Per cell:
    expected E = r*s/N and the term (O−E)²/E, algebraically cleared to
    (O*N − r*s)² / (r*s*N) so numerator and denominator are EXACT
    integers (widened to DECIMAL/HUGEINT); sum of chi2_term = the χ²
    statistic with (|prio|−1)(|status|−1) dof.

    Scale: identical shape to q_mutual_information — one hash
    aggregate to the bounded contingency table, marginals re-derived
    from it, broadcast join-backs.
    """
    dec = "decimal(38,0)"
    cell = (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderstatus").alias("status"),
        )
        .groupBy("prio", "status")
        .agg(F.count(F.lit(1)).alias("o"))
        # four consumers (marginals x2, total, final join) — one scan
        # of the fact, then reads of the |prio|x|status|-row relation
        .localCheckpoint()
    )
    rx = cell.groupBy("prio").agg(F.sum("o").alias("r"))
    cy = cell.groupBy("status").agg(F.sum("o").alias("s"))
    tot = cell.agg(F.sum("o").alias("n"))
    rs = F.col("r").cast(dec) * F.col("s").cast(dec)
    on = F.col("o").cast(dec) * F.col("n").cast(dec)
    num = on - rs
    return (
        cell.join(F.broadcast(rx), "prio")
        .join(F.broadcast(cy), "status")
        .crossJoin(F.broadcast(tot))
        .select(
            "prio",
            "status",
            "o",
            F.round(
                rs.cast("double") / F.col("n").cast("double"), 6
            ).alias("expected"),
            F.round(
                num.cast("double")
                * num.cast("double")
                / (
                    rs.cast("double")
                    * (F.col("n").cast(dec) * F.col("n").cast(dec)).cast(
                        "double"
                    )
                    / F.col("n").cast("double")
                ),
                6,
            ).alias("chi2_term"),
        )
    )


# --------------------------------------- multiple-testing correction

_BH_ALPHA = 0.05
# Normal tail via Abramowitz & Stegun 26.2.17 (|err| < 7.5e-8): the
# SAME literal coefficients and op order on both engines, evaluated
# from the 6dp-ROUNDED z, with the result rounded to 6dp — the only
# non-correctly-rounded IEEE op in the chain is exp(), whose <=1ulp
# cross-engine spread is ~1e-16 relative, 10 orders below the rounding
# grid (the q_unigram_logprob log() precedent). Canonical home of the
# coefficients is operators/stats.py since r8 (shared with
# normal_two_sided_p / q_mann_whitney); the oracle f-strings below
# interpolate these SAME Python floats.
from ..operators.stats import (  # noqa: E402
    INV_SQRT_2PI as _BH_INV_SQRT_2PI,
    NORMAL_TAIL_B as _BH_B,
)


@query(
    "q_benjamini_hochberg",
    oracle=f"""
    WITH g AS (
        SELECT c_nationkey AS nationkey, count(*) AS n_cust,
               CAST(sum(CASE WHEN c_acctbal > 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_pos
        FROM customer GROUP BY c_nationkey
    ),
    tot AS (
        SELECT CAST(sum(n_cust) AS BIGINT) AS big_n,
               CAST(sum(n_pos) AS BIGINT) AS big_s,
               count(*) AS m
        FROM g
    ),
    z AS (
        SELECT nationkey, n_cust, n_pos, t.m,
               round((CAST(n_pos AS DOUBLE) / CAST(n_cust AS DOUBLE)
                      - CAST(t.big_s - n_pos AS DOUBLE)
                        / CAST(t.big_n - n_cust AS DOUBLE))
                     / sqrt((CAST(t.big_s AS DOUBLE) / CAST(t.big_n AS DOUBLE))
                            * (1.0 - CAST(t.big_s AS DOUBLE)
                                     / CAST(t.big_n AS DOUBLE))
                            * (1.0 / CAST(n_cust AS DOUBLE)
                               + 1.0 / CAST(t.big_n - n_cust AS DOUBLE))),
                     6) AS z_score
        FROM g CROSS JOIN tot t
    ),
    p AS (
        SELECT nationkey, n_cust, n_pos, m, z_score,
               1.0 / (1.0 + 0.2316419 * abs(z_score)) AS tt,
               {_BH_INV_SQRT_2PI} * exp(-(abs(z_score) * abs(z_score)) / 2.0)
                 AS pdf
        FROM z
    ),
    pv AS (
        SELECT nationkey, n_cust, n_pos, m, z_score,
               round(2.0 * pdf * (tt * ({_BH_B[0]} + tt * ({_BH_B[1]}
                     + tt * ({_BH_B[2]} + tt * ({_BH_B[3]}
                     + tt * {_BH_B[4]}))))), 6) AS p_value
        FROM p
    ),
    ranked AS (
        SELECT *, row_number() OVER (ORDER BY p_value, nationkey) AS k,
               CAST(row_number() OVER (ORDER BY p_value, nationkey)
                    AS DOUBLE) * {_BH_ALPHA} / CAST(m AS DOUBLE)
                 AS bh_thresh
        FROM pv
    ),
    km AS (
        SELECT max(CASE WHEN p_value <= bh_thresh THEN k END) AS kmax
        FROM ranked
    )
    SELECT r.nationkey, r.n_cust, r.n_pos, r.z_score, r.p_value,
           r.k, r.bh_thresh,
           CASE WHEN km.kmax IS NOT NULL AND r.k <= km.kmax
                THEN TRUE ELSE FALSE END AS rejected
    FROM ranked r CROSS JOIN km
    """,
)
def q_benjamini_hochberg(spark, sf_dir):
    """Benjamini-Hochberg FDR control (Benjamini & Hochberg 1995) over
    a family of per-segment two-proportion z-tests — the
    multiple-testing step every experimentation platform runs after
    computing one test per segment/metric (q_ab_test gives ONE
    p-value; a real readout has hundreds, and alpha-per-test drowns in
    false positives). Per nation: pooled two-proportion z for "share
    of positive-balance customers differs from the rest", two-sided
    p via the A&S 26.2.17 normal-tail polynomial, then the BH step-up:
    rank p ascending, k* = max{{k : p_(k) <= k/m*alpha}}, reject ranks
    <= k*.

    Determinism: z is divisions/sqrt over exact integer counts — all
    correctly-rounded IEEE ops, bit-identical cross-engine — rounded
    to 6dp; p is the SAME fixed literal-coefficient polynomial x exp()
    on both engines evaluated from the rounded z, rounded to 6dp; the
    threshold k*alpha/m is two correctly-rounded IEEE ops on exact
    integers (deliberately unrounded — a 6dp grid would distort BH at
    large m, see bh_stepup), so the comparison runs on bit-identical
    doubles and the rejected set is engine-independent. The rank is a
    total order (p, nation).

    On THIS data the rejected set is empty — the synthetic tables are
    a true null (per-nation balance shares are i.i.d. uniform), and an
    FDR procedure that rejected anything here would be broken. The
    step-up machinery itself (prefix rejection through a later rank's
    threshold, the k* scalar) is pinned by the planted-p-value unit
    test in tests/test_operators.py.

    Scale: the fact table reduces to one |segments|-row relation in a
    single hash aggregate; the global rank inside `bh_stepup` rides
    distributed_cumulative (never a single-partition window, even
    though m is small here — at a feature store's m ~ 10^6 tests the
    same plan holds); kmax is a 1-row scalar combined back broadcast.
    """
    from ..operators.stats import bh_stepup, normal_two_sided_p

    g = (
        _t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.sum(
                F.when(F.col("c_acctbal") > 0, 1).otherwise(0)
            ).alias("n_pos"),
        )
    )
    tot = g.agg(
        F.sum("n_cust").alias("big_n"),
        F.sum("n_pos").alias("big_s"),
        F.count(F.lit(1)).alias("m"),
    )
    nd, sd = F.col("n_cust").cast("double"), F.col("n_pos").cast("double")
    bn, bs = F.col("big_n").cast("double"), F.col("big_s").cast("double")
    rest_n = (F.col("big_n") - F.col("n_cust")).cast("double")
    rest_s = (F.col("big_s") - F.col("n_pos")).cast("double")
    pp = bs / bn
    z_expr = (sd / nd - rest_s / rest_n) / F.sqrt(
        pp * (F.lit(1.0) - pp) * (F.lit(1.0) / nd + F.lit(1.0) / rest_n)
    )
    z = g.crossJoin(F.broadcast(tot)).select(
        "nationkey",
        "n_cust",
        "n_pos",
        "m",
        F.round(z_expr, 6).alias("z_score"),
    )
    pv = z.select(
        "nationkey",
        "n_cust",
        "n_pos",
        "z_score",
        # the canonical tail evaluation (operators/stats.py) — the
        # oracle above interpolates the SAME coefficient literals
        normal_two_sided_p(F.col("z_score")).alias("p_value"),
    )
    return bh_stepup(
        pv, p_col="p_value", tiebreak_cols=["nationkey"], alpha=_BH_ALPHA
    ).select(
        "nationkey",
        "n_cust",
        "n_pos",
        "z_score",
        "p_value",
        "k",
        "bh_thresh",
        "rejected",
    )


# ------------------------------------------- always-valid sequential test

# the oracle interpolates the SAME constant the shared operator uses
from ..operators.msprt import MSPRT_TAU as _MSPRT_TAU  # noqa: E402


@query(
    "q_msprt",
    oracle=f"""
    WITH e AS (
        SELECT CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day_num,
               user_id % 2 AS variant,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE ts IS NOT NULL
    ),
    daily AS (
        SELECT day_num,
               CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n0,
               CAST(sum(CASE WHEN variant = 0 THEN cents ELSE 0 END)
                    AS HUGEINT) AS s0,
               CAST(sum(CASE WHEN variant = 0
                             THEN CAST(cents AS HUGEINT) * cents
                             ELSE 0 END) AS HUGEINT) AS q0,
               CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n1,
               CAST(sum(CASE WHEN variant = 1 THEN cents ELSE 0 END)
                    AS HUGEINT) AS s1,
               CAST(sum(CASE WHEN variant = 1
                             THEN CAST(cents AS HUGEINT) * cents
                             ELSE 0 END) AS HUGEINT) AS q1
        FROM e GROUP BY day_num
    ),
    cum AS (
        SELECT day_num,
               CAST(sum(n0) OVER w AS BIGINT) AS cn0,
               CAST(sum(s0) OVER w AS HUGEINT) AS cs0,
               CAST(sum(q0) OVER w AS HUGEINT) AS cq0,
               CAST(sum(n1) OVER w AS BIGINT) AS cn1,
               CAST(sum(s1) OVER w AS HUGEINT) AS cs1,
               CAST(sum(q1) OVER w AS HUGEINT) AS cq1
        FROM daily
        WINDOW w AS (ORDER BY day_num
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    stats AS (
        SELECT day_num, cn0, cn1,
               CAST(cs0 AS DOUBLE) / CAST(cn0 AS DOUBLE) AS mean0,
               CAST(cs1 AS DOUBLE) / CAST(cn1 AS DOUBLE) AS mean1,
               CAST(cq0 + cq1 AS DOUBLE) AS cqq
        FROM cum
    ),
    v AS (
        SELECT day_num, cn0, cn1, mean0, mean1,
               (cqq - CAST(cn0 AS DOUBLE) * mean0 * mean0
                    - CAST(cn1 AS DOUBLE) * mean1 * mean1)
                 / CAST(cn0 + cn1 - 2 AS DOUBLE) AS s2
        FROM stats WHERE cn0 > 1 AND cn1 > 1
    ),
    lam AS (
        SELECT day_num, cn0, cn1, mean0 - mean1 AS delta,
               s2 * (1.0 / CAST(cn0 AS DOUBLE)
                     + 1.0 / CAST(cn1 AS DOUBLE)) AS vv
        FROM v WHERE s2 > 0
    ),
    l2 AS (
        SELECT day_num, cn0, cn1, delta,
               round(sqrt(vv / (vv + {_MSPRT_TAU}))
                     * exp(delta * delta * {_MSPRT_TAU}
                           / (2.0 * vv * (vv + {_MSPRT_TAU}))), 6) AS lam
        FROM lam WHERE vv > 0
    ),
    rm AS (
        SELECT day_num, cn0, cn1, delta, lam,
               max(lam) OVER (ORDER BY day_num
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS run_max
        FROM l2
    )
    SELECT day_num, cn0 AS n_a, cn1 AS n_b,
           round(delta, 6) AS mean_diff_cents, lam,
           round(CASE WHEN run_max > 1.0 THEN 1.0 / run_max ELSE 1.0 END, 6)
             AS p_always_valid
    FROM rm
    """,
)
def q_msprt(spark, sf_dir):
    """Always-valid sequential A/B test — the mixture SPRT (Johari,
    Pekelis & Walsh, "Peeking at A/B Tests", KDD 2017): at every
    analysis day t, the running likelihood ratio
    Lambda_t = sqrt(V/(V+tau)) * exp(delta^2 tau / (2 V (V+tau)))
    over the cumulative two-sample mean difference (V = pooled
    s^2*(1/n0+1/n1), tau = the mixture prior scale), and the
    always-valid p-value p_t = min(1, 1/max_{{s<=t}} Lambda_s). Unlike
    q_ab_test's fixed-horizon t-test, p_t is valid under CONTINUOUS
    monitoring — the experimenter can stop any day without inflating
    false positives; it completes the experimentation arc beside
    q_cuped (variance reduction) and q_benjamini_hochberg (many
    tests). On this true-null stream p_t stays 1.0 throughout — the
    non-increasing-p invariant and the Lambda algebra are pinned by
    tests (monotonicity on real output; formula re-derived in pure
    Python).

    Determinism: daily and cumulative moments are exact
    BIGINT/HUGEINT/DECIMAL sums (cumulatives via a triangular join
    over the bounded day relation — ~31 days here, <=366 at any
    scale, so this is the q_histogram_quantiles bounded-relation
    pattern, not a data-sized funnel); every float after that is the
    SAME op sequence on both engines, with Lambda rounded to 6dp
    BEFORE the running max so the argmax can't flip on exp()'s 1-ulp
    spread, and p rounded to 6dp.

    Scale: one hash aggregate reduces the stream to <=366 day rows;
    everything after is bounded-relation algebra. Both stages live in
    operators/msprt.py (daily_moments + msprt_from_daily), shared with
    streaming/msprt.py: the per-day moments are the additive relation
    a streaming deployment maintains via merge_aggregate, and the
    parity test pins streamed == batch bit-identically (the
    streaming/als.py pattern).
    """
    from ..operators.msprt import daily_moments, msprt_from_daily

    return msprt_from_daily(
        daily_moments(_t(spark, sf_dir, "events")), tau=_MSPRT_TAU
    )


# ------------------------------------------------- rank-sum (Mann-Whitney)


@query(
    "q_mann_whitney",
    oracle=f"""
    WITH e AS (
        SELECT event_type, user_id % 2 AS variant,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    g AS (
        SELECT event_type, cents,
               CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS na_c,
               CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS nb_c
        FROM e GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, cents, na_c, nb_c, na_c + nb_c AS t,
               coalesce(sum(na_c + nb_c) OVER (
                   PARTITION BY event_type ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cb
        FROM g
    ),
    s AS (
        SELECT event_type,
               CAST(sum(na_c) AS BIGINT) AS n_a,
               CAST(sum(nb_c) AS BIGINT) AS n_b,
               CAST(sum(CAST(na_c AS HUGEINT) * (2 * cb + t + 1))
                    AS HUGEINT) AS r2a,
               CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS tie
        FROM r GROUP BY 1
    ),
    z AS (
        SELECT event_type, n_a, n_b,
               CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1) AS DOUBLE) / 2.0
                 AS u_a,
               CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE) AS nn,
               CAST(n_a + n_b AS DOUBLE) AS nd,
               CAST(r2a - CAST(n_a AS HUGEINT) * (n_a + 1)
                        - CAST(n_a AS HUGEINT) * n_b AS DOUBLE) AS num,
               CAST(tie AS DOUBLE) AS tied
        FROM s
    ),
    zz AS (
        SELECT event_type, n_a, n_b, u_a,
               nn / 12.0 * ((nd + 1.0) - tied / (nd * (nd - 1.0))) AS var
        FROM z
    ),
    z6 AS (
        SELECT zz.event_type, zz.n_a, zz.n_b, zz.u_a,
               CASE WHEN zz.n_a > 0 AND zz.n_b > 0 AND zz.var > 0
                    THEN round(z.num / (2.0 * sqrt(zz.var)), 6)
               END AS z_score
        FROM zz JOIN z ON z.event_type = zz.event_type
    ),
    p AS (
        SELECT event_type, n_a, n_b, u_a, z_score,
               1.0 / (1.0 + 0.2316419 * abs(z_score)) AS tt,
               {_BH_INV_SQRT_2PI} * exp(-(abs(z_score) * abs(z_score)) / 2.0)
                 AS pdf
        FROM z6
    )
    SELECT event_type, n_a, n_b, u_a, z_score,
           round(2.0 * pdf * (tt * ({_BH_B[0]} + tt * ({_BH_B[1]}
                 + tt * ({_BH_B[2]} + tt * ({_BH_B[3]}
                 + tt * {_BH_B[4]}))))), 6) AS p_value
    FROM p
    """,
)
def q_mann_whitney(spark, sf_dir):
    """Mann-Whitney U (Wilcoxon rank-sum) test with tie correction —
    the nonparametric two-sample location test every experimentation
    stack reaches for when the metric is skewed (revenue, latency) and
    q_ab_test's t-test assumptions fail; completes the test family
    beside q_ks_test (distribution shape) and q_chi2_independence
    (categorical). One test per event_type segment: variant =
    user_id % 2 on the cents grid.

    Ranking WITHOUT sorting rows: values land on the exact cents grid,
    so the pooled ranks come from per-(segment, cents) COUNTS — the
    midrank of a tie group is cum_before + (t+1)/2, so the rank sum
    lifts to the integer 2·R_A = Σ na_c·(2·cum_before + t + 1) (the
    half-grid cleared by doubling, the house integer-grid move). U,
    the tie term Σ(t³−t), and the z numerator 2U−n_a·n_b are then all
    exact HUGEINT/DECIMAL algebra; z is a fixed float op sequence over
    those exact integers (rounded 6dp), and the two-sided p is the
    SAME A&S 26.2.17 polynomial q_benjamini_hochberg uses, evaluated
    from the rounded z on both engines. Degenerate segments (one
    variant empty, or every value tied) yield NULL z/p on BOTH
    engines.

    Scale: the shuffle reduces the stream to the (segment, cents)
    grid — bounded by the VALUE GRID (10⁴ cents values), not the row
    count; the cumulative is a window PARTITIONED by segment over
    that grid (never a global single-partition sort); everything
    after is one row per segment. Both stages live in
    operators/stats.py (mw_grid + mw_from_grid): the grid counts are
    ADDITIVE, so a streaming deployment maintains them via
    merge_aggregate and the parity test pins streamed == batch
    bit-identically (the msprt/als pattern, through the generic
    make_aggregate_merge_fn).
    """
    from ..operators.stats import mw_from_grid, mw_grid

    return mw_from_grid(mw_grid(_t(spark, sf_dir, "events")))


# ------------------------------------------------------- Benford audit

# log10(1 + 1/d) computed ONCE in Python and interpolated as the SAME
# literal into both engines (no runtime transcendentals to disagree on)
_BENFORD_P = {
    1: 0.3010299956639812,
    2: 0.17609125905568124,
    3: 0.12493873660829992,
    4: 0.09691001300805642,
    5: 0.07918124604762482,
    6: 0.06694678963061322,
    7: 0.05799194697768673,
    8: 0.05115252244738129,
    9: 0.04575749056067514,
}


def _benford_oracle() -> str:
    cases = " ".join(
        f"WHEN {d} THEN {p!r}" for d, p in _BENFORD_P.items()
    )
    return f"""
    WITH c AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100, 0) AS BIGINT)
                                AS VARCHAR), 1, 1) AS BIGINT) AS digit,
               count(*) AS n_obs
        FROM orders
        WHERE o_totalprice > 0
        GROUP BY 1
    ),
    axis AS (SELECT unnest(range(1, 10)) AS digit),
    tot AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM c),
    j AS (
        SELECT a.digit, coalesce(c.n_obs, 0) AS n_obs,
               CASE a.digit {cases} END AS p, t.n
        FROM axis a LEFT JOIN c ON c.digit = a.digit CROSS JOIN tot t
    )
    SELECT digit, CAST(n_obs AS BIGINT) AS n_obs,
           round(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS obs_frac,
           round(p, 6) AS benford_p,
           round((CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p)
                 * (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p)
                 / (CAST(n AS DOUBLE) * p), 6) AS chi2_term
    FROM j
    """


@query("q_benford", oracle=_benford_oracle())
def q_benford(spark, sf_dir):
    """Benford first-significant-digit audit — the classic anomaly /
    fraud / data-quality screen on naturally-spanning amounts: the
    leading digit of o_totalprice against log10(1+1/d), with the
    per-digit chi-square contribution (the column an auditor ranks to
    find WHICH digit is off). TPC-H-ish totalprice spans ~3 orders of
    magnitude, so it roughly Benfords; a synthetic-uniform column
    would not — either way the procedure is what is pinned, and the
    chi2_term column is the evidence trail.

    Determinism, house style: the leading digit comes from the DECIMAL
    STRING of the exact cents integer — substr(cast(cents as string))
    — never floor(x/10^floor(log10 x)) whose float log flips on
    power-of-ten boundaries; expected fractions are Python-computed
    literals interpolated identically into both engines (no runtime
    log10 to disagree on); chi² terms are a fixed float sequence over
    exact counts, rounded 6dp. All 9 digit rows always present (axis
    LEFT JOIN + coalesce 0).

    Scale: one hash aggregate to ≤9 rows; the digit axis is a
    9-row literal; the total is a 1-row broadcast scalar combine
    (NESTED_LOOP_OK: q_benford)."""
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 0)
        .select(
            F.substring(
                F.round(F.col("o_totalprice") * 100, 0)
                .cast("long")
                .cast("string"),
                1,
                1,
            )
            .cast("long")
            .alias("digit")
        )
    )
    c = o.groupBy("digit").agg(F.count(F.lit(1)).alias("n_obs"))
    axis = spark.range(1, 10).select(F.col("id").alias("digit"))
    tot = c.agg(F.sum("n_obs").cast("long").alias("n"))
    p_col = F.element_at(
        F.create_map(
            *[F.lit(x) for d, p in sorted(_BENFORD_P.items()) for x in (d, p)]
        ),
        F.col("digit").cast("int"),
    )
    j = (
        axis.join(c, "digit", "left")
        .withColumn("n_obs", F.coalesce(F.col("n_obs"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
        .withColumn("p", p_col)
    )
    nd = F.col("n").cast("double")
    dev = F.col("n_obs").cast("double") - nd * F.col("p")
    return j.select(
        "digit",
        F.col("n_obs").cast("long").alias("n_obs"),
        F.round(F.col("n_obs").cast("double") / nd, 6).alias("obs_frac"),
        F.round(F.col("p"), 6).alias("benford_p"),
        F.round(dev * dev / (nd * F.col("p")), 6).alias("chi2_term"),
    )


# ------------------------------------------------------ autocorrelation

_ACF_MAX_LAG = 7


@query(
    "q_acf",
    oracle=f"""
    WITH daily AS (
        SELECT CAST(floor(epoch_ms(ts) / 86400000) AS BIGINT) AS day_num,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS HUGEINT)
                 AS x
        FROM events WHERE ts IS NOT NULL
        GROUP BY 1
    ),
    tot AS (
        SELECT CAST(sum(x) AS HUGEINT) AS s, count(*) AS n FROM daily
    ),
    lags AS (SELECT unnest(range(0, {_ACF_MAX_LAG} + 1)) AS k),
    pairs AS (
        SELECT l.k, count(*) AS m_k,
               CAST(sum(a.x * b.x) AS HUGEINT) AS p_k,
               CAST(sum(a.x) AS HUGEINT) AS h_k,
               CAST(sum(b.x) AS HUGEINT) AS t_k
        FROM daily a CROSS JOIN lags l
        JOIN daily b ON b.day_num = a.day_num + l.k
        GROUP BY l.k
    ),
    c AS (
        SELECT p.k, p.m_k,
               (CAST(p.p_k AS DOUBLE)
                - (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
                  * (CAST(p.h_k AS DOUBLE) + CAST(p.t_k AS DOUBLE))
                + CAST(p.m_k AS DOUBLE)
                  * (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
                  * (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)))
               / CAST(t.n AS DOUBLE) AS c_k
        FROM pairs p CROSS JOIN tot t
    ),
    c0 AS (SELECT c_k AS c_0 FROM c WHERE k = 0)
    SELECT c.k AS lag, CAST(c.m_k AS BIGINT) AS n_pairs,
           round(c.c_k / c0.c_0, 6) AS acf
    FROM c CROSS JOIN c0
    """,
)
def q_acf(spark, sf_dir):
    """Autocorrelation function of the daily-revenue series at lags
    0..7 — the seasonality/persistence diagnostic behind every
    forecasting pipeline (a weekly cycle shows as a lag-7 peak), and
    the time-series sibling of q_seasonal_decompose. r_k is the
    standard biased estimator c_k/c_0 with the GLOBAL mean and a
    fixed 1/N normalizer (the statsmodels default), computed on the
    days actually present (a calendar gap simply contributes no
    (t, t+k) pair — m_k records the pair count per lag).

    Determinism, house style: a float sum over pairs would be
    summation-order-dependent, so the centered cross-product is
    EXPANDED into pure integer sums — c_k ∝ P_k − x̄(H_k+T_k) + m_k·x̄²
    with P_k = Σx_t·x_{{t+k}}, H/T the head/tail sums, all exact
    HUGEINT/DECIMAL — then ONE fixed float op sequence (x̄ = S/N a
    single division) evaluated identically on both engines; r_k
    rounds at 6dp. Lag 0 emits acf = 1.0 by construction (the
    denominator is its own numerator — a free sanity row).

    Scale: one hash aggregate reduces the stream to ≤366 day rows;
    the lag fan is an 8× explode of that bounded relation joined
    equi on day_num + k; S/N and c_0 are 1-row broadcast scalar
    combines (NESTED_LOOP_OK: q_acf).
    """
    from ..functions.time import day_id

    dec18 = "decimal(18,0)"
    daily = (
        _t(spark, sf_dir, "events")
        .filter(F.col("ts").isNotNull())
        .groupBy(day_id("ts").alias("day_num"))
        .agg(
            # cast each operand to decimal BEFORE the sum (the
            # daily_moments pattern — a LongType sum would silently
            # wrap past 2^63 cents/day while the oracle's HUGEINT
            # stays exact); the exact result then narrows to
            # decimal(18,0) so the lag products fit precision 38
            # (headroom: 10^18 cents = 10^16 dollars per day)
            F.sum(
                F.round(F.col("value") * 100, 0)
                .cast("long")
                .cast("decimal(38,0)")
            )
            .cast(dec18)
            .alias("x")
        )
        # three consumers: pair a-side, pair b-side, the global moments
        .localCheckpoint()
    )
    tot = daily.agg(
        F.sum("x").cast("decimal(38,0)").alias("s"),
        F.count(F.lit(1)).alias("n"),
    )
    lags = spark.range(0, _ACF_MAX_LAG + 1).select(F.col("id").alias("k"))
    a = daily.alias("a").crossJoin(F.broadcast(lags))
    b = daily.alias("b")
    pairs = (
        a.join(
            b,
            F.col("b.day_num") == F.col("a.day_num") + F.col("k"),
        )
        .groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("m_k"),
            F.sum(F.col("a.x") * F.col("b.x")).alias("p_k"),
            F.sum(F.col("a.x")).alias("h_k"),
            F.sum(F.col("b.x")).alias("t_k"),
        )
    )
    xbar = F.col("s").cast("double") / F.col("n").cast("double")
    c_k = (
        F.col("p_k").cast("double")
        - xbar * (F.col("h_k").cast("double") + F.col("t_k").cast("double"))
        + F.col("m_k").cast("double") * xbar * xbar
    ) / F.col("n").cast("double")
    c = pairs.crossJoin(F.broadcast(tot)).select(
        "k", "m_k", c_k.alias("c_k")
    ).localCheckpoint()  # two consumers: all rows + the k=0 scalar
    c0 = c.filter(F.col("k") == 0).select(F.col("c_k").alias("c_0"))
    return c.crossJoin(F.broadcast(c0)).select(
        F.col("k").alias("lag"),
        F.col("m_k").cast("long").alias("n_pairs"),
        F.round(F.col("c_k") / F.col("c_0"), 6).alias("acf"),
    )


# ---------------------------------------------- Spearman rank correlation


@query(
    "q_spearman",
    oracle="""
    WITH cells AS (
        SELECT l_returnflag AS seg,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS yc,
               count(*) AS cnt
        FROM lineitem GROUP BY 1, 2, 3
    ),
    xg AS (
        SELECT seg, x, t,
               2 * coalesce(sum(t) OVER (
                   PARTITION BY seg ORDER BY x
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + t + 1 AS rx2
        FROM (SELECT seg, x, CAST(sum(cnt) AS BIGINT) AS t
              FROM cells GROUP BY 1, 2)
    ),
    yg AS (
        SELECT seg, yc, t,
               2 * coalesce(sum(t) OVER (
                   PARTITION BY seg ORDER BY yc
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 + t + 1 AS ry2
        FROM (SELECT seg, yc, CAST(sum(cnt) AS BIGINT) AS t
              FROM cells GROUP BY 1, 2)
    ),
    s AS (
        SELECT c.seg,
               CAST(sum(c.cnt) AS HUGEINT) AS n,
               CAST(sum(c.cnt * CAST(xg.rx2 AS HUGEINT)) AS HUGEINT) AS s1,
               CAST(sum(c.cnt * CAST(yg.ry2 AS HUGEINT)) AS HUGEINT) AS s2,
               CAST(sum(c.cnt * CAST(xg.rx2 AS HUGEINT) * xg.rx2)
                    AS HUGEINT) AS s11,
               CAST(sum(c.cnt * CAST(yg.ry2 AS HUGEINT) * yg.ry2)
                    AS HUGEINT) AS s22,
               CAST(sum(c.cnt * CAST(xg.rx2 AS HUGEINT) * yg.ry2)
                    AS HUGEINT) AS s12
        FROM cells c
        JOIN xg ON xg.seg = c.seg AND xg.x = c.x
        JOIN yg ON yg.seg = c.seg AND yg.yc = c.yc
        GROUP BY 1
    )
    SELECT seg AS returnflag, CAST(n AS BIGINT) AS n,
           CASE WHEN n > 1 AND (n * s11 - s1 * s1) > 0
                     AND (n * s22 - s2 * s2) > 0
                THEN round(CAST(n * s12 - s1 * s2 AS DOUBLE)
                           / sqrt(CAST(n * s11 - s1 * s1 AS DOUBLE)
                                  * CAST(n * s22 - s2 * s2 AS DOUBLE)), 6)
           END AS rho
    FROM s
    """,
)
def q_spearman(spark, sf_dir):
    """Tie-corrected Spearman rank correlation per segment — the
    nonparametric monotone-association companion to q_corr_covar's
    Pearson (rank-based, so it survives the skewed metrics that break
    Pearson, the same motivation as q_mann_whitney). rho = Pearson of
    the pooled midranks of quantity vs extended price within each
    l_returnflag segment; ties get average ranks, making this the
    tie-corrected (Kendall 1948) form.

    Ranking WITHOUT sorting rows — the q_mann_whitney grid move, taken
    one step further: rows collapse to (segment, x, y) CELLS, each
    variable's midrank comes from per-value counts (midrank lifted to
    the integer 2·rank grid: rx2 = 2·cum_before + t + 1), and every
    Pearson sum lifts to the cells: Σ_rows rx·ry = Σ_cells cnt·rx·ry.
    The scale factors of 2 cancel in rho, so computing on the 2×-grid
    changes nothing. All six sums (n, Σrx, Σry, Σrx², Σry², Σrx·ry)
    are exact DECIMAL/HUGEINT algebra; rho is a fixed float sequence
    over those exact integers — two cast-to-double factors multiplied,
    one sqrt, one division — rounded 6dp. Degenerate segments (all x
    tied or all y tied) are NULL on both engines. The cell relation is
    ADDITIVE, so a streaming deployment maintains it via the generic
    fold factory (test_streaming_spearman_equals_batch pins streamed
    ≡ batch bit-identically).

    Scale: the shuffle reduces rows to the value-grid cells (bounded
    by |x grid| × |y grid| per segment, not row count); rank tables
    are marginal sums OVER the cells (windows partitioned by segment
    on the bounded grid, never a global sort); the joins back are
    grid-sized equi-joins. n·S11 grows as 4n⁴ — inside decimal(38)
    up to n ~ 10⁹ per segment; beyond that the sums shift to the
    centered/streaming form (document'd, not hit at any tested sf).
    """
    from ..operators.stats import spearman_cells, spearman_from_cells

    # three consumers of the cell relation (both marginal rank tables
    # and the cell join) — materialize once
    cells = spearman_cells(_t(spark, sf_dir, "lineitem")).localCheckpoint()
    return spearman_from_cells(cells).select(
        F.col("seg").alias("returnflag"), "n", "rho"
    )


# ------------------------------------------------- Kendall tau-b (binned)


@query(
    "q_kendall_tau",
    oracle="""
    WITH cells AS (
        SELECT l_returnflag AS seg,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(floor(l_extendedprice / 5000) AS BIGINT) AS yb,
               count(*) AS cnt
        FROM lineitem GROUP BY 1, 2, 3
    ),
    cd AS (
        SELECT c1.seg,
               CAST(sum(CASE WHEN c1.yb < c2.yb
                    THEN CAST(c1.cnt AS HUGEINT) * c2.cnt ELSE 0 END)
                    AS HUGEINT) AS conc,
               CAST(sum(CASE WHEN c1.yb > c2.yb
                    THEN CAST(c1.cnt AS HUGEINT) * c2.cnt ELSE 0 END)
                    AS HUGEINT) AS disc
        FROM cells c1 JOIN cells c2
          ON c2.seg = c1.seg AND c1.x < c2.x
        GROUP BY 1
    ),
    tx AS (
        SELECT seg, CAST(sum(t) AS HUGEINT) AS n_x,
               CAST(sum(CAST(t AS HUGEINT) * (t - 1)) AS HUGEINT) AS n1
        FROM (SELECT seg, x, CAST(sum(cnt) AS BIGINT) AS t
              FROM cells GROUP BY 1, 2)
        GROUP BY 1
    ),
    ty AS (
        SELECT seg,
               CAST(sum(CAST(t AS HUGEINT) * (t - 1)) AS HUGEINT) AS n2
        FROM (SELECT seg, yb, CAST(sum(cnt) AS BIGINT) AS t
              FROM cells GROUP BY 1, 2)
        GROUP BY 1
    )
    SELECT tx.seg AS returnflag,
           CAST(n_x AS BIGINT) AS n,
           CAST(coalesce(conc, 0) AS BIGINT) AS concordant,
           CAST(coalesce(disc, 0) AS BIGINT) AS discordant,
           CASE WHEN n_x * (n_x - 1) - n1 > 0
                 AND n_x * (n_x - 1) - n2 > 0
                THEN round(2.0 * CAST(coalesce(conc, 0) - coalesce(disc, 0)
                          AS DOUBLE)
                     / sqrt(CAST(n_x * (n_x - 1) - n1 AS DOUBLE)
                          * CAST(n_x * (n_x - 1) - n2 AS DOUBLE)), 6)
           END AS tau_b
    FROM tx JOIN ty ON ty.seg = tx.seg LEFT JOIN cd ON cd.seg = tx.seg
    """,
)
def q_kendall_tau(spark, sf_dir):
    """Tie-corrected Kendall tau-b per segment — completing the
    rank-correlation family beside q_spearman (rho weighs rank
    DISTANCES; tau counts pair INVERSIONS, the Kemeny-distance view,
    and is the standard companion statistic). Quantity vs the 5000-
    unit price bucket within each l_returnflag segment.

    The honest scale contract, stated in kendall_cells: tau needs
    PAIRWISE concordance, so it is computed on a BOUNDED value grid —
    rows collapse to (seg, x, yb) cells (additive, stream-foldable
    like the Spearman cells), and C−D is ONE cell self-join per
    segment restricted to x1 < x2, a fan of at most |X grid|·|Y grid|
    squared cells (50 × ~22 here), FIXED by the schema, never by row
    count. Exact continuous-value tau would need a global merge-sort
    inversion count — not relational; the binned tau-b IS the
    streaming-maintainable statistic. Tie terms ride the marginals;
    the ½ factors cancel (tau_b = 2(C−D)/sqrt((N0−N1)(N0−N2)) with
    N0 = n(n−1), N1 = Σt(t−1), N2 = Σu(u−1)), so every aggregate is a
    pure-integer DECIMAL/HUGEINT; tau is one sqrt + one division over
    those exact integers, rounded 6dp. Degenerate segments (all x or
    all y tied) emit their row with tau_b NULL — the marginals drive
    the output and the empty pair relation left-joins in as 0/0."""
    from ..operators.stats import kendall_cells, kendall_from_cells

    # three consumers of the cell relation (both pair sides + two
    # marginals) — materialize once
    cells = kendall_cells(_t(spark, sf_dir, "lineitem")).localCheckpoint()
    return kendall_from_cells(cells).select(
        F.col("seg").alias("returnflag"),
        "n", "concordant", "discordant", "tau_b",
    )


# --------------------------------------------- Kendall tau-b (capped exact)

_KT_CAP = 1500  # rows kept per segment before the O(cap²) pair fan


@query(
    "q_kendall_exact",
    oracle=f"""
    WITH pt AS (
        SELECT l_returnflag AS seg,
               CAST(l_quantity AS BIGINT) AS x,
               CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS y,
               md5(CAST(l_orderkey AS VARCHAR) || '_'
                   || CAST(l_linenumber AS VARCHAR)) AS hk,
               l_orderkey AS k1, l_linenumber AS k2
        FROM lineitem
    ),
    cnt AS (SELECT seg, count(*) AS n_seg FROM pt GROUP BY 1),
    pre AS (
        SELECT pt.* FROM pt JOIN cnt ON cnt.seg = pt.seg
        WHERE ('0x' || substring(hk, 1, 8))::BIGINT
              < LEAST(4294967296,
                      CAST(ceil({4294967296.0 * 2 * _KT_CAP!r} / n_seg)
                           AS BIGINT))
    ),
    capped AS (
        SELECT seg, x, y, rn FROM (
            SELECT seg, x, y, row_number() OVER (
                       PARTITION BY seg ORDER BY hk, k1, k2, x, y) AS rn
            FROM pre
        ) WHERE rn <= {_KT_CAP}
    ),
    cd AS (
        SELECT a.seg,
               CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) > 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS conc,
               CAST(sum(CASE WHEN (a.x - b.x) * (a.y - b.y) < 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS disc
        FROM capped a JOIN capped b
          ON a.seg = b.seg AND a.rn < b.rn
        GROUP BY 1
    ),
    tx AS (
        SELECT seg, CAST(sum(t) AS BIGINT) AS n,
               CAST(sum(t * (t - 1)) AS BIGINT) AS n1
        FROM (SELECT seg, x, count(*) AS t FROM capped GROUP BY 1, 2)
        GROUP BY 1
    ),
    ty AS (
        SELECT seg, CAST(sum(t * (t - 1)) AS BIGINT) AS n2
        FROM (SELECT seg, y, count(*) AS t FROM capped GROUP BY 1, 2)
        GROUP BY 1
    )
    SELECT tx.seg AS returnflag, n,
           coalesce(conc, 0) AS concordant,
           coalesce(disc, 0) AS discordant,
           CASE WHEN n * (n - 1) - n1 > 0 AND n * (n - 1) - n2 > 0
                THEN round(2.0 * (coalesce(conc, 0) - coalesce(disc, 0))
                     / sqrt(CAST(n * (n - 1) - n1 AS DOUBLE)
                          * CAST(n * (n - 1) - n2 AS DOUBLE)), 6)
           END AS tau_b
    FROM tx JOIN ty ON ty.seg = tx.seg LEFT JOIN cd ON cd.seg = tx.seg
    """,
)
def q_kendall_exact(spark, sf_dir):
    """EXACT (unbinned) Kendall tau-b per segment on a hash-capped
    uniform sample — closing the one stated approximation in the
    stats family (r10 verdict task #4): q_kendall_tau bins price onto
    a bounded grid because exact continuous tau is pairwise-quadratic;
    this query runs the exact quadratic on a per-segment sample of
    {_KT_CAP} rows selected by the engine-portable md5 row hash (the
    q_kfold/stable_id_hash move — hash order is independent of the
    data values, so the kept set is a uniform deterministic subsample
    and both engines pick identical rows; ordering by a DATA column
    would truncate the distribution and bias tau). Quantity vs exact
    price CENTS within each l_returnflag segment.

    tau-b on a uniform subsample is the U-statistic estimator:
    unbiased in C−D, consistent, s.e. ~ O(1/cap) — the standard trade
    every distributed exact-tau makes (the q_theil_sen cap argument).
    The binned q_kendall_tau remains the streaming-maintainable
    full-data statistic; this is the exact-on-sample companion.

    Scale: the pair fan is the Theil-Sen cap pattern — a seg-equi
    self-join restricted to rn1 < rn2, at most cap(cap−1)/2 ≈ 1.1M
    pairs per segment, FIXED by the cap, never by row count; the
    row_number cap window is hash-partitioned by segment (no global
    sort). Counts are exact longs (≤ cap²); tau is one sqrt + one
    division, rounded 6dp. Degenerate segments emit tau_b NULL
    (the kendall_from_cells left-join contract)."""
    from ..operators.stats import kendall_exact_capped

    li = _t(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_returnflag").alias("seg"),
        F.col("l_quantity").cast("long").alias("x"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("y"),
        F.md5(
            F.concat_ws(
                "_",
                F.col("l_orderkey").cast("string"),
                F.col("l_linenumber").cast("string"),
            )
        ).alias("hk"),
        F.col("l_orderkey").alias("k1"),
        F.col("l_linenumber").alias("k2"),
    )
    return kendall_exact_capped(pts, _KT_CAP).select(
        F.col("seg").alias("returnflag"),
        "n", "concordant", "discordant", "tau_b",
    )


# --------------------------------------------------- Mann-Kendall trend


@query(
    "q_mann_kendall",
    oracle=f"""
    WITH cells AS (
        SELECT event_type AS seg,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS x,
               CAST(floor(value / 5) AS BIGINT) AS y,
               count(*) AS cnt
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2, 3
    ),
    cd AS (
        SELECT c1.seg,
               CAST(sum(CASE WHEN c1.y < c2.y
                    THEN CAST(c1.cnt AS HUGEINT) * c2.cnt ELSE 0 END)
                    AS HUGEINT) AS conc,
               CAST(sum(CASE WHEN c1.y > c2.y
                    THEN CAST(c1.cnt AS HUGEINT) * c2.cnt ELSE 0 END)
                    AS HUGEINT) AS disc
        FROM cells c1 JOIN cells c2
          ON c2.seg = c1.seg AND c1.x < c2.x
        GROUP BY 1
    ),
    mx AS (
        SELECT seg, CAST(sum(t) AS HUGEINT) AS n,
               CAST(sum(t * (t - 1) * (2 * t + 5)) AS HUGEINT) AS vx,
               CAST(sum(t * (t - 1) * (t - 2)) AS HUGEINT) AS a2x,
               CAST(sum(t * (t - 1)) AS HUGEINT) AS a3x
        FROM (SELECT seg, x, CAST(sum(cnt) AS HUGEINT) AS t
              FROM cells GROUP BY 1, 2)
        GROUP BY 1
    ),
    my AS (
        SELECT seg,
               CAST(sum(t * (t - 1) * (2 * t + 5)) AS HUGEINT) AS vy,
               CAST(sum(t * (t - 1) * (t - 2)) AS HUGEINT) AS a2y,
               CAST(sum(t * (t - 1)) AS HUGEINT) AS a3y
        FROM (SELECT seg, y, CAST(sum(cnt) AS HUGEINT) AS t
              FROM cells GROUP BY 1, 2)
        GROUP BY 1
    ),
    v AS (
        SELECT mx.seg, n,
               coalesce(conc, 0) - coalesce(disc, 0) AS s,
               CAST(n * (n - 1) * (2 * n + 5) - vx - vy AS DOUBLE) / 18.0
               + CAST(a2x AS DOUBLE) * CAST(a2y AS DOUBLE)
                 / (9.0 * CAST(n * (n - 1) * (n - 2) AS DOUBLE))
               + CAST(a3x AS DOUBLE) * CAST(a3y AS DOUBLE)
                 / (2.0 * CAST(n * (n - 1) AS DOUBLE)) AS var_s
        FROM mx JOIN my ON my.seg = mx.seg LEFT JOIN cd ON cd.seg = mx.seg
    ),
    zt AS (
        SELECT seg, n, s,
               CASE WHEN n >= 3 AND var_s > 0 THEN
                   round(CASE WHEN s > 0
                              THEN (CAST(s AS DOUBLE) - 1) / sqrt(var_s)
                              WHEN s < 0
                              THEN (CAST(s AS DOUBLE) + 1) / sqrt(var_s)
                              ELSE 0.0 END, 6)
               END AS z
        FROM v
    ),
    pt AS (
        SELECT seg, n, s, z,
               1.0 / (1.0 + 0.2316419 * abs(z)) AS tt,
               {_BH_INV_SQRT_2PI} * exp(-(abs(z) * abs(z)) / 2.0) AS pdf
        FROM zt
    ),
    pv AS (
        SELECT seg, n, s, z,
               round(2.0 * pdf * (tt * ({_BH_B[0]} + tt * ({_BH_B[1]}
                     + tt * ({_BH_B[2]} + tt * ({_BH_B[3]}
                     + tt * {_BH_B[4]}))))), 6) AS p_value
        FROM pt
    )
    SELECT seg AS event_type, CAST(n AS BIGINT) AS n,
           CAST(s AS BIGINT) AS s_stat, z, p_value,
           CASE WHEN z IS NULL THEN NULL
                WHEN p_value < 0.05 AND s > 0 THEN 'increasing'
                WHEN p_value < 0.05 AND s < 0 THEN 'decreasing'
                ELSE 'no trend' END AS trend
    FROM pv
    """,
)
def q_mann_kendall(spark, sf_dir):
    """Mann-Kendall trend test per event_type — the standard
    distribution-free "is this metric drifting?" monitor (the test
    every data-quality/ops pipeline runs on daily aggregates before
    alerting; Hirsch's seasonal variant is the water-quality
    workhorse). S = Σ_{t_i<t_j} sign(v_j − v_i) over (UTC day, 5-unit
    value bucket) cells — S is EXACTLY Kendall's C−D between time and
    value, so the pair algebra is the q_kendall_tau cell self-join;
    the tie-corrected variance uses BOTH margins' tie terms (time
    buckets tie heavily by construction), every A-term an exact
    HUGEINT/DECIMAL from the marginals; z is continuity-corrected and
    the two-sided p rides the house A&S 26.2.17 polynomial
    (`operators/stats.py:mann_kendall_from_cells`).

    Scale: ONE corpus scan into the additive cell grid (streaming-
    maintainable like the MW/KW/Spearman/Kendall grids); the pair fan
    is |days|·|value grid| squared per segment — bounded by the
    OBSERVATION WINDOW and the value range, never row volume (the
    binned-MK contract; production MK runs on bounded windows for the
    same reason)."""
    from ..operators.stats import mann_kendall_from_cells, mk_cells

    # three consumers of the cell relation (both pair sides + the two
    # marginals) — materialize once
    cells = mk_cells(_t(spark, sf_dir, "events")).localCheckpoint()
    return mann_kendall_from_cells(cells).select(
        F.col("seg").alias("event_type"),
        "n", "s_stat", "z", "p_value", "trend",
    )


# ------------------------------------------------------- Cliff's delta


@query(
    "q_cliffs_delta",
    oracle="""
    WITH e AS (
        SELECT event_type, user_id % 2 AS variant,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    g AS (
        SELECT event_type, cents,
               CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS na_c,
               CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS nb_c
        FROM e GROUP BY 1, 2
    ),
    r AS (
        SELECT event_type, cents, na_c, nb_c,
               coalesce(sum(nb_c) OVER (
                   PARTITION BY event_type ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS b_below
        FROM g
    ),
    tot AS (
        SELECT event_type, CAST(sum(na_c) AS BIGINT) AS n_a,
               CAST(sum(nb_c) AS BIGINT) AS n_b
        FROM g GROUP BY 1
    )
    SELECT r.event_type, n_a, n_b,
           CASE WHEN n_a > 0 AND n_b > 0 THEN
               round(CAST(sum(CAST(na_c AS HUGEINT)
                     * (b_below - (n_b - b_below - nb_c))) AS DOUBLE)
                     / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)
           END AS cliffs_delta
    FROM r JOIN tot ON tot.event_type = r.event_type
    GROUP BY r.event_type, n_a, n_b
    """,
)
def q_cliffs_delta(spark, sf_dir):
    """Cliff's delta dominance effect size per event_type — the
    MAGNITUDE companion to q_mann_whitney's significance (at large n
    a trivial shift is 'significant'; δ = P(a > b) − P(a < b) says
    whether it matters; |δ| < .147 is Romano's 'negligible' band).
    Same A/B split and exact cents grid as the MW family, and the
    SAME maintained relation: mw_grid's additive counts feed both.

    Entirely exact: Σ sign(a−b) = Σ_cells na_c·(B_below − B_above)
    over the bounded value grid (one cumulative window partitioned by
    segment — never a global sort), δ is ONE division of exact
    integers rounded 6dp. No float sums anywhere — the strongest
    determinism class in the stats family."""
    from ..operators.stats import cliffs_from_grid, mw_grid

    return cliffs_from_grid(mw_grid(_t(spark, sf_dir, "events")))


# ------------------------------------------------------- Kruskal-Wallis

_KW_GROUPS = 3  # user_id % 3 → k = 3 groups, df = 2: exact chi² tail


@query(
    "q_kruskal_wallis",
    oracle=f"""
    WITH e AS (
        SELECT event_type, user_id % {_KW_GROUPS} AS grp,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE value IS NOT NULL
    ),
    g AS (
        SELECT event_type, cents,
               CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS g0,
               CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS g1,
               CAST(sum(CASE WHEN grp = 2 THEN 1 ELSE 0 END) AS BIGINT) AS g2
        FROM e GROUP BY 1, 2
    ),
    r AS (
        SELECT *, g0 + g1 + g2 AS t,
               coalesce(sum(g0 + g1 + g2) OVER (
                   PARTITION BY event_type ORDER BY cents
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS cb
        FROM g
    ),
    s AS (
        SELECT event_type,
               CAST(sum(g0) AS BIGINT) AS n0,
               CAST(sum(g1) AS BIGINT) AS n1,
               CAST(sum(g2) AS BIGINT) AS n2,
               CAST(sum(CAST(g0 AS HUGEINT) * (2 * cb + t + 1)) AS HUGEINT)
                 AS r20,
               CAST(sum(CAST(g1 AS HUGEINT) * (2 * cb + t + 1)) AS HUGEINT)
                 AS r21,
               CAST(sum(CAST(g2 AS HUGEINT) * (2 * cb + t + 1)) AS HUGEINT)
                 AS r22,
               CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT) AS tie
        FROM r GROUP BY 1
    ),
    h AS (
        SELECT event_type, n0, n1, n2,
               CAST(n0 + n1 + n2 AS DOUBLE) AS nd,
               CAST(r20 * r20 AS DOUBLE) / (4.0 * CAST(n0 AS DOUBLE))
                 + CAST(r21 * r21 AS DOUBLE) / (4.0 * CAST(n1 AS DOUBLE))
                 + CAST(r22 * r22 AS DOUBLE) / (4.0 * CAST(n2 AS DOUBLE))
                 AS sumterm,
               CAST(tie AS DOUBLE) AS tied
        FROM s
        WHERE n0 > 0 AND n1 > 0 AND n2 > 0
    ),
    hh AS (
        SELECT event_type, n0, n1, n2,
               CASE WHEN (1.0 - tied / (nd * nd * nd - nd)) > 0
                    THEN round((12.0 * sumterm / (nd * (nd + 1.0))
                                - 3.0 * (nd + 1.0))
                               / (1.0 - tied / (nd * nd * nd - nd)), 6)
               END AS h_stat
        FROM h
    )
    SELECT event_type, n0, n1, n2, h_stat,
           round(exp(-h_stat / 2.0), 6) AS p_value
    FROM hh
    """,
)
def q_kruskal_wallis(spark, sf_dir):
    """Kruskal-Wallis H test with tie correction — the k-group
    extension of q_mann_whitney (one-way ANOVA on ranks; the
    nonparametric sibling of q_anova for skewed metrics). Three
    groups (user_id % 3) per event_type segment on the cents grid:
    H = [12/(N(N+1)) Σ_j R_j²/n_j − 3(N+1)] / (1 − Σ(t³−t)/(N³−N)).

    Determinism, the mw_from_grid playbook: midranks from per-(segment,
    cents) counts lifted to the integer 2R_j = Σ c_j(2·cum_before+t+1)
    grid (so R_j²/n_j = (2R_j)²/(4n_j)), rank sums / squares / tie term
    all exact HUGEINT/DECIMAL; H is a FIXED float op sequence over
    those exact integers — three division terms added in explicit
    j=0,1,2 order (column additions, never an aggregate over floats) —
    rounded 6dp. k = 3 is chosen deliberately: df = 2 makes the chi²
    tail EXACTLY exp(−H/2) — no incomplete-gamma approximation to
    disagree on; evaluated from the ROUNDED H on both engines (the
    normal_two_sided_p transcendental rule). Segments missing a group
    are dropped; all-tied segments yield NULL H/p.

    Scale: identical shape to q_mann_whitney — one hash aggregate to
    the value grid (bounded by the grid, not rows), a window
    partitioned by segment over that grid, then one row per segment.
    The grid counts are additive, so the same relation streams via
    the generic fold factory (test_streaming_kruskal_wallis_equals_
    batch pins streamed ≡ batch bit-identically).
    """
    from ..operators.stats import kw3_from_grid, kw3_grid

    return kw3_from_grid(kw3_grid(_t(spark, sf_dir, "events")))


# ----------------------------------------------------- permutation test

_PERM_N = 19  # permutations beside the observed labeling → p-grid 1/20


@query(
    "q_permutation_test",
    oracle=f"""
    WITH ua AS (
        SELECT event_type, user_id,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                 AS sc,
               count(*) AS nr
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    perms AS (SELECT unnest(range(0, {_PERM_N} + 1)) AS p),
    lab AS (
        SELECT ua.*, p,
               CASE WHEN p = 0 THEN user_id % 2
                    ELSE ('0x' || substring(md5(CAST(user_id AS VARCHAR)
                              || ':' || CAST(p AS VARCHAR)), 1, 8))::BIGINT % 2
               END AS variant
        FROM ua CROSS JOIN perms
    ),
    d AS (
        SELECT event_type, p,
               CAST(sum(CASE WHEN variant = 0 THEN sc ELSE 0 END) AS BIGINT)
                 AS sa,
               CAST(sum(CASE WHEN variant = 0 THEN nr ELSE 0 END) AS BIGINT)
                 AS ca,
               CAST(sum(CASE WHEN variant = 1 THEN sc ELSE 0 END) AS BIGINT)
                 AS sb,
               CAST(sum(CASE WHEN variant = 1 THEN nr ELSE 0 END) AS BIGINT)
                 AS cb
        FROM lab GROUP BY 1, 2
    ),
    diffs AS (
        SELECT event_type, p, ca, cb,
               CASE WHEN ca > 0 AND cb > 0
                    THEN CAST(sa AS DOUBLE) / CAST(ca AS DOUBLE)
                         - CAST(sb AS DOUBLE) / CAST(cb AS DOUBLE)
               END AS diff
        FROM d
    ),
    obs AS (
        SELECT event_type, ca AS n_a, cb AS n_b, diff AS obs_diff
        FROM diffs WHERE p = 0
    )
    SELECT o.event_type, o.n_a, o.n_b,
           round(o.obs_diff / 100.0, 6) AS obs_diff,
           round((1.0 + CAST(sum(CASE WHEN abs(x.diff) >= abs(o.obs_diff)
                                      THEN 1 ELSE 0 END) AS DOUBLE))
                 / (1.0 + {_PERM_N}), 6) AS p_value
    FROM obs o JOIN diffs x
      ON x.event_type = o.event_type AND x.p >= 1
    GROUP BY 1, 2, 3, 4
    """,
)
def q_permutation_test(spark, sf_dir):
    """Permutation test on the variant mean difference — the
    assumption-free inference path beside q_ab_test (t), q_mann_whitney
    (ranks): relabel experiment units, recompute the statistic, and
    read the p-value off the permutation distribution (Fisher 1935;
    the add-one form p = (1+#{|d_p| ≥ |d_obs|})/(1+P) of Phipson &
    Smyth 2010). Unit = USER (the randomization unit — rows of one
    user never split across variants), 19 relabelings + the observed.

    Determinism without randomness: relabeling p assigns variant =
    first-32-md5-bits(user:p) mod 2 — the q_kfold seeded-hash move, so
    every engine, partitioning, and retry derives the SAME label
    matrix. Per-(segment, permutation) sums are exact cents integers;
    each mean is ONE division, the difference a fixed float op; the
    |d_p| ≥ |d_obs| comparisons run on bit-identical doubles, and the
    p-value is a count on the exact 1/20 grid. Output means rescale
    cents → original units (ONE more division by 100, rounded 6dp).

    Scale: the fact table reduces ONCE to the (segment, user) relation
    (hash aggregate, additive, streamable); the ×20 permutation fan
    rides that small relation, never the raw events — at 100 TB the
    explode is |users|·P rows, not |rows|·P. The label needs no
    shuffle (it's a projection), and the final aggregate is one row
    per (segment, permutation). This is why permutation tests — naive
    cost P × the data — are FREE at scale when the statistic is a
    per-unit-additive mean.
    """
    from ..operators.stats import permutation_mean_diff

    ua = (
        _t(spark, sf_dir, "events")
        .filter(F.col("value").isNotNull())
        .select(
            "event_type",
            "user_id",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("event_type", "user_id")
        .agg(F.sum("cents").alias("sc"), F.count(F.lit(1)).alias("nr"))
    )
    return permutation_mean_diff(ua, _PERM_N)


# --------------------------------- paired-rater agreement statistics

# Two deterministic "annotators" over documents — integer-exact rules
# both engines state identically: A = char-length gate, B = word-count
# gate (text is single-space tokenized, so words = spaces + 1). The
# pair (A, B) per doc_id is the paired-binary shape McNemar and kappa
# are defined on.
_RATER_A_SQL = "(n_chars >= 200)"
_RATER_B_SQL = "((length(text) - length(replace(text, ' ', '')) + 1) >= 30)"


@query(
    "q_mcnemar",
    oracle=f"""
    WITH pairs AS (
        SELECT lang,
               CASE WHEN {_RATER_A_SQL} THEN 1 ELSE 0 END AS a,
               CASE WHEN {_RATER_B_SQL} THEN 1 ELSE 0 END AS b
        FROM documents
    ),
    cnt AS (
        SELECT lang,
               CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS b_only,
               CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS c_only,
               count(*) AS n_docs
        FROM pairs GROUP BY lang
    ),
    z AS (
        SELECT lang, n_docs, b_only, c_only,
               CASE WHEN b_only + c_only > 0 THEN
                   round(CAST(abs(b_only - c_only) - 1 AS DOUBLE)
                         / sqrt(CAST(b_only + c_only AS DOUBLE)), 6)
               END AS z_score
        FROM cnt
    ),
    p AS (
        SELECT *,
               1.0 / (1.0 + 0.2316419 * abs(z_score)) AS tt,
               {_BH_INV_SQRT_2PI}
                   * exp(-(abs(z_score) * abs(z_score)) / 2.0) AS pdf
        FROM z
    )
    SELECT lang, n_docs, b_only, c_only, z_score,
           round(2.0 * pdf * (tt * ({_BH_B[0]} + tt * ({_BH_B[1]}
                 + tt * ({_BH_B[2]} + tt * ({_BH_B[3]}
                 + tt * {_BH_B[4]}))))), 6) AS p_value
    FROM p
    """,
)
def q_mcnemar(spark, sf_dir):
    """McNemar's test for PAIRED binary raters — the question neither
    q_chi2_independence (unpaired independence) nor q_ab_test
    (unpaired means) answers: do two judgments of the SAME documents
    disagree symmetrically? The curation use: a new quality filter
    replaces an old one; McNemar on the discordant pairs (b = A-only
    passes, c = B-only passes) says whether the swap systematically
    admits more/fewer docs, per language segment. Continuity-corrected
    z = (|b−c|−1)/sqrt(b+c) (χ²₁ = z², so the χ² p IS the two-sided
    normal tail); b+c = 0 → NULL z/p (no discordance, no test).

    Scale shape: one hash aggregate of integer conditional counts per
    lang — the q_cond_agg plan; the test arithmetic runs on the
    |langs|-row result. The concordant cells never need counting, so
    the aggregate carries two CASE sums, not a 2×2 materialization.
    Cross-engine: b, c exact BIGINT; z rounded 6dp before the house
    A&S 26.2.17 polynomial (operators/stats.py coefficients
    interpolated into the oracle), p rounded 6dp."""
    from ..operators.stats import normal_two_sided_p

    docs = _t(spark, sf_dir, "documents")
    a = (F.col("n_chars") >= 200).cast("int")
    b = (
        F.length("text") - F.length(F.translate("text", " ", "")) + 1 >= 30
    ).cast("int")
    cnt = (
        docs.select("lang", a.alias("a"), b.alias("b"))
        .groupBy("lang")
        .agg(
            F.sum(F.when((F.col("a") == 1) & (F.col("b") == 0), 1).otherwise(0))
            .cast("long")
            .alias("b_only"),
            F.sum(F.when((F.col("a") == 0) & (F.col("b") == 1), 1).otherwise(0))
            .cast("long")
            .alias("c_only"),
            F.count(F.lit(1)).alias("n_docs"),
        )
    )
    disc = F.col("b_only") + F.col("c_only")
    z = F.when(
        disc > 0,
        F.round(
            (F.abs(F.col("b_only") - F.col("c_only")) - 1).cast("double")
            / F.sqrt(disc.cast("double")),
            6,
        ),
    )
    return cnt.select(
        "lang", "n_docs", "b_only", "c_only", z.alias("z_score")
    ).withColumn("p_value", normal_two_sided_p(F.col("z_score")))


@query(
    "q_cohens_kappa",
    oracle=f"""
    WITH pairs AS (
        SELECT source,
               CASE WHEN {_RATER_A_SQL} THEN 1 ELSE 0 END AS a,
               CASE WHEN {_RATER_B_SQL} THEN 1 ELSE 0 END AS b
        FROM documents
    ),
    cnt AS (
        SELECT source,
               count(*) AS n_docs,
               CAST(sum(CASE WHEN a = 1 AND b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n11,
               CAST(sum(CASE WHEN a = 1 AND b = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n10,
               CAST(sum(CASE WHEN a = 0 AND b = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n01,
               CAST(sum(CASE WHEN a = 0 AND b = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS n00
        FROM pairs GROUP BY source
    )
    SELECT source, n_docs, n11, n10, n01, n00,
           round(CAST((n11 + n00) AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
               AS p_observed,
           round(CAST(CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                      + CAST(n01 + n00 AS HUGEINT) * (n10 + n00) AS DOUBLE)
                 / CAST(CAST(n_docs AS HUGEINT) * n_docs AS DOUBLE), 6)
               AS p_expected,
           CASE WHEN CAST(n_docs AS HUGEINT) * n_docs
                     - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                        + CAST(n01 + n00 AS HUGEINT) * (n10 + n00)) <> 0
                THEN
           round(CAST(CAST(n11 + n00 AS HUGEINT) * n_docs
                      - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                         + CAST(n01 + n00 AS HUGEINT) * (n10 + n00))
                      AS DOUBLE)
                 / CAST(CAST(n_docs AS HUGEINT) * n_docs
                        - (CAST(n11 + n10 AS HUGEINT) * (n11 + n01)
                           + CAST(n01 + n00 AS HUGEINT) * (n10 + n00))
                        AS DOUBLE), 6)
           END AS kappa
    FROM cnt
    """,
)
def q_cohens_kappa(spark, sf_dir):
    """Cohen's kappa — chance-corrected agreement between the same two
    paired raters, per source: κ = (p_o − p_e)/(1 − p_e). The curation
    use: how much does a cheap heuristic filter actually AGREE with
    the filter it approximates, beyond what marginal pass rates force?
    (McNemar asks about asymmetric disagreement; kappa scores the
    agreement itself — the two complete the paired-rater toolkit.)

    Algebra cleared to exact integers before the one division:
    κ = (p_o·n² − p_e·n²)/(n² − p_e·n²) with p_o·n² = (n11+n00)·n and
    p_e·n² = (n11+n10)(n11+n01) + (n01+n00)(n10+n00) — every term an
    exact product of BIGINT counts (decimal(38,0) / HUGEINT), so both
    engines divide the identical integers; result rounded 6dp.
    Degenerate p_e = 1 (both raters constant) → NULL kappa.

    Scale shape: one hash aggregate of four conditional counts per
    source — nothing downstream ever exceeds |sources| rows."""
    dec = "decimal(38,0)"
    docs = _t(spark, sf_dir, "documents")
    a = (F.col("n_chars") >= 200).cast("int")
    b = (
        F.length("text") - F.length(F.translate("text", " ", "")) + 1 >= 30
    ).cast("int")
    cnt = (
        docs.select("source", a.alias("a"), b.alias("b"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            *[
                F.sum(
                    F.when((F.col("a") == ai) & (F.col("b") == bi), 1).otherwise(0)
                )
                .cast("long")
                .alias(f"n{ai}{bi}")
                for ai, bi in ((1, 1), (1, 0), (0, 1), (0, 0))
            ],
        )
    )
    n = F.col("n_docs").cast(dec)
    pe_num = (F.col("n11") + F.col("n10")).cast(dec) * (
        F.col("n11") + F.col("n01")
    ).cast(dec) + (F.col("n01") + F.col("n00")).cast(dec) * (
        F.col("n10") + F.col("n00")
    ).cast(dec)
    po_num = (F.col("n11") + F.col("n00")).cast(dec) * n
    denom = n * n - pe_num
    return cnt.select(
        "source", "n_docs", "n11", "n10", "n01", "n00",
        F.round(
            (F.col("n11") + F.col("n00")).cast("double")
            / F.col("n_docs").cast("double"),
            6,
        ).alias("p_observed"),
        F.round(pe_num.cast("double") / (n * n).cast("double"), 6).alias(
            "p_expected"
        ),
        F.when(
            denom != F.lit(0).cast(dec),
            F.round((po_num - pe_num).cast("double") / denom.cast("double"), 6),
        ).alias("kappa"),
    )


# Third deterministic rater for the k=3 Cochran family: mean word
# length >= 5, stated integer-exactly as chars-without-spaces >= 5 *
# words (no division ever happens).
_RATER_C_SQL = (
    "(length(replace(text, ' ', '')) >= "
    "5 * (length(text) - length(replace(text, ' ', '')) + 1))"
)


@query(
    "q_cochran_q",
    oracle=f"""
    WITH flags AS (
        SELECT lang,
               CASE WHEN {_RATER_A_SQL} THEN 1 ELSE 0 END AS a,
               CASE WHEN {_RATER_B_SQL} THEN 1 ELSE 0 END AS b,
               CASE WHEN {_RATER_C_SQL} THEN 1 ELSE 0 END AS c
        FROM documents
    ),
    agg AS (
        SELECT lang,
               count(*) AS n_docs,
               CAST(sum(a) AS BIGINT) AS c1,
               CAST(sum(b) AS BIGINT) AS c2,
               CAST(sum(c) AS BIGINT) AS c3,
               CAST(sum((a + b + c) * (a + b + c)) AS BIGINT) AS sum_r2
        FROM flags GROUP BY lang
    ),
    q AS (
        SELECT lang, n_docs, c1, c2, c3,
               CASE WHEN 3 * (c1 + c2 + c3) - sum_r2 > 0 THEN
                   round(CAST(2 * (3 * (CAST(c1 AS HUGEINT) * c1
                                        + CAST(c2 AS HUGEINT) * c2
                                        + CAST(c3 AS HUGEINT) * c3)
                              - CAST(c1 + c2 + c3 AS HUGEINT)
                                * (c1 + c2 + c3)) AS DOUBLE)
                         / CAST(3 * (c1 + c2 + c3) - sum_r2 AS DOUBLE), 6)
               END AS q_stat
        FROM agg
    )
    SELECT lang, n_docs, c1, c2, c3, q_stat,
           round(exp(-q_stat / 2.0), 6) AS p_value
    FROM q
    """,
)
def q_cochran_q(spark, sf_dir):
    """Cochran's Q — the k-rater generalization of q_mcnemar: do k=3
    paired binary judgments of the SAME documents pass at equal rates?
    The curation use: three candidate quality gates (char-length,
    word-count, mean-word-length) scored on one corpus; Q rejects
    "the gates are interchangeable" before any pairwise McNemar
    drill-down. Q = (k−1)·(k·Σc_j² − S²)/(k·S − ΣR_i²) with S = Σc_j —
    EVERY term an exact integer (c_j = per-rule pass counts, R_i =
    per-doc pass count, so ΣR_i = S and ΣR_i² is one conditional sum);
    k·S = ΣR_i² iff every doc passes 0 or all 3 rules (no
    discrimination) → NULL. dof = k−1 = 2, where the χ² survival
    function is EXACTLY exp(−Q/2) — one transcendental from a
    6dp-rounded Q, rounded 6dp (the house exp() discipline).

    Scale shape: identical to q_mcnemar — one hash aggregate of five
    integer conditional sums per lang; nothing downstream exceeds
    |langs| rows."""
    docs = _t(spark, sf_dir, "documents")
    words = F.length("text") - F.length(F.translate("text", " ", "")) + 1
    a = (F.col("n_chars") >= 200).cast("int")
    b = (words >= 30).cast("int")
    c = (F.length(F.translate("text", " ", "")) >= 5 * words).cast("int")
    r = F.col("a") + F.col("b") + F.col("c")
    agg = (
        docs.select("lang", a.alias("a"), b.alias("b"), c.alias("c"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("a").cast("long").alias("c1"),
            F.sum("b").cast("long").alias("c2"),
            F.sum("c").cast("long").alias("c3"),
            F.sum(r * r).cast("long").alias("sum_r2"),
        )
    )
    dec = "decimal(38,0)"
    s = (F.col("c1") + F.col("c2") + F.col("c3")).cast(dec)
    sum_sq = (
        F.col("c1").cast(dec) * F.col("c1").cast(dec)
        + F.col("c2").cast(dec) * F.col("c2").cast(dec)
        + F.col("c3").cast(dec) * F.col("c3").cast(dec)
    )
    denom = F.lit(3).cast(dec) * s - F.col("sum_r2").cast(dec)
    q_stat = F.when(
        denom > F.lit(0).cast(dec),
        F.round(
            (F.lit(2).cast(dec) * (F.lit(3).cast(dec) * sum_sq - s * s))
            .cast("double")
            / denom.cast("double"),
            6,
        ),
    )
    return agg.select(
        "lang", "n_docs", "c1", "c2", "c3", q_stat.alias("q_stat")
    ).withColumn("p_value", F.round(F.exp(-F.col("q_stat") / F.lit(2.0)), 6))


@query(
    "q_friedman",
    oracle="""
    WITH obs AS (
        SELECT user_id % 2 AS seg,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               event_type,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2, 3
    ),
    full_blocks AS (
        SELECT * FROM (
            SELECT *, count(*) OVER (PARTITION BY seg, day) AS k_in_day
            FROM obs
        ) WHERE k_in_day = 5
    ),
    ranked AS (
        SELECT seg, day, event_type,
               2 * (rank() OVER (PARTITION BY seg, day ORDER BY cents) - 1)
               + count(*) OVER (PARTITION BY seg, day, cents) + 1 AS s
        FROM full_blocks
    ),
    per_type AS (
        SELECT seg, event_type,
               count(*) AS n_days,
               CAST(sum(s) AS BIGINT) AS s_j,
               CAST(sum(CAST(s AS HUGEINT) * s) AS HUGEINT) AS s2_j
        FROM ranked GROUP BY 1, 2
    ),
    agg AS (
        SELECT seg,
               max(n_days) AS n_days,
               CAST(sum(CAST(s_j - 6 * n_days AS HUGEINT)
                        * (s_j - 6 * n_days)) AS HUGEINT) AS num4,
               CAST(sum(s2_j) - max(n_days) * 180 AS HUGEINT) AS denom4
        FROM per_type GROUP BY 1
    ),
    q AS (
        SELECT seg, n_days,
               CASE WHEN denom4 > 0 THEN
                   round(4.0 * CAST(num4 AS DOUBLE)
                         / CAST(denom4 AS DOUBLE), 6)
               END AS q_stat
        FROM agg
    )
    SELECT seg, n_days, q_stat,
           round(exp(-q_stat / 2.0) * (1.0 + q_stat / 2.0), 6) AS p_value
    FROM q
    """,
)
def q_friedman(spark, sf_dir):
    """Friedman test — the BLOCKED nonparametric k-sample test that
    completes the rank family: q_mann_whitney (2 unpaired groups) →
    q_kruskal_wallis (k unpaired) → Friedman (k treatments ranked
    WITHIN matched blocks). Blocks = UTC epoch days, treatments = the
    corpus's 5 event types, observation = the exact cents revenue sum
    per (day, type); one test per user_id % 2 variant. Ranking within
    a block removes day-level level shifts the unpaired tests
    confound — the drift question "do the five event streams keep
    their relative ordering day over day?".

    Determinism: observations are exact BIGINT cents sums; midranks
    carried as the INTEGER s = 2·rank − 1 = 2·(#less) + (#equal) + 1
    (so every rank sum / square is exact), and the tie-corrected
    statistic is cleared to integers by scaling 4: with S_j = Σ_d s,
    Q = (k−1)·Σ_j(S_j − n(k+1))² / (Σ s² − nk(k+1)²) — numerator and
    denominator exact HUGEINT/DECIMAL, one double division, rounded
    6dp. k = 5 → dof 4, where the χ² survival has the CLOSED FORM
    exp(−Q/2)(1 + Q/2) — no incomplete gamma to disagree on (the
    q_kruskal_wallis dof-2 trick, one even-dof step up). Days missing
    a treatment are excluded (incomplete block); denom 0 (everything
    tied in every block) → NULL.

    Scale shape: one hash aggregate to the (seg, day, type) grid —
    bounded by 2·days·5, not rows — then windows PARTITIONED BY
    (seg, day) over ≤5-row blocks (fully parallel, no global sort),
    then two tiny aggregates. The grid is additive, so a stream
    maintains it via merge_aggregate like the sibling grids."""
    ev = _t(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    obs = (
        ev.select(
            (F.col("user_id") % 2).alias("seg"),
            F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
            "event_type",
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("seg", "day", "event_type")
        .agg(F.sum("cents").alias("cents"))
    )
    k_in_day = F.count(F.lit(1)).over(
        Window.partitionBy("seg", "day")
    )
    full = obs.withColumn("k_in_day", k_in_day).filter(F.col("k_in_day") == 5)
    s = (
        2 * (F.rank().over(Window.partitionBy("seg", "day").orderBy("cents")) - 1)
        + F.count(F.lit(1)).over(Window.partitionBy("seg", "day", "cents"))
        + 1
    )
    ranked = full.select("seg", "day", "event_type", s.alias("s"))
    dec = "decimal(38,0)"
    per_type = ranked.groupBy("seg", "event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("s").cast("long").alias("s_j"),
        F.sum(F.col("s").cast(dec) * F.col("s").cast(dec)).alias("s2_j"),
    )
    dev = (F.col("s_j") - 6 * F.col("n_days")).cast(dec)
    agg = per_type.groupBy("seg").agg(
        F.max("n_days").alias("n_days"),
        F.sum(dev * dev).alias("num4"),
        (F.sum("s2_j") - F.max("n_days").cast(dec) * 180).alias("denom4"),
    )
    q_stat = F.when(
        F.col("denom4") > F.lit(0).cast(dec),
        F.round(
            F.lit(4.0) * F.col("num4").cast("double")
            / F.col("denom4").cast("double"),
            6,
        ),
    )
    return agg.select("seg", "n_days", q_stat.alias("q_stat")).withColumn(
        "p_value",
        F.round(
            F.exp(-F.col("q_stat") / F.lit(2.0))
            * (F.lit(1.0) + F.col("q_stat") / F.lit(2.0)),
            6,
        ),
    )
