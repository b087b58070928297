"""Time-series smoothing / monitoring queries over `events`.

EWMA is the classic order-dependent recursion that looks SQL-hostile;
the portable form here truncates it to a bounded trailing window and
evaluates the recursion as a LEFT-TO-RIGHT FOLD over the windowed
value list — the same fold (`F.aggregate` / DuckDB `list_reduce`,
first element as seed) on both engines, so results are bit-identical
and oracle-checkable. Reference tie-in: the tracker's confidence
smoothing (tracking.py:896-911) is the same exponential-decay shape.
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table, scatter
from .registry import query

_ALPHA = 0.2
_WIN = 10  # trailing rows (9 preceding + current)


@query(
    "q_ewma",
    oracle=f"""
    WITH w AS (
        SELECT event_id, user_id, value,
               list(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS BETWEEN {_WIN - 1} PRECEDING AND CURRENT ROW)
                   AS vals
        FROM events
    )
    SELECT event_id, user_id,
           round(list_reduce(vals,
                 (acc, x) -> acc * {1 - _ALPHA} + x * {_ALPHA}), 6) AS ewma
    FROM w
    """,
)
def q_ewma(spark, sf_dir):
    """Trailing-window EWMA per user: y = fold(y·(1−α) + α·x) over the
    last 10 values in (ts, event_id) order, seeded with the oldest
    value in the window (DuckDB `list_reduce` semantics, mirrored with
    an explicit seed + slice on the Spark side).

    Scale: one window pass partitioned by user_id — the same shuffle a
    sessionization already pays; the fold is a 10-element array
    expression inside codegen, no UDF. Unbounded EWMA would need
    `(1−α)^n` power chains that underflow differently per engine —
    bounding the window is what makes the op portable AND constant-
    memory per row.
    """
    ev = scatter(load_table(spark, sf_dir, "events"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(_WIN - 1), 0)
    )
    vals = F.collect_list("value").over(w)
    ewma = F.aggregate(
        F.slice(vals, 2, _WIN - 1),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(1 - _ALPHA) + x * F.lit(_ALPHA),
    )
    return ev.select(
        "event_id", "user_id", F.round(ewma, 6).alias("ewma")
    )


_Z_WIN = 20  # trailing baseline rows (excludes the current row)
_Z_MIN = 5  # minimum baseline size before a z-score is meaningful
_Z_THRESH = 3.0


@query(
    "q_zscore_anomaly",
    oracle=f"""
    WITH w AS (
        SELECT event_id, user_id, value,
               avg(value) OVER win AS mu,
               stddev_samp(value) OVER win AS sigma,
               count(*) OVER win AS n
        FROM events
        WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN {_Z_WIN} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, round((value - mu) / sigma, 6) AS zscore
    FROM w
    WHERE n >= {_Z_MIN} AND sigma > 0
      AND abs((value - mu) / sigma) > {_Z_THRESH}
    """,
)
def q_zscore_anomaly(spark: SparkSession, sf_dir: str):
    """Trailing-window z-score anomaly detection per user: flag events
    whose value is > 3σ from the mean of the PRECEDING 20 events (the
    current row is excluded from its own baseline — self-inclusion
    shrinks the z-score of the very outliers being hunted).

    The monitoring companion to q_ewma: one window pass partitioned by
    user_id, ROWS-bounded so state per row is constant; avg/stddev are
    native JVM window aggregates. At 100 TB this is the same single
    shuffle as any per-user sessionization; no self-join against a
    baseline table, because the window IS the baseline.
    """
    ev = scatter(load_table(spark, sf_dir, "events"))
    win = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-_Z_WIN, -1)
    )
    z = (F.col("value") - F.avg("value").over(win)) / F.stddev_samp("value").over(win)
    return (
        ev.select(
            "event_id",
            "user_id",
            "value",
            F.stddev_samp("value").over(win).alias("sigma"),
            F.count(F.lit(1)).over(win).alias("n"),
            z.alias("z"),
        )
        .filter(
            (F.col("n") >= _Z_MIN)
            & (F.col("sigma") > 0)
            & (F.abs("z") > _Z_THRESH)
        )
        .select("event_id", "user_id", F.round("z", 6).alias("zscore"))
    )


@query(
    "q_winsorize",
    oracle="""
    WITH b AS (
        SELECT event_type,
               quantile_cont(value, 0.05) AS p05,
               quantile_cont(value, 0.25) AS p25,
               quantile_cont(value, 0.50) AS p50,
               quantile_cont(value, 0.75) AS p75,
               quantile_cont(value, 0.95) AS p95
        FROM events GROUP BY event_type
    )
    SELECT e.event_id,
           e.event_type,
           round(least(greatest(e.value, b.p05), b.p95), 6) AS winsorized,
           round((e.value - b.p50) / nullif(b.p75 - b.p25, 0), 6) AS robust_z
    FROM events e JOIN b USING (event_type)
    """,
)
def q_winsorize(spark, sf_dir):
    """Winsorization + robust scaling per event_type: clamp values into
    the group's [p05, p95] band and standardize by the IQR around the
    median — the outlier-proof feature-engineering transform (heavy
    tails never touch the scale the model sees).

    Two-pass shape like q_global_norm: pass 1 reduces each group to one
    5-quantile row, pass 2 joins those few rows back BROADCAST — so the
    100 TB fact table is never shuffled at all; the only wide operation
    is the percentile aggregate itself (swap `percentile` for the
    mergeable `percentile_approx` t-digest at scale, same plan shape).
    """
    ev = scatter(load_table(spark, sf_dir, "events"))
    bounds = ev.groupBy("event_type").agg(
        *[
            F.expr(f"percentile(value, {q})").alias(f"p{int(q * 100):02d}")
            for q in (0.05, 0.25, 0.50, 0.75, 0.95)
        ]
    )
    iqr = F.col("p75") - F.col("p25")
    return ev.join(F.broadcast(bounds), "event_type").select(
        "event_id",
        "event_type",
        F.round(F.least(F.greatest("value", F.col("p05")), F.col("p95")), 6).alias(
            "winsorized"
        ),
        F.round(
            (F.col("value") - F.col("p50"))
            / F.when(iqr != 0, iqr).otherwise(F.lit(None)),
            6,
        ).alias("robust_z"),
    )


_SEAS_SIGMA = 3.0
_SEAS_MIN_N = 10


@query(
    "q_seasonal_anomaly",
    oracle=f"""
    WITH base AS (
        SELECT event_type, CAST(hour(ts) AS BIGINT) AS hod,
               avg(value) AS mu, stddev_samp(value) AS sigma,
               count(*) AS n
        FROM events GROUP BY event_type, hour(ts)
    )
    SELECT e.event_id, e.event_type,
           CAST(hour(e.ts) AS BIGINT) AS hod,
           round((e.value - b.mu) / b.sigma, 6) AS seasonal_z
    FROM events e
    JOIN base b ON b.event_type = e.event_type
               AND b.hod = CAST(hour(e.ts) AS BIGINT)
    WHERE b.n >= {_SEAS_MIN_N} AND b.sigma > 0
      AND abs((e.value - b.mu) / b.sigma) > {_SEAS_SIGMA}
    """,
)
def q_seasonal_anomaly(spark, sf_dir):
    """Seasonal-baseline anomaly detection: each event is scored
    against its (event_type, hour-of-day) population — the calendar
    companion to q_zscore_anomaly's trailing baseline (a value normal
    at 14:00 can be a 3σ outlier at 03:00).

    Same two-pass shape as q_winsorize: the baseline reduces to
    |event_types|×24 rows and joins back BROADCAST, so the fact table
    is never shuffled; the seasonal key is derivable from the
    partition column at scan time, so at 100 TB the baseline pass
    prunes to the partitions being scored.
    """
    ev = scatter(load_table(spark, sf_dir, "events"))
    hod = F.hour("ts").cast("long")
    base = ev.groupBy(F.col("event_type"), hod.alias("hod")).agg(
        F.avg("value").alias("mu"),
        F.stddev_samp("value").alias("sigma"),
        F.count(F.lit(1)).alias("n"),
    )
    z = (F.col("value") - F.col("mu")) / F.col("sigma")
    return (
        ev.select("event_id", "event_type", hod.alias("hod"), "value")
        .join(F.broadcast(base), ["event_type", "hod"])
        .filter(
            (F.col("n") >= _SEAS_MIN_N)
            & (F.col("sigma") > 0)
            & (F.abs(z) > _SEAS_SIGMA)
        )
        .select("event_id", "event_type", "hod", F.round(z, 6).alias("seasonal_z"))
    )


_MAD_K = 5.0


@query(
    "q_mad_outliers",
    oracle=f"""
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_id, e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m USING (event_type)
    ),
    mad AS (
        SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_id, d.event_type,
           round((d.value - d.med) / nullif(m.mad, 0), 6) AS mad_score
    FROM dev d JOIN mad m USING (event_type)
    WHERE m.mad > 0 AND abs(d.value - d.med) > {_MAD_K} * m.mad
    """,
)
def q_mad_outliers(spark, sf_dir):
    """Median-absolute-deviation outliers per event_type: flag events
    with |x − median| > 5·MAD — the robust-statistics anomaly detector
    (immune to the outliers it hunts, unlike the mean/σ of
    q_zscore_anomaly; the third member of the robust family with
    q_winsorize).

    Two reduce-then-broadcast passes (median, then MAD), each shrinking
    a group to one row before joining back — the fact table never
    shuffles. `percentile` is the exact aggregate; at 100 TB swap for
    the mergeable `percentile_approx` t-digest, same plan shape.
    """
    ev = scatter(load_table(spark, sf_dir, "events"))
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.expr("percentile(adev, 0.5)").alias("mad")
    )
    score = (F.col("value") - F.col("med")) / F.when(
        F.col("mad") != 0, F.col("mad")
    ).otherwise(F.lit(None))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.col("adev") > _MAD_K * F.col("mad")))
        .select("event_id", "event_type", F.round(score, 6).alias("mad_score"))
    )


@query(
    "q_hourly_percentiles",
    oracle="""
    SELECT event_type,
           date_trunc('hour', ts) AS hour_start,
           count(*) AS n,
           round(quantile_cont(value, 0.50), 4) AS p50,
           round(quantile_cont(value, 0.95), 4) AS p95,
           round(quantile_cont(value, 0.99), 4) AS p99
    FROM events
    GROUP BY event_type, date_trunc('hour', ts)
    """,
)
def q_hourly_percentiles(spark, sf_dir):
    """SLA-style percentile monitoring: p50/p95/p99 of `value` per
    event_type per tumbling hour — the latency-dashboard shape every
    operations pipeline materializes. One grouped aggregate; the
    (event_type × hour) key space grows with time, not with volume, so
    partial aggregation collapses the fact rows map-side. At 100 TB
    swap `percentile` for the mergeable `percentile_approx` t-digest
    and the same plan maintains incrementally per micro-batch
    (streaming/materialized.py's merge pattern)."""
    ev = scatter(load_table(spark, sf_dir, "events"))
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.round(F.expr(f"percentile(value, {q})"), 4).alias(f"p{int(q * 100)}")
            for q in (0.50, 0.95, 0.99)
        ],
    )


@query(
    "q_ohlc",
    oracle="""
    WITH b AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_start,
               value, ts, event_id
        FROM events
    ),
    agg AS (
        SELECT event_type, hour_start,
               count(*) AS n,
               round(min(value), 2) AS low,
               round(max(value), 2) AS high
        FROM b GROUP BY event_type, hour_start
    ),
    rk AS (
        SELECT event_type, hour_start, value,
               row_number() OVER (PARTITION BY event_type, hour_start
                                  ORDER BY ts, event_id) AS ra,
               row_number() OVER (PARTITION BY event_type, hour_start
                                  ORDER BY ts DESC, event_id DESC) AS rd
        FROM b
    )
    SELECT a.event_type, a.hour_start, a.n,
           round(op.value, 2) AS open, a.high, a.low,
           round(cl.value, 2) AS close
    FROM agg a
    JOIN rk op ON op.event_type = a.event_type
              AND op.hour_start = a.hour_start AND op.ra = 1
    JOIN rk cl ON cl.event_type = a.event_type
              AND cl.hour_start = a.hour_start AND cl.rd = 1
    """,
)
def q_ohlc(spark, sf_dir):
    """OHLC resampling: open/high/low/close of `value` per event_type
    per tumbling hour — the candlestick/time-bucket downsample every
    metrics store materializes. Open/close are `min_by`/`max_by` over
    the (ts, event_id) struct order (deterministic tie-break), so the
    whole bar computes in ONE map-side-combining hash aggregate — no
    window, no sort, the shape that turns a 100 TB tick stream into a
    bounded (type × hour) bar relation in a single pass. The DuckDB
    oracle derives the same endpoints via rank windows — different
    mechanism, provably the same rows."""
    ev = scatter(load_table(spark, sf_dir, "events"))
    key = F.struct("ts", "event_id")
    return ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min_by("value", key), 2).alias("open"),
        F.round(F.max("value"), 2).alias("high"),
        F.round(F.min("value"), 2).alias("low"),
        F.round(F.max_by("value", key), 2).alias("close"),
    )


@query(
    "q_cusum",
    oracle="""
    WITH RECURSIVE hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_start,
               round(sum(value), 2) AS x
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    mu AS (
        -- x sits on the 2dp grid: sum as DECIMAL so the baseline is
        -- exact and order-independent (a double sum varies with
        -- Spark's partial-agg order and the recursion amplifies ulps)
        SELECT event_type,
               CAST(sum(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS mu
        FROM hourly GROUP BY event_type
    ),
    seq AS (
        SELECT h.event_type, h.hour_start, h.x - m.mu AS adj,
               row_number() OVER (PARTITION BY h.event_type
                                  ORDER BY h.hour_start) AS i
        FROM hourly h JOIN mu m USING (event_type)
    ),
    cs(event_type, i, s) AS (
        SELECT event_type, i, greatest(0.0, adj) FROM seq WHERE i = 1
        UNION ALL
        SELECT s.event_type, s.i, greatest(0.0, c.s + s.adj)
        FROM seq s JOIN cs c
          ON c.event_type = s.event_type AND s.i = c.i + 1
    )
    SELECT s.event_type, s.hour_start, round(c.s, 4) AS cusum
    FROM seq s JOIN cs c ON c.event_type = s.event_type AND c.i = s.i
    """,
)
def q_cusum(spark, sf_dir):
    """One-sided CUSUM change-point statistic per event_type: hourly
    volume x_t, per-type baseline μ, S_t = max(0, S_{t-1} + x_t − μ) —
    the classic upward-shift detector (Page 1954) behind drift alarms.
    A sustained rise accumulates; noise resets to 0.

    The recursion is a genuine sequential fold, so it runs where the
    data is SMALL: the fact stream first reduces map-side to the
    bounded (type × hour) relation; each type's series then folds
    inside one `aggregate` higher-order function over its array
    (array_sort of the collected (hour, adj) structs → deterministic
    order). State is the time axis, not the data volume — the same
    boundedness argument as q_ewma. The DuckDB oracle replays the
    identical double arithmetic as a recursive CTE, so the hash check
    pins every S_t exactly."""
    ev = scatter(load_table(spark, sf_dir, "events"))
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.round(F.sum("value"), 2).alias("x"))
    mu = hourly.groupBy("event_type").agg(
        (
            F.sum(F.col("x").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )
    adj = hourly.join(F.broadcast(mu), "event_type").select(
        "event_type", "hour_start", (F.col("x") - F.col("mu")).alias("adj")
    )
    series = adj.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(F.struct("hour_start", "adj"))
        ).alias("pts")
    )
    cusum = F.aggregate(
        F.col("pts"),
        F.array().cast("array<double>"),
        lambda acc, p: F.concat(
            acc,
            F.array(
                F.greatest(
                    F.lit(0.0),
                    F.when(F.size(acc) > 0, F.element_at(acc, -1))
                    .otherwise(F.lit(0.0))
                    + p["adj"],
                )
            ),
        ),
    )
    return (
        series.withColumn("s", cusum)
        .select(
            "event_type",
            F.explode(
                F.arrays_zip(
                    F.col("pts.hour_start").alias("hour_start"),
                    F.col("s").alias("cusum"),
                )
            ).alias("z"),
        )
        .select(
            "event_type",
            F.col("z.hour_start").alias("hour_start"),
            F.round("z.cusum", 4).alias("cusum"),
        )
    )


@query(
    "q_type_correlation",
    oracle="""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS hour_start,
               round(sum(value), 2) AS x
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    p AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               CAST(a.x AS DECIMAL(18,2)) AS xa,
               CAST(b.x AS DECIMAL(18,2)) AS xb
        FROM hourly a JOIN hourly b
          ON a.hour_start = b.hour_start AND a.event_type < b.event_type
    ),
    m AS (
        SELECT type_a, type_b,
               count(*) AS n,
               CAST(sum(xa) AS DOUBLE) AS sx,
               CAST(sum(xb) AS DOUBLE) AS sy,
               CAST(sum(xa * xb) AS DOUBLE) AS sxy,
               CAST(sum(xa * xa) AS DOUBLE) AS sxx,
               CAST(sum(xb * xb) AS DOUBLE) AS syy
        FROM p GROUP BY type_a, type_b
    )
    SELECT type_a, type_b, n,
           round((n * sxy - sx * sy)
                 / sqrt(nullif((n * sxx - sx * sx) * (n * syy - sy * sy),
                               0.0)), 6)
               AS corr
    FROM m
    """,
)
def q_type_correlation(spark, sf_dir):
    """Pairwise Pearson correlation of hourly volume between event
    types — the metric-correlation matrix behind "do clicks move with
    views?" dashboards and feature-redundancy pruning. The moment sums
    (Σx, Σy, Σxy, Σx², Σy²) accumulate as DECIMAL over the 2dp volume
    grid, so they are EXACT and order-independent on both engines; the
    closed-form r is then one deterministic double expression (no
    engine-native corr(), whose streaming implementations differ).

    Scale shape: facts reduce map-side to the bounded (type × hour)
    relation; the pair join is hour-keyed between a handful of types —
    the correlation matrix costs O(hours × types²) regardless of event
    volume."""
    ev = scatter(load_table(spark, sf_dir, "events"))
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hour_start")
    ).agg(F.round(F.sum("value"), 2).cast("decimal(18,2)").alias("x"))
    a = hourly.select(
        F.col("event_type").alias("type_a"), "hour_start",
        F.col("x").alias("xa"),
    )
    b = hourly.select(
        F.col("event_type").alias("type_b"), "hour_start",
        F.col("x").alias("xb"),
    )
    p = a.join(b, "hour_start").filter(F.col("type_a") < F.col("type_b"))
    m = p.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("xa").cast("double").alias("sx"),
        F.sum("xb").cast("double").alias("sy"),
        F.sum(F.col("xa") * F.col("xb")).cast("double").alias("sxy"),
        F.sum(F.col("xa") * F.col("xa")).cast("double").alias("sxx"),
        F.sum(F.col("xb") * F.col("xb")).cast("double").alias("syy"),
    )
    # degenerate pairs (constant hourly volume, or a single shared
    # hour) have a zero variance term: Spark doubles would yield
    # Infinity/NaN while DuckDB's double division-by-zero differs
    # across versions — nullif on BOTH engines pins the result to NULL
    denom = (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    ) * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        F.nullif(denom, F.lit(0.0))
    )
    return m.select("type_a", "type_b", "n", F.round(corr, 6).alias("corr"))


# --------------------------------------------- seasonal decomposition

_DEC_HALF = 12  # centered moving-average half-width → 25-hour window


@query(
    "q_seasonal_decompose",
    oracle=f"""
    WITH series AS (
        SELECT event_type, date_trunc('hour', ts) AS hr,
               count(*) AS y
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    ),
    win AS (
        SELECT event_type, hr, y,
               CAST(sum(y) OVER w AS BIGINT) AS s_w,
               count(*) OVER w AS c_w
        FROM series
        WINDOW w AS (PARTITION BY event_type ORDER BY hr
                     ROWS BETWEEN {_DEC_HALF} PRECEDING
                              AND {_DEC_HALF} FOLLOWING)
    ),
    full_win AS (
        SELECT * FROM win WHERE c_w = {2 * _DEC_HALF + 1}
    ),
    seas AS (
        SELECT event_type, CAST(hour(hr) AS BIGINT) AS hod,
               CAST(sum(y * {2 * _DEC_HALF + 1} - s_w) AS BIGINT) AS num_g,
               count(*) AS n_g
        FROM full_win GROUP BY event_type, hour(hr)
    )
    SELECT f.event_type, f.hr, f.y,
           CAST(f.s_w AS DOUBLE) / CAST({2 * _DEC_HALF + 1} AS DOUBLE)
             AS trend,
           CAST(g.num_g AS DOUBLE)
             / CAST({2 * _DEC_HALF + 1} * g.n_g AS DOUBLE) AS seasonal,
           CAST(f.y * {2 * _DEC_HALF + 1} * g.n_g
                - f.s_w * g.n_g - g.num_g AS DOUBLE)
             / CAST({2 * _DEC_HALF + 1} * g.n_g AS DOUBLE) AS resid
    FROM full_win f
    JOIN seas g ON g.event_type = f.event_type
               AND g.hod = CAST(hour(f.hr) AS BIGINT)
    """,
)
def q_seasonal_decompose(spark, sf_dir):
    """Classical additive seasonal decomposition (the moving-average
    core of STL / statsmodels `seasonal_decompose`): per event type,
    the hourly volume series splits into trend (centered 25-hour
    moving average), seasonal (hour-of-day mean of the detrended
    series), and residual — the decomposition that feeds capacity
    planning and anomaly baselines (q_seasonal_anomaly scores against
    the raw hourly population; this isolates WHY: trend vs season).

    Series edges without a full 25-row window are excluded (c_w = 25
    filter), which makes every emitted float exact: trend = s_w/25,
    seasonal = Σ(y·25 − s_w) / (25·n_g), resid clears both inner
    divisions to a single integer-ratio division — no float sums, no
    rounding, bit-identical cross-engine.

    Scale: the series relation is TIME-bounded (one row per type×hour
    regardless of input size), built by one map-side-combined count
    aggregate; the window partitions by type; the seasonal relation is
    ≤ |types|·24 rows and broadcasts back.
    """
    span = 2 * _DEC_HALF + 1
    series = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.date_trunc("hour", "ts").alias("hr"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-_DEC_HALF, _DEC_HALF)
    )
    full_win = (
        series.select(
            "event_type",
            "hr",
            "y",
            F.sum("y").over(w).alias("s_w"),
            F.count(F.lit(1)).over(w).alias("c_w"),
        )
        .filter(F.col("c_w") == span)
        .drop("c_w")
    )
    seas = full_win.groupBy(
        "event_type", F.hour("hr").cast("long").alias("hod")
    ).agg(
        F.sum(F.col("y") * span - F.col("s_w")).alias("num_g"),
        F.count(F.lit(1)).alias("n_g"),
    )
    return (
        full_win.withColumn("hod", F.hour("hr").cast("long"))
        .join(F.broadcast(seas), ["event_type", "hod"])
        .select(
            "event_type",
            "hr",
            "y",
            (F.col("s_w").cast("double") / F.lit(float(span))).alias(
                "trend"
            ),
            (
                F.col("num_g").cast("double")
                / (F.lit(span) * F.col("n_g")).cast("double")
            ).alias("seasonal"),
            (
                (
                    F.col("y") * span * F.col("n_g")
                    - F.col("s_w") * F.col("n_g")
                    - F.col("num_g")
                ).cast("double")
                / (F.lit(span) * F.col("n_g")).cast("double")
            ).alias("resid"),
        )
    )


@query(
    "q_kaplan_meier",
    oracle="""
    WITH o AS (
        SELECT o_custkey, epoch_ms(o_orderdate) AS ms FROM orders
    ),
    g AS (SELECT max(ms) AS gmax FROM o),
    u AS (
        SELECT o_custkey,
               CAST((max(ms) - min(ms)) // 86400000 AS BIGINT) AS t,
               CASE WHEN max(ms) < g.gmax - 7776000000 THEN 1 ELSE 0 END
                 AS ev
        FROM o CROSS JOIN g GROUP BY o_custkey, g.gmax
    ),
    tot AS (SELECT count(*) AS n FROM u),
    pts AS (
        SELECT t, count(*) AS cnt, CAST(sum(ev) AS BIGINT) AS d
        FROM u GROUP BY t
    ),
    r AS (
        SELECT t, d,
               n - CAST(coalesce(sum(cnt) OVER (
                     ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS BIGINT) AS n_risk
        FROM pts CROSS JOIN tot
    ),
    f AS (
        SELECT t, n_risk, d,
               CAST(round(ln(CAST(n_risk - d AS DOUBLE)
                             / CAST(n_risk AS DOUBLE)) * 1e6, 0)
                    AS BIGINT) AS fm
        FROM r WHERE d > 0 AND n_risk > d
    )
    SELECT t, n_risk, d,
           round(exp(CAST(sum(fm) OVER (ORDER BY t) AS DOUBLE) / 1e6), 6)
             AS survival
    FROM f
    """,
)
def q_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier product-limit survival curve over customer
    lifetimes — THE censoring-aware churn/retention estimator. Subject
    = customer; duration = days between first and last order; event =
    churned (last order > 90 days before the corpus's final order),
    still-active customers are right-censored. At each event time t:
    S(t) = prod_{t' <= t} (n_risk - d)/n_risk.

    Determinism: durations are integer day arithmetic; at-risk counts
    come from an EXCLUSIVE running count over the bounded
    distinct-duration relation; each hazard factor's log argument is
    one division of two exact integers, frozen onto the integer
    micro-grid (round(ln*1e6) — the order-independent-sum trick), so
    the cumulative sum is exact integer addition and the final
    exp/round is the identical IEEE sequence on both engines. Points
    with d=0 (censoring-only) don't change S and are omitted; n_risk=d
    total-extinction points would make S=0 and are excluded by the
    same explicit predicate on both engines.

    Scale: one hash aggregate per customer, one to the distinct-
    duration relation (bounded by the calendar, not the corpus), then
    BOTH running quantities ride `distributed_cumulative` — no global
    sort, no single-partition exchange, O(corpus) + O(|durations|).
    """
    from ..functions.time import epoch_ms
    from ..operators.windows import distributed_cumulative

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", epoch_ms("o_orderdate").alias("ms")
    )
    g = o.agg(F.max("ms").alias("gmax"))
    u = (
        o.groupBy("o_custkey")
        .agg(F.min("ms").alias("first_ms"), F.max("ms").alias("last_ms"))
        .crossJoin(F.broadcast(g))
        .select(
            F.expr(
                "CAST((last_ms - first_ms) div 86400000 AS BIGINT)"
            ).alias("t"),
            F.when(
                F.col("last_ms") < F.col("gmax") - F.lit(7776000000), 1
            ).otherwise(0).alias("ev"),
        )
        # consumed by tot + pts (and pts by two distributed_cumulative
        # passes) — materialize the per-customer relation once instead
        # of re-running the orders scan + aggregate per consumer
        .localCheckpoint()
    )
    tot = u.agg(F.count(F.lit(1)).alias("n"))
    pts = u.groupBy("t").agg(
        F.count(F.lit(1)).alias("cnt"), F.sum("ev").alias("d")
    )
    r = (
        distributed_cumulative(
            pts, ["t"], agg_col="cnt", out_col="cum_excl", exclusive=True
        )
        .crossJoin(F.broadcast(tot))
        .select("t", "d", (F.col("n") - F.col("cum_excl")).alias("n_risk"))
    )
    f = r.filter((F.col("d") > 0) & (F.col("n_risk") > F.col("d"))).select(
        "t",
        "n_risk",
        "d",
        F.round(
            F.log(
                (F.col("n_risk") - F.col("d")).cast("double")
                / F.col("n_risk").cast("double")
            )
            * 1e6,
            0,
        )
        .cast("long")
        .alias("fm"),
    )
    # the second ranking pass consumes `f` in THREE subtrees (its
    # boundary job, local window, per-bucket totals), and each one
    # re-derived the ENTIRE first distributed_cumulative pipeline
    # behind it (executed plan before: 60 exchanges). `f` is bounded
    # by the distinct-duration calendar, so materializing it once
    # trades one tiny checkpoint job for two re-evaluations of the
    # deep at-risk pipeline (r13; the q_rfm/q_js_divergence cost note).
    f = f.localCheckpoint()
    return distributed_cumulative(
        f, ["t"], agg_col="fm", out_col="cum_fm"
    ).select(
        "t",
        "n_risk",
        "d",
        F.round(F.exp(F.col("cum_fm").cast("double") / F.lit(1e6)), 6).alias(
            "survival"
        ),
    )


@query(
    "q_cusum_prefix",
    oracle="""
    WITH daily AS (
        SELECT event_type AS seg,
               CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
               CAST(sum(CAST(round(value * 100, 0) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2
    ),
    seg_tot AS (
        SELECT seg, count(*) AS n_days, CAST(sum(cents) AS BIGINT) AS sum_c
        FROM daily GROUP BY 1
    ),
    walk AS (
        SELECT d.seg, d.day, t.n_days, t.sum_c,
               row_number() OVER w AS t_idx,
               CAST(sum(d.cents) OVER w AS HUGEINT) AS p
        FROM daily d JOIN seg_tot t USING (seg)
        WINDOW w AS (PARTITION BY d.seg ORDER BY d.day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ),
    dev AS (
        SELECT *,
               20 * n_days * p - CAST(t_idx AS HUGEINT) * 21 * sum_c AS d_t
        FROM walk
    ),
    g AS (
        SELECT seg, day, t_idx, n_days, sum_c,
               d_t - least(0, min(d_t) OVER (PARTITION BY seg ORDER BY day
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW)) AS g_t
        FROM dev
    )
    SELECT seg, day, t_idx,
           round(CAST(g_t AS DOUBLE) / (2000.0 * n_days), 6) AS cusum_units,
           g_t > 20 * CAST(sum_c AS HUGEINT) AS alarm
    FROM g
    """,
)
def q_cusum_prefix(spark, sf_dir):
    """One-sided CUSUM changepoint monitor per event_type over daily
    revenue — the WINDOW-DISTRIBUTED twin of q_cusum (which folds each
    type's hourly series inside one aggregate() array fold): same
    Page-1954 recursion S_t = max(0, S_{t-1} + x_t − κ), but with a
    drift allowance k = μ/20 and an explicit alarm threshold, and —
    the point of the twin — NO collected array anywhere: when the
    observation axis itself is too long to fold in one array (years
    of minutes, per-key monitors), the prefix identity keeps CUSUM a
    pair of window passes over the day relation.

    The recursion LOOKS inherently sequential, but the prefix identity
    S_t = P_t − t·κ − min_{j≤t}(P_j − j·κ) (κ = μ+k, P = prefix sum)
    turns it into TWO window passes — a running sum and a running min
    — i.e. a fully distributed scan over the day-level relation, the
    same trick distributed_cumulative rides. Exactness: x_t are exact
    daily cents sums; κ = 21μ/20 (5% drift allowance k = μ/20) is
    rational, so everything is scaled by 20N: D_t = 20N·P_t −
    t·21·Σc is an exact integer, G_t = D_t − min_j D_j ≥ 0 is the
    scaled CUSUM, and the alarm G_t > 20·Σc (i.e. S_t > one average
    day μ) is an INTEGER comparison — both engines divide only for
    the reported cusum_units, rounded 6dp.

    Scale shape: one hash aggregate to (seg, day) — bounded by
    |types|·|days|, not rows — a broadcast join of 5-row segment
    totals, then two windows per segment whose partitions are
    |days| long: cost grows with the OBSERVATION WINDOW, never with
    corpus volume (the mann_kendall honest contract)."""
    dec = "decimal(38,0)"
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = (
        ev.select(
            F.col("event_type").alias("seg"),
            F.floor(F.unix_timestamp("ts") / 86400).cast("long").alias("day"),
            F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        )
        .groupBy("seg", "day")
        .agg(F.sum("cents").alias("cents"))
    )
    seg_tot = daily.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("cents").alias("sum_c")
    )
    w = (
        Window.partitionBy("seg")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    walk = (
        daily.join(F.broadcast(seg_tot), "seg")
        .withColumn("t_idx", F.row_number().over(Window.partitionBy("seg").orderBy("day")))
        .withColumn("p", F.sum("cents").over(w).cast(dec))
    )
    d_t = (
        F.lit(20).cast(dec) * F.col("n_days").cast(dec) * F.col("p")
        - F.col("t_idx").cast(dec) * F.lit(21).cast(dec) * F.col("sum_c").cast(dec)
    )
    dev = walk.withColumn("d_t", d_t)
    # the min must include the EMPTY prefix j=0 (D_0 = 0): a first
    # observation above kappa already accumulates
    g_t = F.col("d_t") - F.least(F.lit(0).cast(dec), F.min("d_t").over(w))
    out = dev.withColumn("g_t", g_t)
    return out.select(
        "seg",
        "day",
        "t_idx",
        F.round(
            F.col("g_t").cast("double")
            / (F.lit(2000.0) * F.col("n_days").cast("double")),
            6,
        ).alias("cusum_units"),
        (
            F.col("g_t")
            > F.lit(20).cast(dec) * F.col("sum_c").cast(dec)
        ).alias("alarm"),
    )
