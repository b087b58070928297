"""ML feature-engineering and model-eval relational programs.

The reference's training loop consumes hand-built feature tensors
(embedding.py's pair features, detection.py's calibration scores); a
production pipeline derives those features relationally so they stay
declarative, pushdown-friendly, and re-runnable at corpus scale. This
module adds the canonical feature-engineering operators every
training-data pipeline needs — target encoding, the hashing trick,
lag/rolling feature matrices, co-occurrence statistics — plus the
reliability-diagram eval (ECE) that sits beside q_auc /
q_average_precision, and the MERGE upsert shape that maintains a
feature store.

Cross-engine determinism strategy (the house style): every emitted
float is either (a) an exact integer-arithmetic result, or (b) ONE
IEEE-754 division of two exactly-derived integers — no float sums
across rows, no round() on values that can sit on a half-tie. Where a
mean over rows is needed, values are first lifted onto an exact
integer grid (2-decimal money/values, 9-decimal scores) so the SUM is
integer-exact and the final division is bit-identical in Spark and
DuckDB.

Scale design (100 TB):
* Category/global statistics reduce to bounded relations (|categories|
  rows, 1 row) and re-join BROADCAST — the fact table is never
  shuffled for an encoding join-back.
* The hashing trick is a pure projection + hash aggregate: one shuffle
  keyed on (entity, bucket), map-side combined.
* Lag/rolling features ride one hash-partitioned window per entity —
  no global ordering anywhere.
* Co-occurrence explodes pairs WITHIN an order group (TPC-H orders
  hold ≤7 lineitems → the explosion is linear in input, never
  quadratic in the table), then hash-aggregates pair counts; the
  item-frequency join-back is broadcast (|parts| ≪ |lineitem|).
* The MERGE upsert is the standard source⟕target equi-join; at scale
  it shuffles on the merge key (or broadcasts the delta batch when
  small — the common case for incremental feature refresh).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.keys import stable_id_hash
from ..operators.windows import cap_group_size, distributed_cumulative
from ..sources.tables import load_table
from .registry import query


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ------------------------------------------------------- target encoding

_TE_SMOOTH = 10  # pseudo-count weight toward the global prior


@query(
    "q_target_encoding",
    oracle=f"""
    WITH base AS (
        SELECT o_orderkey, o_orderpriority AS prio,
               CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
        FROM orders
    ),
    cat AS (
        SELECT prio, count(*) AS n, CAST(sum(y) AS BIGINT) AS s
        FROM base GROUP BY prio
    ),
    gstat AS (
        SELECT count(*) AS big_n, CAST(sum(y) AS BIGINT) AS big_s FROM base
    )
    SELECT b.o_orderkey, b.prio, b.y,
           CAST(c.s - b.y AS DOUBLE) / CAST(c.n - 1 AS DOUBLE) AS te_loo,
           CAST((c.s - b.y) * g.big_n + {_TE_SMOOTH} * g.big_s AS DOUBLE)
             / CAST(g.big_n * (c.n - 1 + {_TE_SMOOTH}) AS DOUBLE) AS te_smooth
    FROM base b JOIN cat c ON b.prio = c.prio CROSS JOIN gstat g
    """,
)
def q_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leave-one-out target encoding of a categorical feature — the
    standard high-cardinality-categorical encoder for GBDT/linear
    training data. For each row, the category's target mean is
    computed EXCLUDING the row itself (prevents target leakage), plus
    a smoothed variant shrunk toward the global prior with m=10
    pseudo-counts (the sklearn/category_encoders formulation).

    Exactness: te_loo = (s−y)/(n−1) is one integer-ratio division.
    The smoothed encoding algebraically clears the prior's division:
    (s−y + m·S/N)/(n−1+m) = ((s−y)·N + m·S) / (N·(n−1+m)) — integer
    numerator, integer denominator, ONE division. Bit-identical
    cross-engine with no rounding anywhere.

    Scale: category stats (|categories| rows) and the global prior
    (1 row) reduce map-side and broadcast back onto the fact — the
    orders relation is never shuffled.
    """
    base = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("prio"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("y"),
    )
    cat = base.groupBy("prio").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("s")
    )
    glob = base.agg(
        F.count(F.lit(1)).alias("big_n"), F.sum("y").alias("big_s")
    )
    m = F.lit(_TE_SMOOTH)
    return (
        base.join(F.broadcast(cat), "prio")
        .crossJoin(F.broadcast(glob))
        .select(
            "o_orderkey",
            "prio",
            "y",
            (
                (F.col("s") - F.col("y")).cast("double")
                / (F.col("n") - 1).cast("double")
            ).alias("te_loo"),
            (
                (
                    (F.col("s") - F.col("y")) * F.col("big_n")
                    + m * F.col("big_s")
                ).cast("double")
                / (F.col("big_n") * (F.col("n") - 1 + m)).cast("double")
            ).alias("te_smooth"),
        )
    )


# -------------------------------------------------------- hashing trick

_FH_DIM = 64  # hashed feature-vector dimensionality


@query(
    "q_feature_hashing",
    oracle=f"""
    WITH tok AS (
        SELECT user_id, 'type:' || event_type AS token, value FROM events
        UNION ALL
        SELECT user_id,
               'k:' || json_extract_string(props, '$.k') AS token, value
        FROM events
    )
    SELECT user_id,
           ('0x' || substr(md5(token), 1, 7))::BIGINT % {_FH_DIM} AS bucket,
           count(*) AS f_n,
           round(sum(value), 2) AS f_sum
    FROM tok
    GROUP BY user_id, ('0x' || substr(md5(token), 1, 7))::BIGINT % {_FH_DIM}
    """,
)
def q_feature_hashing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The hashing trick (Weinberger et al., ICML'09): project sparse
    categorical features into a fixed D=64-dim vector by hashing each
    token to a bucket — collisions are accepted by design (105 distinct
    tokens over 64 buckets here), which is exactly what makes the
    encoder stateless and vocabulary-free at 100 TB (no dictionary to
    build, ship, or version). Output is the sparse feature matrix
    (entity, bucket) → (count, summed value).

    Each event contributes two tokens (its type and its JSON `k`
    property) via a 2-way unioned projection — the multi-feature fan-in
    that produces genuine bucket collisions. Hashing uses the
    md5-derived 28-bit `stable_id_hash` (functions/keys.py) so Spark
    and the oracle agree bit-for-bit; `sum(value)` is exact on the
    2-decimal grid, so round(·,2) re-lands it losslessly.

    Scale: projection + ONE hash aggregate keyed (user, bucket), map-
    side combined; no joins, no windows.
    """
    ev = _t(spark, sf_dir, "events")
    tok = ev.select(
        "user_id",
        F.concat(F.lit("type:"), F.col("event_type")).alias("token"),
        "value",
    ).unionAll(
        ev.select(
            "user_id",
            F.concat(
                F.lit("k:"), F.get_json_object("props", "$.k")
            ).alias("token"),
            "value",
        )
    )
    return (
        tok.withColumn("bucket", stable_id_hash(F.col("token")) % _FH_DIM)
        .groupBy("user_id", "bucket")
        .agg(
            F.count(F.lit(1)).alias("f_n"),
            F.round(F.sum("value"), 2).alias("f_sum"),
        )
    )


# ------------------------------------------------------ lag feature matrix

@query(
    "q_lag_features",
    oracle="""
    SELECT event_id, user_id,
           lag(value) OVER w AS lag1,
           value - lag(value) OVER w AS delta1,
           round(sum(value) OVER (w ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                 2) AS rsum3,
           CAST(extract(hour FROM ts) AS INTEGER) AS hr,
           CAST(isodow(ts) AS INTEGER) AS dow
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q_lag_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-entity lag/rolling feature matrix — the standard temporal
    feature block for churn/forecast training sets: previous value,
    first difference, 3-row rolling sum, and calendar features, one
    feature row per event.

    Exactness: lag1 and delta1 are raw double copies/subtractions of
    the same parquet doubles (bit-identical, no rounding); rsum3 sums
    ≤3 values from the 2-decimal grid, so round(·,2) re-lands the
    mathematically exact result; calendar parts are integers (ISO
    day-of-week: Monday=1).

    Scale: ONE hash-partitioned window keyed by user — partition count
    scales with entities, no global sort, no single-partition funnel.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    roll = w.rowsBetween(-2, Window.currentRow)
    return _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("lag1"),
        (F.col("value") - F.lag("value").over(w)).alias("delta1"),
        F.round(F.sum("value").over(roll), 2).alias("rsum3"),
        F.hour("ts").alias("hr"),
        (F.expr("weekday(ts)") + 1).alias("dow"),
    )


# --------------------------------------------------- co-occurrence / lift

_CO_MIN_PAIR = 2  # minimum pair support
_CO_TOPK = 100
# Group-size guard for the within-order pair fans (r6 verdict weak
# item): baskets are truncated to their first _BASKET_CAP items before
# the self-join, so one pathological 10k-item basket costs
# cap·(cap-1)/2 pairs instead of ~5·10⁷ in a single reducer — the
# cap_group_size analog of minhash_bands(hot_band_cap=…). TPC-H orders
# hold ≤7 lineitems, so at 64 the cap never fires here (parity with
# the uncapped result is proven by a test); it exists so the SAME plan
# survives a real basket corpus. Oracles mirror the cap row-for-row.
_BASKET_CAP = 64


def _basket_pairs(li: DataFrame, min_pair: int) -> DataFrame:
    """(pa < pb, pair_n) within-order support counts, join-free (r12).

    Collect each order's basket as the cap-truncated ascending list
    (slice(sort_array(collect_list)) ≡ cap_group_size's first-cap-rows-
    by-value multiset, duplicates included — the oracles' row_number
    cap row-for-row) and explode the ordered pair fan map-side. The
    previous capped self-join on l_orderkey scanned and shuffled the
    capped relation twice (window shuffle + both join sides) and its
    identical subtrees got no runtime ReusedExchange under the
    broadcast (the queries_graph._supplier_edges finding); this is ONE
    order-keyed shuffle, with the identical pair multiset — pair
    counts preserve duplicate-row multiplicity exactly like the join.
    Fan stays O(cap²) per order map-side; measured at sf0.1 (min-of-3
    count action, comparable canary windows): q_item_cooccurrence
    2.91 s → 1.80 s, q_item_similarity 2.94 s → 1.66 s.
    """
    baskets = li.groupBy("l_orderkey").agg(
        F.slice(
            F.sort_array(F.collect_list("l_partkey")), 1, _BASKET_CAP
        ).alias("items")
    )
    return (
        baskets.select(F.explode("items").alias("pa"), "items")
        .select("pa", F.explode("items").alias("pb"))
        .where(F.col("pa") < F.col("pb"))
        .groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("pair_n"))
        .filter(F.col("pair_n") >= min_pair)
    )


@query(
    "q_item_cooccurrence",
    oracle=f"""
    WITH capped AS (
        SELECT l_orderkey, l_partkey FROM (
            SELECT l_orderkey, l_partkey, row_number() OVER (
                       PARTITION BY l_orderkey ORDER BY l_partkey
                   ) AS gr
            FROM lineitem
        ) WHERE gr <= {_BASKET_CAP}
    ),
    pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS pair_n
        FROM capped a JOIN capped b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= {_CO_MIN_PAIR}
    ),
    freq AS (
        SELECT l_partkey, count(DISTINCT l_orderkey) AS n_ord
        FROM lineitem GROUP BY l_partkey
    ),
    tot AS (SELECT count(*) AS n_orders FROM orders)
    SELECT p.pa, p.pb, p.pair_n,
           CAST(p.pair_n * t.n_orders AS DOUBLE)
             / CAST(fa.n_ord * fb.n_ord AS DOUBLE) AS lift
    FROM pairs p
    JOIN freq fa ON fa.l_partkey = p.pa
    JOIN freq fb ON fb.l_partkey = p.pb
    CROSS JOIN tot t
    ORDER BY lift DESC, p.pa, p.pb
    LIMIT {_CO_TOPK}
    """,
)
def q_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift — the association-rule
    statistic behind "users who bought X also bought Y" and behind
    co-occurrence-based embedding pretraining data. Part pairs sharing
    an order are counted (support), then scored by lift =
    P(a,b)/(P(a)·P(b)) = pair_n·N / (n_a·n_b) — ONE integer-ratio
    division. Top-100 by lift, deterministic (pa, pb) tie-break.

    Scale: the pair explosion is WITHIN an order group (≤7 lineitems
    per TPC-H order → ≤21 pairs, linear in input); pair support is one
    hash aggregate; the item-frequency join-back is broadcast
    (|parts| ≪ |lineitem|); top-k is TakeOrderedAndProject, never a
    global sort. Baskets are truncated to _BASKET_CAP items before the
    pair fan (see the constant's comment) so a hot group stays
    O(cap²), not O(|g|²); marginal frequencies stay uncapped — the cap
    bounds candidate GENERATION, not the probability estimates.
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = _basket_pairs(li, _CO_MIN_PAIR)
    freq = li.groupBy("l_partkey").agg(
        F.countDistinct("l_orderkey").alias("n_ord")
    )
    tot = _t(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    fa = freq.select(
        F.col("l_partkey").alias("pa"), F.col("n_ord").alias("na")
    )
    fb = freq.select(
        F.col("l_partkey").alias("pb"), F.col("n_ord").alias("nb")
    )
    return (
        pairs.join(F.broadcast(fa), "pa")
        .join(F.broadcast(fb), "pb")
        .crossJoin(F.broadcast(tot))
        .select(
            "pa",
            "pb",
            "pair_n",
            (
                (F.col("pair_n") * F.col("n_orders")).cast("double")
                / (F.col("na") * F.col("nb")).cast("double")
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "pa", "pb")
        .limit(_CO_TOPK)
    )


# ------------------------------------------------- reliability diagram

_ECE_BINS = 10
_SCORE_SCALE = 1_000_000_000  # 9-decimal score grid → exact integers


@query(
    "q_reliability_ece",
    oracle=f"""
    WITH scored AS (
        SELECT CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y,
               CAST(round((CAST(embedding[1] AS DOUBLE)
                           + CAST(embedding[2] AS DOUBLE) * 0.5)
                          * {_SCORE_SCALE}) AS BIGINT) AS si,
               vec_id
        FROM embeddings
    ),
    nn AS (SELECT count(*) AS big_n FROM scored),
    ranked AS (
        SELECT y, si, row_number() OVER (ORDER BY si, vec_id) AS rnk
        FROM scored
    ),
    binned AS (
        SELECT ((rnk - 1) * {_ECE_BINS}) // (SELECT big_n FROM nn) AS bin,
               y, si
        FROM ranked
    ),
    per_bin AS (
        SELECT bin, count(*) AS n,
               CAST(sum(y) AS BIGINT) AS s_y,
               CAST(sum(si) AS BIGINT) AS s_si
        FROM binned GROUP BY bin
    ),
    tot AS (
        SELECT CAST(sum(abs(s_y * {_SCORE_SCALE} - s_si)) AS BIGINT)
               AS ece_num
        FROM per_bin
    )
    SELECT b.bin, b.n,
           CAST(b.s_si AS DOUBLE)
             / CAST(b.n * {_SCORE_SCALE} AS DOUBLE) AS mean_score,
           CAST(b.s_y AS DOUBLE) / CAST(b.n AS DOUBLE) AS frac_pos,
           CAST(t.ece_num AS DOUBLE)
             / CAST((SELECT big_n FROM nn) * {_SCORE_SCALE} AS DOUBLE) AS ece
    FROM per_bin b CROSS JOIN tot t
    """,
)
def q_reliability_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram + Expected Calibration Error — the third
    member of the model-eval family beside q_auc and
    q_average_precision (the reference calibrates score thresholds in
    detection.py's calibration pass; ECE is the standard audit that the
    scores it thresholds are themselves calibrated). Scores are split
    into 10 equal-count bins (rank deciles, ties broken by vec_id);
    each bin reports mean predicted score vs observed positive rate,
    and ECE = Σ_b (n_b/N)·|acc_b − conf_b|.

    Exactness: the raw double score is quantized ONCE onto an integer
    1e-9 grid (si = round(score·1e9): one IEEE multiply + round over
    identical doubles — the oracle casts the float32 embedding slots
    to DOUBLE explicitly, or DuckDB would score in single precision),
    so every per-bin sum is integer-exact. The n_b factors CANCEL
    algebraically: ECE = Σ_b |s_y·1e9 − s_si| / (N·1e9)
    — an integer numerator summed exactly, then ONE division. mean
    score / positive rate are likewise single divisions of integers.

    Scale: ranking is `distributed_cumulative` (two-pass, range-
    partitioned — no single-partition window), then one ≤10-row
    aggregate; the 1-row N and ECE relations broadcast back.
    """
    e = _t(spark, sf_dir, "embeddings")
    scored = e.select(
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("y"),
        F.round(
            (
                F.element_at("embedding", 1).cast("double")
                + F.element_at("embedding", 2).cast("double") * 0.5
            )
            * _SCORE_SCALE
        )
        .cast("long")
        .alias("si"),
        "vec_id",
    )
    nn = scored.agg(F.count(F.lit(1)).alias("big_n"))
    ranked = distributed_cumulative(
        scored, ["si", "vec_id"], out_col="rnk"
    )
    binned = ranked.crossJoin(F.broadcast(nn)).select(
        F.expr(f"((rnk - 1) * {_ECE_BINS}) div big_n").alias("bin"),
        "y",
        "si",
        "big_n",
    )
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s_y"),
        F.sum("si").alias("s_si"),
        F.max("big_n").alias("big_n"),
    )
    tot = per_bin.agg(
        F.sum(
            F.abs(F.col("s_y") * _SCORE_SCALE - F.col("s_si"))
        ).alias("ece_num"),
        F.max("big_n").alias("big_n"),
    )
    return (
        per_bin.drop("big_n")
        .crossJoin(F.broadcast(tot))
        .select(
            "bin",
            "n",
            (
                F.col("s_si").cast("double")
                / (F.col("n") * _SCORE_SCALE).cast("double")
            ).alias("mean_score"),
            (F.col("s_y").cast("double") / F.col("n").cast("double")).alias(
                "frac_pos"
            ),
            (
                F.col("ece_num").cast("double")
                / (F.col("big_n") * F.lit(_SCORE_SCALE)).cast("double")
            ).alias("ece"),
        )
    )


# ------------------------------------------------------------ MERGE upsert

_MERGE_NEW_KEY_OFFSET = 10_000_000
_MERGE_NEW_MOD = 97  # deterministic subset of spenders becomes "new" rows


@query(
    "q_merge_upsert",
    oracle=f"""
    WITH spend AS (
        SELECT o_custkey AS custkey, round(sum(o_totalprice), 2) AS spend
        FROM orders WHERE o_orderpriority = '1-URGENT'
        GROUP BY o_custkey
    ),
    source AS (
        SELECT custkey, spend FROM spend
        UNION ALL
        SELECT custkey + {_MERGE_NEW_KEY_OFFSET} AS custkey, spend
        FROM spend WHERE custkey % {_MERGE_NEW_MOD} = 0
    )
    SELECT s.custkey,
           CASE WHEN c.c_custkey IS NULL THEN 'insert' ELSE 'update' END
             AS action,
           c.c_acctbal AS old_bal,
           CASE WHEN c.c_custkey IS NULL THEN s.spend
                ELSE round(c.c_acctbal + s.spend, 2) END AS new_bal
    FROM source s LEFT JOIN customer c ON c.c_custkey = s.custkey
    """,
)
def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (the lakehouse upsert): a delta batch of
    per-customer urgent-order spend merges into the customer dimension
    — WHEN MATCHED THEN UPDATE (balance += spend), WHEN NOT MATCHED
    THEN INSERT. Emits the touched rows with their action tag, i.e.
    exactly the row-level effect a MERGE writer would commit (the
    write-side machinery — snapshots, OCC, CDC — lives in
    sources/catalog.py; this is the relational core). A deterministic
    subset of the batch (custkey ≡ 0 mod 97, offset by 10M) plays the
    not-matched role so both branches are exercised.

    Exactness: spend is a 2-decimal-grid sum re-landed by round(·,2);
    balance+spend stays on the grid, so the second round is likewise
    tie-free.

    Scale: the classic source⟕target equi-join — broadcast when the
    delta batch is small (the incremental case), hash-shuffled on the
    merge key otherwise; either way one join, no windows.
    """
    spend = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("spend"))
    )
    source = spend.unionAll(
        spend.filter(F.col("custkey") % _MERGE_NEW_MOD == 0).select(
            (F.col("custkey") + _MERGE_NEW_KEY_OFFSET).alias("custkey"),
            "spend",
        )
    )
    cust = _t(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    matched = F.col("c_custkey").isNotNull()
    return (
        source.join(cust, source.custkey == cust.c_custkey, "left")
        .select(
            "custkey",
            F.when(matched, "update").otherwise("insert").alias("action"),
            F.col("c_acctbal").alias("old_bal"),
            F.when(
                matched, F.round(F.col("c_acctbal") + F.col("spend"), 2)
            )
            .otherwise(F.col("spend"))
            .alias("new_bal"),
        )
    )


# ---------------------------------------------- item-item similarity (CF)

_SIM_MIN_PAIR = 2  # minimum co-occurrence support
_SIM_TOPK = 3      # neighbors kept per item


@query(
    "q_item_similarity",
    oracle=f"""
    WITH capped AS (
        SELECT l_orderkey, l_partkey FROM (
            SELECT l_orderkey, l_partkey, row_number() OVER (
                       PARTITION BY l_orderkey ORDER BY l_partkey
                   ) AS gr
            FROM lineitem
        ) WHERE gr <= {_BASKET_CAP}
    ),
    pairs AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS pair_n
        FROM capped a JOIN capped b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= {_SIM_MIN_PAIR}
    ),
    sym AS (
        SELECT pa AS item, pb AS neighbor, pair_n FROM pairs
        UNION ALL
        SELECT pb AS item, pa AS neighbor, pair_n FROM pairs
    ),
    freq AS (
        SELECT l_partkey, count(DISTINCT l_orderkey) AS n_ord
        FROM lineitem GROUP BY l_partkey
    ),
    scored AS (
        SELECT s.item, s.neighbor, s.pair_n,
               CAST(s.pair_n AS DOUBLE)
                 / sqrt(CAST(fi.n_ord * fn.n_ord AS DOUBLE)) AS cos_sim
        FROM sym s
        JOIN freq fi ON fi.l_partkey = s.item
        JOIN freq fn ON fn.l_partkey = s.neighbor
    )
    SELECT item, neighbor, pair_n, cos_sim, rnk FROM (
        SELECT *, row_number() OVER (
            PARTITION BY item ORDER BY cos_sim DESC, neighbor
        ) AS rnk
        FROM scored
    ) WHERE rnk <= {_SIM_TOPK}
    """,
)
def q_item_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-item collaborative filtering (Sarwar et al., WWW'01 /
    Amazon item-to-item): each part's top-3 most-similar parts by
    binary-incidence cosine over order baskets — cos(a,b) =
    co(a,b)/√(n_a·n_b). The similarity table IS the recommendation
    model; serving is a broadcast lookup.

    Exactness: IEEE-754 sqrt is correctly rounded, so
    pair_n / sqrt(na·nb) is two deterministic float ops over exact
    integers — bit-identical cross-engine, no rounding anywhere.

    Scale: candidate pairs come from the within-order explosion (≤21
    per order, linear in input) with a support floor, NOT an all-pairs
    item join; per-item top-k is a hash-partitioned window over the
    (item-bounded) candidate relation; item frequencies broadcast.
    Baskets are truncated to _BASKET_CAP items before the pair fan
    (see the constant's comment) so a hot group stays O(cap²).
    """
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pairs = _basket_pairs(li, _SIM_MIN_PAIR)
    sym = pairs.select(
        F.col("pa").alias("item"),
        F.col("pb").alias("neighbor"),
        "pair_n",
    ).unionAll(
        pairs.select(
            F.col("pb").alias("item"),
            F.col("pa").alias("neighbor"),
            "pair_n",
        )
    )
    freq = li.groupBy("l_partkey").agg(
        F.countDistinct("l_orderkey").alias("n_ord")
    )
    fi = freq.select(F.col("l_partkey").alias("item"), F.col("n_ord").alias("ni"))
    fn = freq.select(
        F.col("l_partkey").alias("neighbor"), F.col("n_ord").alias("nn")
    )
    scored = (
        sym.join(F.broadcast(fi), "item")
        .join(F.broadcast(fn), "neighbor")
        .select(
            "item",
            "neighbor",
            "pair_n",
            (
                F.col("pair_n").cast("double")
                / F.sqrt((F.col("ni") * F.col("nn")).cast("double"))
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= _SIM_TOPK)
        .select("item", "neighbor", "pair_n", "cos_sim", "rnk")
    )


# ------------------------------------------------------ grouped OLS fit


@query(
    "q_linear_fit",
    oracle="""
    WITH pt AS (
        SELECT p_brand,
               CAST(p_size AS BIGINT) AS x,
               CAST(round(p_retailprice * 100, 0) AS BIGINT) AS y
        FROM part
    ),
    s AS (
        SELECT p_brand,
               count(*) AS n,
               CAST(sum(x) AS HUGEINT) AS sx,
               CAST(sum(y) AS HUGEINT) AS sy,
               CAST(sum(x * x) AS HUGEINT) AS sxx,
               CAST(sum(x * y) AS HUGEINT) AS sxy,
               CAST(sum(y * y) AS HUGEINT) AS syy
        FROM pt GROUP BY p_brand
    )
    SELECT p_brand, n,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(nullif(n * sxx - sx * sx, 0) AS DOUBLE) AS slope_cents,
           CAST(sy * sxx - sx * sxy AS DOUBLE)
             / CAST(nullif(n * sxx - sx * sx, 0) AS DOUBLE) AS icept_cents,
           CASE WHEN (n * sxx - sx * sx) = 0 OR (n * syy - sy * sy) = 0
                THEN NULL
                ELSE (CAST(n * sxy - sx * sy AS DOUBLE)
                      * CAST(n * sxy - sx * sy AS DOUBLE))
                   / (CAST(n * sxx - sx * sx AS DOUBLE)
                      * CAST(n * syy - sy * sy AS DOUBLE))
           END AS r2
    FROM s
    """,
)
def q_linear_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares fit (slope, intercept, R^2) of
    retail price on part size — the grouped `regr_slope`/`regr_r2`
    family, i.e. one tiny linear model per category, a standard
    feature-drift / pricing-curve diagnostic.

    Exactness: x is an integer, y is lifted to the cents grid, and all
    five moment sums (Sx, Sy, Sxx, Sxy, Syy) are accumulated as
    DECIMAL(38,0) / HUGEINT — integer-exact at any scale and any
    summation order. The closed forms
        slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2)
        icept = (Sy*Sxx - Sx*Sxy) / (n*Sxx - Sx^2)
        r2    = (n*Sxy - Sx*Sy)^2 / ((n*Sxx - Sx^2)(n*Syy - Sy^2))
    evaluate numerator and denominator exactly in integer arithmetic,
    then perform the SAME single/double IEEE ops on both engines
    (decimal->double casts are round-to-nearest in both). Degenerate
    groups (constant x or constant y) yield NULL via an explicit
    zero-denominator guard on both sides — the q_type_correlation
    lesson (ADVICE r5).

    Scale: one map-side-combined hash aggregate to |brands| rows; the
    fact table is scanned once, never joined or shuffled wide.
    """
    pt = _t(spark, sf_dir, "part").select(
        "p_brand",
        F.col("p_size").cast("long").alias("x"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("y"),
    )
    dec = "decimal(38,0)"
    s = pt.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
    )
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    inum = F.col("sy") * F.col("sxx") - F.col("sx") * F.col("sxy")
    return s.select(
        "p_brand",
        "n",
        F.when(denx != 0, num.cast("double") / denx.cast("double")).alias(
            "slope_cents"
        ),
        F.when(denx != 0, inum.cast("double") / denx.cast("double")).alias(
            "icept_cents"
        ),
        F.when(
            (denx != 0) & (deny != 0),
            (num.cast("double") * num.cast("double"))
            / (denx.cast("double") * deny.cast("double")),
        ).alias("r2"),
    )


# -------------------------------------------------- mutual information


@query(
    "q_mutual_information",
    oracle="""
    WITH cell AS (
        SELECT o_orderpriority AS prio, o_orderstatus AS status,
               count(*) AS c
        FROM orders GROUP BY 1, 2
    ),
    rx AS (SELECT prio, CAST(sum(c) AS BIGINT) AS r FROM cell GROUP BY prio),
    cy AS (
        SELECT status, CAST(sum(c) AS BIGINT) AS s FROM cell GROUP BY status
    ),
    tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cell)
    SELECT cell.prio, cell.status, cell.c,
           round(ln(CAST(CAST(cell.c AS HUGEINT) * t.n AS DOUBLE)
                    / CAST(CAST(r.r AS HUGEINT) * c2.s AS DOUBLE)), 6)
             AS pmi,
           round((CAST(cell.c AS DOUBLE) / CAST(t.n AS DOUBLE))
                 * ln(CAST(CAST(cell.c AS HUGEINT) * t.n AS DOUBLE)
                      / CAST(CAST(r.r AS HUGEINT) * c2.s AS DOUBLE)), 6)
             AS mi_contrib
    FROM cell
    JOIN rx r USING (prio)
    JOIN cy c2 USING (status)
    CROSS JOIN tot t
    """,
)
def q_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information decomposition between two
    categorical columns (order priority x order status) — the standard
    feature-selection / association diagnostic. Emits the full
    contingency decomposition: per cell, its count, PMI
    = ln(p(x,y) / (p(x)p(y))), and its contribution p(x,y)*PMI to the
    total mutual information (sum of mi_contrib = MI(X;Y)).

    Determinism: the log's argument is ONE division of two exactly-
    derived integers (c*N and r_x*c_y), so both engines feed ln the
    bit-identical double; round(.,6) follows the house log convention
    (q_char_entropy / q_bigram_surprisal precedent).

    Scale: the contingency table is |X|*|Y| rows (15 here) — one
    map-side-combined aggregate; the marginals re-derive FROM the cell
    relation (never rescanning the fact table) and join back broadcast.
    """
    cell = (
        _t(spark, sf_dir, "orders")
        .select(
            F.col("o_orderpriority").alias("prio"),
            F.col("o_orderstatus").alias("status"),
        )
        .groupBy("prio", "status")
        .agg(F.count(F.lit(1)).alias("c"))
        # four consumers (marginals x2, total, final join) — one scan
        # of the fact, then reads of the |prio|x|status|-row relation
        .localCheckpoint()
    )
    rx = cell.groupBy("prio").agg(F.sum("c").alias("r"))
    cy = cell.groupBy("status").agg(F.sum("c").alias("s"))
    tot = cell.agg(F.sum("c").alias("n"))
    # products widen BEFORE multiplying (cell*total passes 2^63 at
    # corpus scale; the oracle mirrors with HUGEINT)
    _dec = "decimal(38,0)"
    ratio = (F.col("c").cast(_dec) * F.col("n").cast(_dec)).cast("double") / (
        F.col("r").cast(_dec) * F.col("s").cast(_dec)
    ).cast("double")
    return (
        cell.join(F.broadcast(rx), "prio")
        .join(F.broadcast(cy), "status")
        .crossJoin(F.broadcast(tot))
        .select(
            "prio",
            "status",
            "c",
            F.round(F.log(ratio), 6).alias("pmi"),
            F.round(
                (F.col("c").cast("double") / F.col("n").cast("double"))
                * F.log(ratio),
                6,
            ).alias("mi_contrib"),
        )
    )


# ---------------------------------------------- equal-frequency binning

_QBIN_K = 8  # number of equal-frequency bins


@query(
    "q_quantile_binning",
    oracle=f"""
    WITH o AS (
        SELECT o_orderkey,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
    ),
    r AS (
        SELECT o_orderkey, cents,
               row_number() OVER (ORDER BY cents, o_orderkey) AS rn,
               count(*) OVER () AS n
        FROM o
    )
    SELECT o_orderkey, cents,
           CAST(((rn - 1) * {_QBIN_K}) // n AS INT) AS bin
    FROM r
    """,
)
def q_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency (quantile) discretization of a continuous
    feature into k=8 bins — the standard preprocessing step for
    monotonic-feature bucketing and WOE encoding. Each row's bin is
    floor((rank-1)*k/N) over the (cents, key)-ordered relation, so bin
    populations differ by at most one row and the assignment is a pure
    function of the global rank (no approximate quantile drift between
    the bin EDGES and the rows assigned to them — the failure mode of
    cut-points-then-join binning).

    Exactness: price is lifted to the cents grid; rank and bin are
    integer arithmetic end to end (Spark `div` = DuckDB `//`).

    Scale: the global rank comes from operators/windows.py
    `distributed_cumulative` — range-bucketed two-pass ranking, NO
    `Exchange SinglePartition`; N joins back as a broadcast 1-row
    relation. The oracle's `row_number() OVER (ORDER BY ...)` is the
    semantic spec, not the plan.
    """
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    ranked = distributed_cumulative(o, ["cents", "o_orderkey"], out_col="rn")
    n = o.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n))
        .select(
            "o_orderkey",
            "cents",
            F.expr(f"CAST(((rn - 1) * {_QBIN_K}) div n AS INT)").alias("bin"),
        )
    )


# -------------------------------------------------- skew / concentration


@query(
    "q_gini_skew",
    oracle="""
    WITH act AS (
        SELECT user_id, count(*) AS y FROM events GROUP BY user_id
    ),
    r AS (
        SELECT user_id, y,
               row_number() OVER (ORDER BY y, user_id) AS rn
        FROM act
    )
    SELECT count(*) AS n_users,
           CAST(sum(y) AS BIGINT) AS total_events,
           CAST(2 * sum(CAST(rn AS HUGEINT) * y)
                - (count(*) + 1) * CAST(sum(y) AS HUGEINT) AS DOUBLE)
             / CAST(count(*) * CAST(sum(y) AS HUGEINT) AS DOUBLE) AS gini
    FROM r
    """,
)
def q_gini_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of per-key activity — THE skew diagnostic that
    decides whether a key needs salting before a 100 TB shuffle (G=0:
    uniform keys; G→1: one hot key owns the table). Uses the exact
    rank formulation over ascending activity:
        G = (2*sum(i*y_i) - (n+1)*sum(y_i)) / (n*sum(y_i)).

    Exactness: activity counts and ranks are integers; both moment
    sums accumulate as DECIMAL(38,0)/HUGEINT (overflow-proof at any
    corpus size), and the result is ONE double division of two
    exactly-derived integers — no rounding needed.

    Scale: per-key counts are one map-side-combined aggregate; the
    global rank is `distributed_cumulative` (range-bucketed two-pass,
    no single-partition exchange); the final reduction is scalar.
    """
    act = (
        _t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("y"))
    )
    ranked = distributed_cumulative(act, ["y", "user_id"], out_col="rn")
    dec = "decimal(38,0)"
    s = ranked.agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("y").alias("total_events"),
        # operands widen BEFORE the product (rank*count can pass 2^63
        # long before the decimal sum would)
        F.sum(F.col("rn").cast(dec) * F.col("y").cast(dec)).alias("siy"),
    )
    num = (
        F.lit(2) * F.col("siy")
        - (F.col("n_users") + 1) * F.col("total_events").cast(dec)
    )
    den = F.col("n_users") * F.col("total_events").cast(dec)
    return s.select(
        "n_users",
        "total_events",
        (num.cast("double") / den.cast("double")).alias("gini"),
    )


# ------------------------------------------------- conformal calibration

_CONF_ALPHA_NUM = 9  # 1 - alpha = 9/10 target coverage


@query(
    "q_conformal",
    oracle=f"""
    WITH cal AS (
        SELECT event_id,
               CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_id % 2 = 0
    ),
    tst AS (
        SELECT CAST(round(value * 100, 0) AS BIGINT) AS cents
        FROM events WHERE event_id % 2 = 1
    ),
    n_cal AS (SELECT count(*) AS nc FROM cal),
    k AS (
        SELECT nc, ((nc + 1) * {_CONF_ALPHA_NUM} + 9) // 10 AS kk FROM n_cal
    ),
    thr AS (
        SELECT k.nc, k.kk, r.cents AS threshold
        FROM k JOIN (
            SELECT cents,
                   row_number() OVER (ORDER BY cents, event_id) AS rn
            FROM cal
        ) r ON r.rn = k.kk
    )
    SELECT t.nc AS n_cal, t.kk AS k, t.threshold,
           count(*) AS n_test,
           CAST(sum(CASE WHEN tst.cents <= t.threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_covered,
           CAST(sum(CASE WHEN tst.cents <= t.threshold THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS coverage
    FROM tst CROSS JOIN thr t
    GROUP BY t.nc, t.kk, t.threshold
    """,
)
def q_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction calibration (Vovk et al.; the
    distribution-free coverage guarantee used to put prediction
    intervals on any scorer): on a calibration split, the threshold is
    the k-th smallest nonconformity score with k = ceil((n+1)(1-a))
    for a=0.1; the held-out split then empirically verifies ~90%
    coverage. Scores are the events' value column on the cents grid;
    the splits are the deterministic even/odd event_id halves.

    Exactness: k is integer arithmetic (ceil via (m*9+9)//10); the
    threshold is an EXACT order statistic — the row whose global rank
    equals k under the total order (cents, event_id) — not an
    approximate percentile, so both engines pick the identical row;
    coverage is one integer-ratio division.

    Scale: the global rank is `distributed_cumulative`; the k-th-row
    filter reduces to ONE row that broadcasts onto the test side's
    scalar aggregate. No sort, no single-partition exchange.
    """
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
    )
    cal = ev.filter(F.col("event_id") % 2 == 0)
    tst = ev.filter(F.col("event_id") % 2 == 1)
    nc = cal.agg(F.count(F.lit(1)).alias("nc")).select(
        "nc",
        F.expr(f"CAST(((nc + 1) * {_CONF_ALPHA_NUM} + 9) div 10 AS BIGINT)")
        .alias("kk"),
    )
    ranked = distributed_cumulative(cal, ["cents", "event_id"], out_col="rn")
    thr = (
        ranked.join(F.broadcast(nc), F.col("rn") == F.col("kk"))
        .select("nc", "kk", F.col("cents").alias("threshold"))
    )
    return (
        tst.crossJoin(F.broadcast(thr))
        .groupBy(F.col("nc").alias("n_cal"), F.col("kk").alias("k"), "threshold")
        .agg(
            F.count(F.lit(1)).alias("n_test"),
            F.sum(
                F.when(F.col("cents") <= F.col("threshold"), 1).otherwise(0)
            ).alias("n_covered"),
        )
        .withColumn(
            "coverage",
            F.col("n_covered").cast("double") / F.col("n_test").cast("double"),
        )
    )


# ----------------------------------------------------- RFM segmentation


@query(
    "q_rfm",
    oracle="""
    WITH o AS (
        SELECT o_custkey, epoch_ms(o_orderdate) AS ms,
               CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        FROM orders
    ),
    g AS (SELECT max(ms) AS gmax FROM o),
    cust AS (
        SELECT o_custkey,
               CAST((g.gmax - max(ms)) // 86400000 AS BIGINT) AS r_days,
               count(*) AS freq,
               CAST(sum(cents) AS BIGINT) AS monetary
        FROM o CROSS JOIN g GROUP BY o_custkey, g.gmax
    ),
    er AS (
        SELECT max(r_days) AS edge FROM (
            SELECT r_days,
                   ((row_number() OVER (ORDER BY r_days, o_custkey) - 1) * 5)
                     // (count(*) OVER ()) AS b
            FROM cust
        ) WHERE b <= 3 GROUP BY b
    ),
    ef AS (
        SELECT max(freq) AS edge FROM (
            SELECT freq,
                   ((row_number() OVER (ORDER BY freq, o_custkey) - 1) * 5)
                     // (count(*) OVER ()) AS b
            FROM cust
        ) WHERE b <= 3 GROUP BY b
    ),
    em AS (
        SELECT max(monetary) AS edge FROM (
            SELECT monetary,
                   ((row_number() OVER (ORDER BY monetary, o_custkey) - 1) * 5)
                     // (count(*) OVER ()) AS b
            FROM cust
        ) WHERE b <= 3 GROUP BY b
    )
    SELECT c.o_custkey, c.r_days, c.freq, c.monetary,
           (SELECT count(*) FROM er e WHERE c.r_days > e.edge) AS r_bin,
           (SELECT count(*) FROM ef e WHERE c.freq > e.edge) AS f_bin,
           (SELECT count(*) FROM em e WHERE c.monetary > e.edge) AS m_bin
    FROM cust c
    """,
)
def q_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation — the classic customer-value model: per
    customer, Recency (days since last order), Frequency (order
    count), Monetary (lifetime spend), each discretized into quintile
    bins by the SAME exact-order-statistic edge machinery as the drift
    family (operators/binning.py). Downstream marketing segments are
    string-concats of the three bins; the bins are the checkable core.

    Determinism: recency is integer day arithmetic from epoch-ms
    (Spark `div` = DuckDB `//`), spend sits on the cents grid, and all
    three edge sets are exact rank-derived order statistics — no
    approximate percentile anywhere, so both engines bin identically
    including boundary ties (strictly-greater rule).

    Scale: one hash aggregate to |customers| rows; each metric's edge
    derivation is a `distributed_cumulative` rank over that bounded
    relation; the three ≤4-row edge tables broadcast back. The orders
    fact is scanned once.
    """
    from ..functions.time import epoch_ms
    from ..operators.binning import assign_bin_by_edges, reference_edges

    o = _t(spark, sf_dir, "orders").select(
        "o_custkey",
        epoch_ms("o_orderdate").alias("ms"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    g = o.agg(F.max("ms").alias("gmax"))
    cust = (
        o.groupBy("o_custkey")
        .agg(
            F.max("ms").alias("last_ms"),
            F.count(F.lit(1)).alias("freq"),
            F.sum("cents").alias("monetary"),
        )
        .crossJoin(F.broadcast(g))
        .select(
            "o_custkey",
            F.expr("CAST((gmax - last_ms) div 86400000 AS BIGINT)").alias(
                "r_days"
            ),
            "freq",
            "monetary",
        )
        # SEVEN consumers (3 edge derivations x 2 internal passes each
        # + the assignment chain) re-run the orders scan + per-customer
        # aggregate otherwise — materialize the |customers|-row
        # relation once. At sf0.1 the wall time is unchanged (the query
        # is bound by ~7 sequential job submissions, not compute), but
        # at scale this converts 7 fact scans into 1 + 6 reads of a
        # bounded relation (same rationale as q_eval_metrics's `picked`)
        .localCheckpoint()
    )
    er = reference_edges(cust, "r_days", "o_custkey", n_bins=5)
    ef = reference_edges(cust, "freq", "o_custkey", n_bins=5)
    em = reference_edges(cust, "monetary", "o_custkey", n_bins=5)
    out = assign_bin_by_edges(cust, er, "r_days", out="r_bin")
    out = assign_bin_by_edges(out, ef, "freq", out="f_bin")
    out = assign_bin_by_edges(out, em, "monetary", out="m_bin")
    return out.select(
        "o_custkey", "r_days", "freq", "monetary", "r_bin", "f_bin", "m_bin"
    )


# ------------------------------------------------- ALS user-factor step

from ..operators.als import ALS_LAMBDA as _ALS_LAMBDA  # noqa: E402 — the
# oracle f-string below must bake the SAME ridge weight the shared
# solve (operators/als.py) applies


@query(
    "q_als_step",
    oracle=f"""
    WITH fac AS (
        SELECT p_partkey,
               CAST(p_partkey % 7 AS BIGINT) - 3 AS f1,
               CAST((p_partkey * 31) % 11 AS BIGINT) - 5 AS f2,
               CAST((p_partkey * 17) % 5 AS BIGINT) - 2 AS f3
        FROM part
    ),
    inter AS (
        SELECT o.o_custkey, f.f1, f.f2, f.f3,
               CAST(l.l_quantity AS BIGINT) AS r
        FROM lineitem l
        JOIN orders o ON l.l_orderkey = o.o_orderkey
        JOIN fac f ON l.l_partkey = f.p_partkey
    ),
    s AS (
        SELECT o_custkey, count(*) AS n_items,
               CAST(sum(f1 * f1) AS HUGEINT) AS a11s,
               CAST(sum(f1 * f2) AS HUGEINT) AS a12,
               CAST(sum(f1 * f3) AS HUGEINT) AS a13,
               CAST(sum(f2 * f2) AS HUGEINT) AS a22s,
               CAST(sum(f2 * f3) AS HUGEINT) AS a23,
               CAST(sum(f3 * f3) AS HUGEINT) AS a33s,
               CAST(sum(f1 * r) AS HUGEINT) AS b1,
               CAST(sum(f2 * r) AS HUGEINT) AS b2,
               CAST(sum(f3 * r) AS HUGEINT) AS b3
        FROM inter GROUP BY o_custkey
    ),
    a AS (
        SELECT o_custkey, n_items,
               a11s + {_ALS_LAMBDA} * n_items AS a11, a12, a13,
               a22s + {_ALS_LAMBDA} * n_items AS a22, a23,
               a33s + {_ALS_LAMBDA} * n_items AS a33, b1, b2, b3
        FROM s
    ),
    m AS (
        SELECT *,
               a22 * a33 - a23 * a23 AS m11,
               a12 * a33 - a23 * a13 AS m12,
               a12 * a23 - a22 * a13 AS m13
        FROM a
    ),
    d AS (
        SELECT o_custkey, n_items,
               a11 * m11 - a12 * m12 + a13 * m13 AS det,
               b1 * m11 - a12 * (b2 * a33 - a23 * b3)
                        + a13 * (b2 * a23 - a22 * b3) AS det1,
               a11 * (b2 * a33 - a23 * b3) - b1 * m12
                        + a13 * (a12 * b3 - b2 * a13) AS det2,
               a11 * (a22 * b3 - b2 * a23) - a12 * (a12 * b3 - b2 * a13)
                        + b1 * m13 AS det3
        FROM m
    )
    SELECT o_custkey, n_items,
           CASE WHEN det = 0 THEN NULL
                ELSE CAST(det1 AS DOUBLE) / CAST(det AS DOUBLE) END AS p1,
           CASE WHEN det = 0 THEN NULL
                ELSE CAST(det2 AS DOUBLE) / CAST(det AS DOUBLE) END AS p2,
           CASE WHEN det = 0 THEN NULL
                ELSE CAST(det3 AS DOUBLE) / CAST(det AS DOUBLE) END AS p3
    FROM d
    """,
)
def q_als_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One ALS user-factor half-step (Zhou et al. 2008, the
    "Large-scale Parallel Collaborative Filtering" normal-equations
    form): with the k=3 ITEM factor table held fixed, each user's
    factor vector solves (Qu'Qu + lambda*n_u*I) p_u = Qu'r_u over that
    user's rated items. Interactions are (customer, part, quantity)
    from lineitem x orders; item factors are a deterministic small-
    integer grid derived from the part key (standing in for the
    previous iteration's factors, which a real pipeline would read as
    a table — the plan shape is identical: a broadcast equi-join).

    Exactness: factors and ratings are integers, so the six Gram sums
    and three right-hand sides accumulate as DECIMAL(38,0)/HUGEINT —
    exact at any scale and summation order. The 3x3 solve is Cramer's
    rule: every determinant is exact integer algebra, and each emitted
    factor is ONE IEEE division of two exact integers (bit-identical
    cross-engine, the q_linear_fit contract). The lambda*n_u ridge
    keeps A positive-definite so det > 0, but det = 0 still yields
    NULL on both engines rather than a platform-dependent infinity.

    Scale (the actual ALS-on-Spark layout): the ratings fact shuffles
    ONCE on the join key, the item-factor table joins BROADCAST
    (|items| << |ratings|), and the per-user normal equations are one
    map-side-combined hash aggregate to k*(k+3)/2 + 1 numbers per
    user — no per-user matrix materialization, no driver round-trip.
    The k=3 Cramer expansion is the same closed form production ALS
    uses for small k; larger k swaps in a per-row Cholesky without
    changing the data layout.

    Stage implementations are shared with the incremental maintenance
    path (operators/als.py; streaming/als.py folds micro-batch
    gram_sums deltas into a VersionedTable — additive exact integers,
    so the streamed factors are bit-identical to this batch query,
    proven in tests/test_streaming.py)."""
    from ..operators.als import gram_sums, item_factor_grid, solve_factors

    fac = item_factor_grid(_t(spark, sf_dir, "part"))
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", F.col("l_quantity").cast("long").alias("r")
    )
    od = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    inter = li.join(od, li.l_orderkey == od.o_orderkey).join(
        F.broadcast(fac), li.l_partkey == fac.p_partkey
    )
    return solve_factors(gram_sums(inter))


# ------------------------------------------------------------- slope one

_SO_MIN_SUPPORT = 2   # minimum co-rating users behind a usable deviation
_SO_TOPK = 3          # recommendations emitted per sampled user
_SO_USER_MOD = 100    # target users: o_custkey % _SO_USER_MOD == 1


@query(
    "q_slope_one",
    oracle=f"""
    WITH ratings AS (
        SELECT o.o_custkey AS u, l.l_partkey AS i,
               CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS r
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        GROUP BY 1, 2
    ),
    capped AS (
        SELECT u, i, r FROM (
            SELECT *, row_number() OVER (PARTITION BY u ORDER BY i) AS gr
            FROM ratings
        ) WHERE gr <= {_BASKET_CAP}
    ),
    targets AS (
        SELECT u, i, r FROM ratings WHERE u % {_SO_USER_MOD} = 1
    ),
    t_items AS (SELECT DISTINCT i FROM targets),
    dev AS (
        SELECT a.i AS ia, b.i AS ib, count(*) AS cnt,
               CAST(sum(a.r - b.r) AS HUGEINT) AS sd
        FROM capped a
        JOIN (SELECT c.* FROM capped c JOIN t_items USING (i)) b
          ON a.u = b.u AND a.i != b.i
        GROUP BY 1, 2
        HAVING count(*) >= {_SO_MIN_SUPPORT}
    ),
    pred AS (
        SELECT t.u, d.ia AS j,
               CAST(sum(d.sd + CAST(t.r AS HUGEINT) * d.cnt) AS HUGEINT)
                 AS num,
               CAST(sum(d.cnt) AS BIGINT) AS den
        FROM targets t JOIN dev d ON d.ib = t.i
        WHERE NOT EXISTS (
            SELECT 1 FROM ratings r2 WHERE r2.u = t.u AND r2.i = d.ia
        )
        GROUP BY 1, 2
    )
    SELECT u, j, den AS support,
           round(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS pred
    FROM (
        SELECT *, row_number() OVER (
                   PARTITION BY u
                   ORDER BY CAST(num AS DOUBLE) / CAST(den AS DOUBLE) DESC, j
               ) AS rk
        FROM pred
    )
    WHERE rk <= {_SO_TOPK}
    """,
)
def q_slope_one(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted Slope One recommender (Lemire & Maclachlan, SDM 2005) —
    the item-item deviation baseline every recsys eval includes beside
    the ALS factor model (q_als_step): dev(j,i) = Σ_u (r_uj − r_ui)/cnt
    over users rating both, and the prediction for user u on unseen
    item j is the cnt-weighted average of (dev(j,i) + r_ui) over u's
    rated items i. Emits the top-3 predictions per sampled user.

    Determinism, house style: the weighted average NEVER sums floats —
    Σ cnt·(dev + r) = Σ (sd + r·cnt) is exact HUGEINT/DECIMAL algebra
    (sd = the raw rating-difference sum), so pred = num/den is ONE IEEE
    division of exact integers: bit-identical cross-engine, ranked
    with a (pred DESC, item) total order, displayed at 6dp.

    Scale: the deviation fan explodes pairs WITHIN a user's basket,
    capped at _BASKET_CAP items (cap_group_size — same guard as
    q_item_cooccurrence; oracles mirror the cap row-for-row), so a
    pathological 10k-item user costs cap² pairs, never |basket|²; the
    deviation table is |item-pair|-bounded with min-support pruning;
    prediction is two hash joins keyed on item then (user, item); the
    per-user top-k is a hash-partitioned window, never a global sort.
    """
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", F.col("l_quantity").cast("long").alias("q")
    )
    od = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    ratings = (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .groupBy(
            F.col("o_custkey").alias("u"), F.col("l_partkey").alias("i")
        )
        .agg(F.sum("q").alias("r"))
        # two consumers: both pair sides (via capped) and targets
        .localCheckpoint()
    )
    # three consumers (dev-join probe, anti-join build, t_items):
    # materialize the 1/_SO_USER_MOD user sample once
    targets = ratings.filter(
        F.col("u") % _SO_USER_MOD == 1
    ).localCheckpoint()
    # deviation rows are only ever consumed joined on ib ∈ the target
    # users' item sets, so the b-side of the pair fan is bounded to
    # those items BEFORE the explosion (provably identical output —
    # the q_minhash_fidelity candidate-bounding move). cnt/sd still
    # aggregate over ALL co-rating users of a retained pair.
    #
    # Pair fan is JOIN-FREE since r12 (the _basket_pairs move): the
    # basket cap folds into slice(sort_array(collect_list(struct)))
    # — identical to cap_group_size's first-cap-rows-by-i multiset
    # because (u, i) is unique in `ratings` — the t_items bound
    # becomes a broadcast flag join BEFORE the collect, and the a×b
    # fan explodes map-side from ONE u-keyed shuffle. The previous
    # shape shuffled the capped relation twice (cap window + both
    # self-join sides) with no runtime exchange reuse, plus a
    # checkpoint job. Measured at sf0.1 (min-of-3 count, canary
    # brackets on record): 6.22 s → 3.99 s.
    t_items = targets.select("i").distinct()
    flagged = ratings.join(
        F.broadcast(t_items.withColumn("_t", F.lit(True))), "i", "left"
    )
    baskets = flagged.groupBy("u").agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct("i", "r", "_t"))
            ),
            1,
            _BASKET_CAP,
        ).alias("items")
    )
    fan = (
        baskets.select(F.explode("items").alias("a"), "items")
        .select(
            "a",
            F.explode(
                F.filter("items", lambda x: x["_t"].isNotNull())
            ).alias("b"),
        )
        .where(F.col("a.i") != F.col("b.i"))
    )
    dev = (
        fan.groupBy(F.col("a.i").alias("ia"), F.col("b.i").alias("ib"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(
                (F.col("a.r") - F.col("b.r")).cast("decimal(38,0)")
            ).alias("sd"),
        )
        .filter(F.col("cnt") >= _SO_MIN_SUPPORT)
    )
    # the NOT EXISTS probe only ever sees u ∈ targets (the left side's
    # users are the sampled targets), and ratings restricted to target
    # users IS `targets` — so the anti-join build side shrinks by
    # _SO_USER_MOD× (provably identical output, same move as the
    # dev-side semi-bound). Join strategy stays AQE's call: at bench
    # scale the shrunken sides broadcast; at extreme scale a 1% user
    # sample can exceed the broadcast threshold and must be allowed
    # to shuffle — a forced hint here would OOM the driver.
    cand = (
        targets.join(dev, F.col("ib") == F.col("i"))
        .join(
            targets.select(F.col("u").alias("u2"), F.col("i").alias("j2")),
            (F.col("u") == F.col("u2")) & (F.col("ia") == F.col("j2")),
            "left_anti",
        )
        .groupBy("u", F.col("ia").alias("j"))
        .agg(
            F.sum(
                F.col("sd")
                + F.col("r").cast("decimal(38,0)")
                * F.col("cnt").cast("decimal(38,0)")
            ).alias("num"),
            F.sum("cnt").cast("long").alias("den"),
        )
    )
    pred = F.col("num").cast("double") / F.col("den").cast("double")
    w = Window.partitionBy("u").orderBy(pred.desc(), F.col("j").asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _SO_TOPK)
        .select(
            "u",
            "j",
            F.col("den").alias("support"),
            F.round(pred, 6).alias("pred"),
        )
    )


# ------------------------------------------------- isotonic calibration

_ISO_BINS = 20


@query(
    "q_isotonic_calibration",
    oracle=f"""
    WITH scored AS (
        SELECT CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y,
               CAST(round((CAST(embedding[1] AS DOUBLE)
                           + CAST(embedding[2] AS DOUBLE) * 0.5)
                          * {_SCORE_SCALE}) AS BIGINT) AS si,
               vec_id
        FROM embeddings
    ),
    nn AS (SELECT count(*) AS big_n FROM scored),
    ranked AS (
        SELECT y, si, row_number() OVER (ORDER BY si, vec_id) AS rnk
        FROM scored
    ),
    per_bin AS (
        SELECT ((rnk - 1) * {_ISO_BINS}) // (SELECT big_n FROM nn) AS bin,
               count(*) AS n,
               CAST(sum(y) AS BIGINT) AS s_y,
               CAST(sum(si) AS BIGINT) AS s_si
        FROM ranked GROUP BY 1
    ),
    pb AS (
        SELECT bin, n, s_y, s_si,
               CAST(sum(s_y) OVER (ORDER BY bin) AS BIGINT) AS cy,
               CAST(sum(n) OVER (ORDER BY bin) AS BIGINT) AS cn
        FROM per_bin
    ),
    pairs AS (
        SELECT j.bin AS jb, k.bin AS kb,
               CAST(k.cy - (j.cy - j.s_y) AS DOUBLE)
                 / CAST(k.cn - (j.cn - j.n) AS DOUBLE) AS avg_jk
        FROM pb j JOIN pb k ON k.bin >= j.bin
    ),
    mins AS (
        SELECT i.bin AS ib, p.jb, min(p.avg_jk) AS m
        FROM per_bin i
        JOIN pairs p ON p.jb <= i.bin AND p.kb >= i.bin
        GROUP BY 1, 2
    ),
    fit AS (SELECT ib AS bin, max(m) AS g FROM mins GROUP BY 1)
    SELECT b.bin, b.n,
           CAST(b.s_si AS DOUBLE)
             / CAST(b.n * {_SCORE_SCALE} AS DOUBLE) AS mean_score,
           CAST(b.s_y AS DOUBLE) / CAST(b.n AS DOUBLE) AS frac_pos,
           round(f.g, 6) AS iso_fit
    FROM per_bin b JOIN fit f ON f.bin = b.bin
    """,
)
def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Isotonic regression calibration (pool-adjacent-violators) over
    score bins — the nonparametric calibration map beside q_calibration
    (threshold sweep) and q_reliability_ece (calibration AUDIT): PAV
    fits the best monotone non-decreasing approximation to the per-bin
    positive rate, which is how detection confidences become usable
    probabilities without assuming Platt's sigmoid shape (Zadrozny &
    Elkan 2002; the reference thresholds raw scores in detection.py's
    calibration pass — this is the principled version of that map).

    PAV without the sequential pooling loop: on B pre-aggregated bins
    the PAV solution has the closed minimax form g(i) = max_{{j≤i}}
    min_{{k≥i}} avg(y over bins j..k) (Robertson-Wright-Dykstra 1988,
    Thm 1.4.4) — three bounded relational passes (pairs, per-(i,j)
    min, per-i max) instead of an inherently serial pool-merge loop.
    That's what makes it SQL-expressible AND distributable; at B = 20
    the pair/triple relations are ≤ B² and B³ rows on BOTH engines.

    Determinism: bins are rank-equal-count (distributed_cumulative,
    ties broken by vec_id); per-bin y/score sums are exact integers on
    the 1e-9 si grid; every interval average is ONE IEEE division of
    exact integers (bit-identical), so min/max over those doubles
    match cross-engine; iso_fit rounds at 6dp only for display. The
    fitted curve is monotone by construction — pinned by the unit
    test, as is equality with a reference sequential-PAV on planted
    non-monotone bins.

    Scale: the N-row table reduces to B = 20 rows before any O(B²)
    work (the ECE shape); ranking is the two-pass range-partitioned
    cumulative (no single-partition window over data); the bin-level
    prefix sums and the triangular pair/index sets are explode +
    equi-join on a 20-row broadcastable relation (no window, no
    nested loop) — constant cost at ANY corpus size.
    """
    e = _t(spark, sf_dir, "embeddings")
    scored = e.select(
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("y"),
        F.round(
            (
                F.element_at("embedding", 1).cast("double")
                + F.element_at("embedding", 2).cast("double") * 0.5
            )
            * _SCORE_SCALE
        )
        .cast("long")
        .alias("si"),
        "vec_id",
    )
    nn = scored.agg(F.count(F.lit(1)).alias("big_n"))
    ranked = distributed_cumulative(scored, ["si", "vec_id"], out_col="rnk")
    per_bin = (
        ranked.crossJoin(F.broadcast(nn))
        .select(
            F.expr(f"((rnk - 1) * {_ISO_BINS}) div big_n").alias("bin"),
            "y",
            "si",
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("s_y"),
            F.sum("si").alias("s_si"),
        )
        # three consumers (prefix table, the i-axis, the output join):
        # a 20-row relation — materialize once
        .localCheckpoint()
    )
    from ..operators.stats import isotonic_fit

    fit = isotonic_fit(per_bin)
    return per_bin.join(
        F.broadcast(fit), per_bin.bin == fit.ib
    ).select(
        "bin",
        "n",
        (
            F.col("s_si").cast("double")
            / (F.col("n") * _SCORE_SCALE).cast("double")
        ).alias("mean_score"),
        (F.col("s_y").cast("double") / F.col("n").cast("double")).alias(
            "frac_pos"
        ),
        F.round(F.col("g"), 6).alias("iso_fit"),
    )


# -------------------------------------------------- Theil-Sen robust slope

_TS_CAP = 120  # rows kept per brand before the O(cap²) pair fan


@query(
    "q_theil_sen",
    oracle=f"""
    WITH pt AS (
        SELECT p_brand, p_partkey,
               CAST(p_size AS BIGINT) AS x,
               CAST(round(p_retailprice * 100, 0) AS BIGINT) AS y
        FROM part
    ),
    capped AS (
        SELECT p_brand, x, y FROM (
            SELECT *, row_number() OVER (
                       PARTITION BY p_brand ORDER BY x, y, p_partkey
                   ) AS rn
            FROM pt
        ) WHERE rn <= {_TS_CAP}
    ),
    slopes AS (
        SELECT a.p_brand,
               CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS s
        FROM capped a JOIN capped b
          ON a.p_brand = b.p_brand AND a.x < b.x
    ),
    ranked AS (
        SELECT p_brand, s,
               row_number() OVER (PARTITION BY p_brand ORDER BY s) AS rn,
               count(*) OVER (PARTITION BY p_brand) AS m
        FROM slopes
    )
    SELECT p_brand, CAST(max(m) AS BIGINT) AS n_pairs,
           round(avg(s), 6) AS ts_slope_cents
    FROM ranked
    WHERE rn IN ((m + 1) // 2, (m + 2) // 2)
    GROUP BY p_brand
    """,
)
def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil-Sen robust slope per group — the median of all pairwise
    slopes (Theil 1950, Sen 1968): the outlier-resistant companion to
    q_linear_fit's OLS (29% breakdown point vs OLS's zero; the
    standard robust trend estimate for pricing/drift curves where one
    bad row wrecks least squares).

    Determinism: every pairwise slope is ONE IEEE division of exact
    integers (x integer grid, y cents grid) — bit-identical doubles
    cross-engine — and the median picks by VALUE rank, so slope ties
    cannot change the selected value; even pair-counts average the two
    middles (one 2-element addition: IEEE-commutative, then one
    halving), rounded 6dp. Same-x pairs are excluded on both engines
    (undefined slope). The capped prefix is made engine-stable by the
    (x, y, p_partkey) total order — the q_slope_one basket-cap rule.

    Scale: the full estimator is O(|group|²) — a scale-killer on an
    unbounded group, so the pair fan runs on a `cap_group_size` prefix
    ({_TS_CAP} rows → ≤{_TS_CAP * (_TS_CAP - 1) // 2} pairs per group,
    oracle mirrored row-for-row); the pair join is brand-equi
    (hash-partitioned, never cross-group); the median window
    partitions by brand over the bounded pair relation. This is the
    textbook trade every distributed Theil-Sen makes (Sen's estimator
    on a bounded sample keeps the breakdown guarantee on the sample).
    """
    pt = _t(spark, sf_dir, "part").select(
        "p_brand",
        "p_partkey",
        F.col("p_size").cast("long").alias("x"),
        F.round(F.col("p_retailprice") * 100, 0).cast("long").alias("y"),
    )
    return theil_sen_from_points(pt)


def theil_sen_from_points(pt: DataFrame) -> DataFrame:
    """Theil-Sen median pairwise slope from (p_brand, p_partkey, x, y)
    integer-grid points — see q_theil_sen for semantics/determinism."""
    # Join-free pair fan (r12, the _basket_pairs move): the capped
    # prefix folds into slice(sort_array(collect_list(struct(x, y,
    # p_partkey))), 1, cap) — the identical first-cap multiset under
    # the same (x, y, p_partkey) total order — and the a×b slope fan
    # explodes map-side from one brand-keyed shuffle, replacing the
    # cap window + checkpoint job + self-join (whose capped subtree
    # ran on both sides with no runtime exchange reuse). Measured at
    # sf0.1, min-of-3 count action, min over two alternating A/B
    # windows: 1.61 s → 0.90 s (noop sink 1.11 s → 0.71 s).
    capped = pt.groupBy("p_brand").agg(
        F.slice(
            F.sort_array(
                F.collect_list(F.struct("x", "y", "p_partkey"))
            ),
            1,
            _TS_CAP,
        ).alias("items")
    )
    slopes = (
        capped.select("p_brand", F.explode("items").alias("a"), "items")
        .select("p_brand", "a", F.explode("items").alias("b"))
        .where(F.col("a.x") < F.col("b.x"))
        .select(
            "p_brand",
            (
                (F.col("b.y") - F.col("a.y")).cast("double")
                / (F.col("b.x") - F.col("a.x")).cast("double")
            ).alias("s"),
        )
    )
    w = Window.partitionBy("p_brand").orderBy("s")
    wc = Window.partitionBy("p_brand")
    ranked = slopes.select(
        "p_brand",
        "s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wc).alias("m"),
    )
    mid_lo = F.floor((F.col("m") + 1) / 2)
    mid_hi = F.floor((F.col("m") + 2) / 2)
    return (
        ranked.filter((F.col("rn") == mid_lo) | (F.col("rn") == mid_hi))
        .groupBy("p_brand")
        .agg(
            F.max("m").cast("long").alias("n_pairs"),
            F.round(F.avg("s"), 6).alias("ts_slope_cents"),
        )
    )
