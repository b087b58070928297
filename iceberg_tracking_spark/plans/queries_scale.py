"""Scale-path and engine-extension queries.

The operators here are the ones a 100 TB training-data pipeline leans
on beyond the reference's own inventory (SURVEY §2.8, BASELINE.json
north star): LSH-bucketed approximate nearest neighbor (the scale form
of the brute-force cosine search), sliding event-time windows, seeded
k-fold splitting (reference detection.py:493-516 KFold),
rank-sum ROC-AUC (reference embedding.py:1752-1756 sklearn AUC re-read
as a relational program), CUBE/grouping-sets, calendar rollups, and
BPE-ish token accounting for quality scoring.

Oracle portability notes: hex→int is Spark `conv(x,16,10)` vs DuckDB
`('0x'||x)::BIGINT`; every dot product folds left-to-right on both
engines (Spark `aggregate`, DuckDB `list_reduce`) so LSH sign bits are
bit-identical; grouping ids compose DuckDB `GROUPING(a)*2+GROUPING(b)`
to match Spark `grouping_id()` bit order (first column = MSB).
"""

from __future__ import annotations

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from ..operators.joins import asof_join
from ..operators.windows import distributed_cumulative
from ..operators.similarity import (
    DEFAULT_BITS,
    duck_cosine_sql,
    duck_sig_sql,
    hyperplane_sql_literals,
    lsh_bucket_topk,
)
from ..sources.tables import load_table, scatter
from ..functions.time import day_id
from .registry import query

from ..schemas import EMB_DIM as _DIM  # noqa: E402  (single source)


def _t(spark: SparkSession, sf_dir: str, name: str):
    return load_table(spark, sf_dir, name)


# ------------------------------------------------- similarity: scale path

def _ann_oracle() -> str:
    planes = hyperplane_sql_literals(DEFAULT_BITS, _DIM)
    plane_cols = ", ".join(f"{p} AS h{b}" for b, p in enumerate(planes))
    return f"""
    WITH p AS (SELECT {plane_cols}),
    v AS (
        SELECT vec_id, embedding::DOUBLE[] AS e,
               CAST({duck_sig_sql(_DIM)} AS BIGINT) AS sig
        FROM embeddings, p
    ),
    q AS (SELECT vec_id AS qid, e AS qe, sig FROM v WHERE vec_id % 25 = 0),
    sims AS (
        SELECT q.qid, v.vec_id AS nid,
               round({duck_cosine_sql('q.qe', 'v.e', _DIM)}, 6) AS sim
        FROM q JOIN v ON v.sig = q.sig AND v.vec_id <> q.qid
    )
    SELECT qid, nid, sim FROM (
        SELECT qid, nid, sim,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY sim DESC, nid) AS rn
        FROM sims
    ) WHERE rn <= 3
    """


@query("q_ann_lsh", oracle=_ann_oracle())
def q_ann_lsh(spark, sf_dir):
    """LSH-bucketed approximate nearest neighbor — the 100 TB form of
    q_cosine_topk: 8-bit sign-random-projection signatures, candidates
    restricted to the query's bucket (equi-join on sig), exact cosine
    re-rank inside the bucket. No all-pairs comparison ever happens;
    the only shuffle is the signature join."""
    v = scatter(
        _t(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
    )
    return lsh_bucket_topk(
        v, dim=_DIM, k=3, query_pred=F.col("vec_id") % 25 == 0
    )


def _ann_ivf_oracle() -> str:
    return f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id % 50 = 1),
    scored AS (
        SELECT v.vec_id, v.e, c.cid,
               {duck_cosine_sql('v.e', 'c.ce', _DIM)} AS csim
        FROM v, c
    ),
    assigned AS (
        SELECT vec_id, cid, e FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY csim DESC, cid) AS rn
            FROM scored
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS qid, e AS qe, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY csim DESC, cid) AS rn
            FROM scored WHERE vec_id % 25 = 0
        ) WHERE rn <= 2
    ),
    sims AS (
        SELECT p.qid, a.vec_id AS nid,
               round({duck_cosine_sql('p.qe', 'a.e', _DIM)}, 6) AS sim
        FROM probes p JOIN assigned a
          ON a.cid = p.cid AND a.vec_id <> p.qid
    )
    SELECT qid, nid, sim FROM (
        SELECT qid, nid, sim,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY sim DESC, nid) AS rn
        FROM sims
    ) WHERE rn <= 3
    """


@query("q_ann_ivf", oracle=_ann_ivf_oracle())
def q_ann_ivf(spark, sf_dir):
    """ANN top-k via an IVF coarse quantizer (operators/similarity.py:
    ivf_topk) — the cluster-partitioned scale path next to the sign-LSH
    one (q_ann_lsh): data-sampled centroids (vec_id % 50 = 1), argmax
    assignment against the broadcast centroid table, nprobe=2 cluster
    probing, exact cosine re-rank. All dot products fold left-to-right
    so the assignment boundary is bit-identical to the DuckDB oracle."""
    from ..operators.similarity import ivf_topk

    v = scatter(
        _t(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
    )
    return ivf_topk(
        v,
        k=3,
        query_pred=F.col("vec_id") % 25 == 0,
        centroid_pred=F.col("vec_id") % 50 == 1,
        nprobe=2,
    )


_PQ_NSUB = 8
_PQ_KSUB = 16
_PQ_SUBDIM = _DIM // _PQ_NSUB
_PQ_STRIDE = 31


def _pq_shared_ctes() -> str:
    """Shared DuckDB CTEs: vectors, subspace index table, seed-sliced
    sub-codebooks, and the per-(vector, subspace) PQ assignment —
    mirrors operators/similarity.pq_codebook + pq_encode exactly."""
    from ..operators.clustering import duck_sqdist_sql

    d = duck_sqdist_sql("s.sub", "c.ce", _PQ_SUBDIM)
    return f"""
    v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    sps AS (SELECT unnest(range(0, {_PQ_NSUB})) AS sp),
    seeds AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, e
        FROM (SELECT vec_id, e FROM v WHERE vec_id % {_PQ_STRIDE} = 0
              ORDER BY vec_id LIMIT {_PQ_KSUB})
    ),
    cb AS (
        SELECT sps.sp, seeds.cid,
               list_slice(seeds.e, sps.sp * {_PQ_SUBDIM} + 1,
                          sps.sp * {_PQ_SUBDIM} + {_PQ_SUBDIM}) AS ce
        FROM seeds CROSS JOIN sps
    ),
    subs AS (
        SELECT v.vec_id, sps.sp,
               list_slice(v.e, sps.sp * {_PQ_SUBDIM} + 1,
                          sps.sp * {_PQ_SUBDIM} + {_PQ_SUBDIM}) AS sub
        FROM v CROSS JOIN sps
    ),
    codes AS (
        SELECT vec_id, sp, cid AS code, d AS sub_dist FROM (
            SELECT s.vec_id, s.sp, c.cid, {d} AS d,
                   row_number() OVER (PARTITION BY s.vec_id, s.sp
                                      ORDER BY {d} ASC, c.cid ASC) AS rn
            FROM subs s JOIN cb c ON s.sp = c.sp
        ) WHERE rn = 1
    )"""


@query(
    "q_pq_encode",
    oracle=f"""
    WITH {_pq_shared_ctes()}
    SELECT vec_id, sp, code, round(sub_dist, 6) AS sub_dist FROM codes
    """,
)
def q_pq_encode(spark, sf_dir):
    """Product-quantization encoding (Jégou et al. 2011, "Product
    Quantization for Nearest Neighbor Search"): split each 64-dim
    embedding into 8 subspaces, assign each slice to its nearest of 16
    seed-sliced sub-centroids — 8 small codes replace 64 doubles (~32x
    compression), which is what makes billion-vector ANN memory-
    feasible. One broadcast join against the 128-row codebook + hash
    argmin; left-fold distances keep the assignment boundary
    bit-identical to the oracle."""
    from ..operators.similarity import pq_codebook, pq_encode

    v = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cb = pq_codebook(
        v, _DIM, _PQ_NSUB, _PQ_KSUB, F.col("vec_id") % _PQ_STRIDE == 0
    )
    enc = pq_encode(v, cb, _DIM, _PQ_NSUB)
    return enc.select(
        "vec_id", "sp", "code", F.round("sub_dist", 6).alias("sub_dist")
    )


def _pq_lut_dist() -> str:
    from ..operators.clustering import duck_sqdist_sql

    return duck_sqdist_sql("s.sub", "c.ce", _PQ_SUBDIM)


@query(
    "q_pq_topk",
    oracle=f"""
    WITH {_pq_shared_ctes()},
    lut AS (
        SELECT s.vec_id AS qid, s.sp, c.cid AS code,
               {_pq_lut_dist()} AS d
        FROM subs s JOIN cb c ON s.sp = c.sp
        WHERE s.vec_id % 25 = 0
    ),
    folded AS (
        SELECT l.qid, k.vec_id,
               list_reduce(list(l.d ORDER BY l.sp), (x, y) -> x + y) AS adist
        FROM codes k JOIN lut l ON k.sp = l.sp AND k.code = l.code
        WHERE l.qid <> k.vec_id
        GROUP BY l.qid, k.vec_id
    )
    SELECT qid, vec_id AS nid, round(adist, 6) AS adist FROM (
        SELECT qid, vec_id, adist,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY round(adist, 6) ASC, vec_id ASC) AS rn
        FROM folded
    ) WHERE rn <= 5
    """,
)
def q_pq_topk(spark, sf_dir):
    """PQ asymmetric-distance (ADC) top-k search: queries are compared
    to database CODES through a per-query lookup table (query-slice ->
    sub-centroid distances), never to raw database vectors — at 100 TB
    the code table is the only corpus-sized relation (32x smaller than
    the embeddings) and the LUT is a broadcast. Partial distances are
    folded in subspace order (array_sort + left fold, mirroring
    `list_reduce(list(d ORDER BY sp))`) so the float total can't
    depend on shuffle arrival order."""
    from ..operators.similarity import pq_adc_topk, pq_codebook

    v = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cb = pq_codebook(
        v, _DIM, _PQ_NSUB, _PQ_KSUB, F.col("vec_id") % _PQ_STRIDE == 0
    )
    return pq_adc_topk(
        v, cb, _DIM, _PQ_NSUB, k=5, query_pred=F.col("vec_id") % 25 == 0
    )


def _ivfpq_oracle() -> str:
    """IVF coarse CTEs (cosine assignment, mirrors _ann_ivf_oracle) +
    PQ CTEs (_pq_shared_ctes) + candidate-bounded ADC ranking."""
    cos = duck_cosine_sql("v.e", "c.ce", _DIM)
    return f"""
    WITH {_pq_shared_ctes()},
    cc AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id % 50 = 1),
    coarse AS (
        SELECT v.vec_id, c.cid, {cos} AS csim
        FROM v CROSS JOIN cc c
    ),
    assigned AS (
        SELECT vec_id, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY csim DESC, cid) AS rn
            FROM coarse
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS qid, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY csim DESC, cid) AS rn
            FROM coarse WHERE vec_id % 25 = 0
        ) WHERE rn <= 2
    ),
    cand AS (
        SELECT p.qid, a.vec_id
        FROM probes p JOIN assigned a ON a.cid = p.cid
        WHERE p.qid <> a.vec_id
    ),
    lut AS (
        SELECT s.vec_id AS qid, s.sp, c.cid AS code, {_pq_lut_dist()} AS d
        FROM subs s JOIN cb c ON s.sp = c.sp
        WHERE s.vec_id % 25 = 0
    ),
    folded AS (
        SELECT cd.qid, cd.vec_id,
               list_reduce(list(l.d ORDER BY l.sp), (x, y) -> x + y) AS adist
        FROM cand cd
        JOIN codes k ON k.vec_id = cd.vec_id
        JOIN lut l ON l.qid = cd.qid AND l.sp = k.sp AND l.code = k.code
        GROUP BY cd.qid, cd.vec_id
    )
    SELECT qid, vec_id AS nid, round(adist, 6) AS adist FROM (
        SELECT qid, vec_id, adist,
               row_number() OVER (PARTITION BY qid
                                  ORDER BY round(adist, 6) ASC, vec_id ASC) AS rn
        FROM folded
    ) WHERE rn <= 5
    """


@query("q_ivfpq_topk", oracle=_ivfpq_oracle())
def q_ivfpq_topk(spark, sf_dir):
    """IVF-PQ search — the billion-vector production layout (FAISS
    IVFADC shape): the IVF coarse quantizer bounds WHICH vectors each
    query sees (nprobe=2 clusters), PQ codes bound WHAT is compared
    (LUT'd asymmetric distance over 8 codes, never raw vectors).
    Composes the two independently-oracle-proven pieces
    (`operators/similarity.ivfpq_topk`); corpus-sized relations are
    exactly the assignment and the code table, both linear."""
    from ..operators.similarity import ivfpq_topk, pq_codebook

    v = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cb = pq_codebook(
        v, _DIM, _PQ_NSUB, _PQ_KSUB, F.col("vec_id") % _PQ_STRIDE == 0
    )
    return ivfpq_topk(
        v, cb, _DIM, _PQ_NSUB, k=5,
        query_pred=F.col("vec_id") % 25 == 0,
        centroid_pred=F.col("vec_id") % 50 == 1,
        nprobe=2,
    )


# ------------------------------------------------------ windows / calendar

@query(
    "q_sliding_window",
    oracle="""
    SELECT ws, event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM (
        SELECT CAST(floor(epoch_ms(ts) / 1800000.0) AS BIGINT) * 1800
               - u.o * 1800 AS ws,
               event_type, value
        FROM events, (SELECT unnest([0, 1]) AS o) u
    )
    GROUP BY ws, event_type
    """,
)
def q_sliding_window(spark, sf_dir):
    """Sliding event-time windows (1 h width, 30 min slide): every event
    lands in exactly two windows. Spark's window() generator explodes
    window instances before the partial agg — the same plan shape
    Structured Streaming uses for sliding aggregations."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("ws"),
            "event_type",
            "n",
            "sum_value",
        )
    )


@query(
    "q_date_funcs",
    oracle="""
    SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
           CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
           CAST(month(o_orderdate) AS BIGINT) AS mon,
           count(*) AS n_orders,
           round(sum(o_totalprice), 2) AS revenue
    FROM orders
    GROUP BY year(o_orderdate), quarter(o_orderdate), month(o_orderdate)
    """,
)
def q_date_funcs(spark, sf_dir):
    """Calendar rollup: year/quarter/month extraction + revenue — the
    date-dimension path the MOT reference lacks (frame index is its
    only clock) but any warehouse engine needs."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("yr"),
            F.quarter("o_orderdate").cast("long").alias("qtr"),
            F.month("o_orderdate").cast("long").alias("mon"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
        )
    )


@query(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus) AS BIGINT)
             AS gid,
           count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
)
def q_cube(spark, sf_dir):
    """CUBE grouping sets over (returnflag, linestatus) with grouping
    ids — one pass producing all 2^2 aggregation levels (generalizes
    A11's per-sequence + COMBINED rollup)."""
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        )
        .select("l_returnflag", "l_linestatus", "gid", "n", "sum_qty")
    )


# --------------------------------------------------------- ML data prep

@query(
    "q_kfold",
    oracle="""
    SELECT fold, count(*) AS n, round(sum(o_totalprice), 2) AS sum_price
    FROM (
        SELECT ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
               % 5 AS fold,
               o_totalprice
        FROM orders
    )
    GROUP BY fold
    """,
)
def q_kfold(spark, sf_dir):
    """Seeded k-fold assignment (reference detection.py:493-516 KFold):
    fold = first 32 md5 bits of the key mod k. Hash-based so the split
    is stable under any row order or partitioning — the only correct
    way to fold at 100 TB (randomSplit depends on partition layout)."""
    o = _t(spark, sf_dir, "orders")
    fold = (
        F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 5
    )
    return (
        o.select(fold.alias("fold"), "o_totalprice")
        .groupBy("fold")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
        )
    )


@query(
    "q_auc",
    oracle="""
    WITH scored AS (
        SELECT CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y,
               round(embedding[1] + embedding[2] * 0.5, 9) AS score,
               vec_id
        FROM embeddings
    ),
    ranked AS (
        SELECT y, CAST(row_number() OVER (ORDER BY score, vec_id) AS DOUBLE)
               AS r
        FROM scored
    )
    SELECT round(
        (sum(CASE WHEN y = 1 THEN r ELSE 0 END)
         - (sum(y) * (sum(y) + 1)) / 2.0)
        / (sum(y) * (count(*) - sum(y))), 6) AS auc
    FROM ranked
    """,
)
def q_auc(spark, sf_dir):
    """ROC-AUC as a rank-sum (Mann-Whitney U) — the reference's
    embedding quality gate (embedding.py:1752-1756) re-read as a
    relational program, no sklearn. Score is a deterministic function
    of the vector; positives are labels ≥ 5; tie-break by vec_id keeps
    ranks engine-stable.

    Scale shape (r4 verdict fix): the naive global row_number window
    funnels the whole relation through Exchange SinglePartition; this
    uses `distributed_cumulative` (two-pass range-partitioned ranking)
    instead — identical ranks, zero single-partition exchanges."""
    e = _t(spark, sf_dir, "embeddings")
    scored = e.select(
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("y"),
        F.round(
            F.element_at("embedding", 1).cast("double")
            + F.element_at("embedding", 2).cast("double") * 0.5,
            9,
        ).alias("score"),
        "vec_id",
    )
    ranked = distributed_cumulative(
        scored, ["score", "vec_id"], out_col="rank"
    ).select("y", F.col("rank").cast("double").alias("r"))
    npos = F.sum("y")
    return ranked.agg(
        F.round(
            (F.sum(F.when(F.col("y") == 1, F.col("r")).otherwise(0.0))
             - (npos * (npos + 1)) / 2.0)
            / (npos * (F.count(F.lit(1)) - npos)),
            6,
        ).alias("auc")
    )


@query(
    "q_average_precision",
    oracle="""
    WITH scored AS (
        SELECT CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y,
               round(embedding[1] + embedding[2] * 0.5, 9) AS score
        FROM embeddings
    ),
    g AS (
        SELECT score, count(*) AS n, CAST(sum(y) AS BIGINT) AS np
        FROM scored GROUP BY score
    ),
    c AS (
        SELECT score, n, np,
               CAST(sum(np) OVER (ORDER BY score DESC) AS BIGINT) AS ctp,
               CAST(sum(n) OVER (ORDER BY score DESC) AS BIGINT) AS cn
        FROM g
    ),
    terms AS (
        SELECT CAST(round(np * ctp * 1.0 / cn, 12) AS DECIMAL(38,12)) AS term
        FROM c WHERE np > 0
    )
    SELECT round(CAST(sum(term) AS DOUBLE)
                 / (SELECT CAST(sum(np) AS BIGINT) FROM g), 6) AS ap
    FROM terms
    """,
)
def q_average_precision(spark, sf_dir):
    """Average Precision — area under the precision-recall curve with
    sklearn's step-interpolation, the metric the reference reports
    beside ROC-AUC in its embedding eval (embedding.py:1799-1800,
    `average_precision_score`; documented embedding.py:1763-1776). Same
    scored relation as q_auc. AP = Σ_t (R_t − R_{t-1})·P_t over
    DESCENDING distinct score thresholds, i.e. (1/P)·Σ_t np_t·ctp_t/cn_t
    where np_t = positives AT score t, ctp_t/cn_t = cumulative
    positives/total at-or-above t (ties grouped, as sklearn does).

    Determinism: scores round to a 9dp grid → exact group keys; every
    cumulative is an integer; the only float op per term is one IEEE
    division (bit-identical cross-engine), rounded to 12dp and summed
    as DECIMAL so the total is order-independent.

    Scale shape: group-by-score bounds the cumulative relation to
    distinct thresholds; the running totals use distributed_cumulative
    (two-pass range-partitioned prefix sums) — no global window, no
    single-partition exchange."""
    e = _t(spark, sf_dir, "embeddings")
    scored = e.select(
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("y"),
        F.round(
            F.element_at("embedding", 1).cast("double")
            + F.element_at("embedding", 2).cast("double") * 0.5,
            9,
        ).alias("score"),
    )
    g = scored.groupBy("score").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("np")
    ).withColumn("negs", -F.col("score"))
    # cumulative at-or-above each threshold = running sums in
    # DESCENDING score order (negs ascending; distinct scores → the
    # order is total, so the running sums are well-defined); both
    # cumulatives share ONE two-pass ranking (one bounds job)
    c = distributed_cumulative(
        g, ["negs"], agg_col=["np", "n"], out_col=["ctp", "cn"]
    )
    terms = c.filter(F.col("np") > 0).select(
        F.round(
            (F.col("np") * F.col("ctp")).cast("double") / F.col("cn"), 12
        ).cast("decimal(38,12)").alias("term"),
        "np",
    )
    return terms.agg(
        F.round(
            F.sum("term").cast("double") / F.sum("np"), 6
        ).alias("ap")
    )


# ------------------------------------------------------- text accounting

_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@query(
    "q_token_count",
    oracle=f"""
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_filter(toks, x -> x ~ '^[0-9]+$')) AS BIGINT)
             AS n_numeric,
           CAST(len(list_filter(toks, x -> x ~ '^[^A-Za-z0-9]$')) AS BIGINT)
             AS n_punct,
           round(CASE WHEN len(toks) > 0
                 THEN list_reduce(list_transform(toks, x -> CAST(length(x) AS DOUBLE)),
                                  (a, b) -> a + b) / len(toks)
                 ELSE 0.0 END, 4) AS avg_token_len
    FROM (
        SELECT doc_id, regexp_extract_all(text, '{_TOKEN_RE}') AS toks
        FROM documents
    )
    """,
)
def q_token_count(spark, sf_dir):
    """BPE-ish token accounting: split text into letter-runs /
    digit-runs / single punctuation (the pre-tokenizer shape BPE
    vocabularies assume), count classes and mean token length — the
    per-document cost model for training-data budgeting."""
    d = scatter(_t(spark, sf_dir, "documents"))
    d = d.withColumn("toks", F.regexp_extract_all("text", F.lit(_TOKEN_RE), 0))
    n = F.size("toks")
    tok_lens = F.aggregate(
        F.transform(F.col("toks"), lambda x: F.length(x).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return d.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.size(F.filter(F.col("toks"), lambda x: x.rlike("^[0-9]+$")))
        .cast("long")
        .alias("n_numeric"),
        F.size(F.filter(F.col("toks"), lambda x: x.rlike("^[^A-Za-z0-9]$")))
        .cast("long")
        .alias("n_punct"),
        F.round(
            F.when(n > 0, tok_lens / n).otherwise(F.lit(0.0)), 4
        ).alias("avg_token_len"),
    )


@query(
    "q_quality_score",
    oracle="""
    WITH m AS (
        SELECT doc_id,
               CAST(n_chars AS DOUBLE) AS chars,
               CAST(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                    x -> x <> '')) AS DOUBLE) AS toks
        FROM documents
    ),
    s AS (
        SELECT doc_id,
               round(least(chars / 500.0, 1.0) * 0.5
                     + least(toks / 100.0, 1.0) * 0.5, 4) AS quality
        FROM m
    )
    SELECT bucket, count(*) AS n_docs, round(avg(quality), 4) AS avg_quality
    FROM (
        SELECT CASE WHEN quality >= 0.8 THEN 'high'
                    WHEN quality >= 0.4 THEN 'medium'
                    ELSE 'low' END AS bucket,
               quality
        FROM s
    )
    GROUP BY bucket
    """,
)
def q_quality_score(spark, sf_dir):
    """Composite quality scoring for corpus curation: bounded length and
    token-count signals blended into one score, bucketed high/medium/low
    — the keep/downsample/drop decision that gates a training mix."""
    d = _t(spark, sf_dir, "documents")
    toks = F.size(
        F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    ).cast("double")
    quality = F.round(
        F.least(F.col("n_chars").cast("double") / 500.0, F.lit(1.0)) * 0.5
        + F.least(toks / 100.0, F.lit(1.0)) * 0.5,
        4,
    )
    bucket = (
        F.when(quality >= 0.8, "high")
        .when(quality >= 0.4, "medium")
        .otherwise("low")
    )
    return (
        d.select(bucket.alias("bucket"), quality.alias("quality"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("quality"), 4).alias("avg_quality"),
        )
    )


# ------------------------------------------------------ joins / reshaping

@query(
    "q_asof_join",
    oracle="""
    WITH o AS (
        SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice FROM (
            SELECT o_custkey, o_orderdate, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey, o_orderdate
                                      ORDER BY o_orderkey DESC) AS rn
            FROM orders
        ) WHERE rn = 1
    )
    SELECT e.event_id, e.user_id, o.o_orderkey,
           round(o.o_totalprice, 2) AS o_totalprice
    FROM events e ASOF JOIN o
      ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
    """,
)
def q_asof_join(spark, sf_dir):
    """True two-table as-of join: each event picks the customer's latest
    order at-or-before the event time. Implemented as union + ONE
    window pass (operators/joins.asof_join) — no |L|x|R| pair blow-up,
    one shuffle; the oracle uses DuckDB's native ASOF JOIN. Right side
    is deduped to one order per (custkey, date) (max orderkey) so the
    as-of pick is engine-deterministic."""
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    o = _t(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_orderkey", "o_totalprice"
    )
    w = Window.partitionBy("o_custkey", "o_orderdate").orderBy(
        F.col("o_orderkey").desc()
    )
    o1 = (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
        .withColumnRenamed("o_custkey", "user_id")
    )
    joined = asof_join(
        ev,
        o1,
        key="user_id",
        left_time="ts",
        right_time="o_orderdate",
        right_cols=["o_orderkey", "o_totalprice"],
    )
    return joined.select(
        "event_id",
        "user_id",
        "o_orderkey",
        F.round("o_totalprice", 2).alias("o_totalprice"),
    )


@query(
    "q_salted_agg",
    oracle="""
    SELECT event_type, count(*) AS n, round(sum(value), 2) AS sum_value
    FROM events GROUP BY event_type
    """,
)
def q_salted_agg(spark, sf_dir):
    """Skew-resistant two-phase aggregation: salt the hot grouping key
    (event_type has single-digit cardinality — at 100 TB every reducer
    for a popular type is a straggler), partial-agg on (key, salt) over
    16 salts, then combine per key. Results are identical to the plain
    groupBy (the oracle); only the shuffle layout changes. Spark's own
    map-side partial aggregation does this implicitly for sums — the
    explicit salt matters for high-fan-in combine states (collect_list,
    exact distinct) and is shown here as the library pattern
    (AQE skew handling covers the join-side analog)."""
    ev = _t(spark, sf_dir, "events").select(
        "event_type", "value", (F.pmod(F.col("event_id"), F.lit(16))).alias("salt")
    )
    partial = ev.groupBy("event_type", "salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum("value").alias("psum")
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("psum"), 2).alias("sum_value"),
    )


@query(
    "q_cumsum_window",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2)
             AS cum_spend,
           CAST(row_number() OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS BIGINT) AS order_seq
    FROM orders
    """,
)
def q_cumsum_window(spark, sf_dir):
    """Explicit window frames (ROWS BETWEEN): per-customer running spend
    and order sequence number — the frame-spec family the reference
    never needed (its islands trick avoids running windows) but a
    warehouse engine must have. Deterministic frame order (date, then
    orderkey) makes the cumulative sum engine-stable."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(
            F.sum("o_totalprice").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
            2,
        ).alias("cum_spend"),
        F.row_number().over(w).cast("long").alias("order_seq"),
    )


@query(
    "q_gap_fill",
    oracle="""
    WITH bounds AS (
        SELECT user_id,
               CAST(floor(epoch_ms(min(ts)) / 86400000.0) AS BIGINT) AS d0,
               CAST(floor(epoch_ms(max(ts)) / 86400000.0) AS BIGINT) AS d1
        FROM events GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM bounds
    ),
    actual AS (
        SELECT user_id,
               CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS day,
               count(*) AS n
        FROM events GROUP BY 1, 2
    )
    SELECT g.user_id, g.day, coalesce(a.n, 0) AS n
    FROM grid g LEFT JOIN actual a
      ON g.user_id = a.user_id AND g.day = a.day
    """,
)
def q_gap_fill(spark, sf_dir):
    """Time-series gap filling: densify each user's activity to one row
    per day between their first and last event (missing days = 0) —
    sequence() + explode generates the grid declaratively (the engine's
    UDTF-shaped generator, same mechanism as the tile planner M2), then
    a left join snaps counts onto it."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        day_id("ts").alias("day"),
    )
    actual = ev.groupBy("user_id", "day").agg(F.count(F.lit(1)).alias("n"))
    grid = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
        )
    )
    return grid.join(actual, ["user_id", "day"], "left").select(
        "user_id", "day", F.coalesce("n", F.lit(0)).alias("n")
    )


# ----------------------------------------------- SURVEY checklist gap-fill

@query(
    "q_orderby",
    oracle="""
    SELECT CAST(row_number() OVER (
               ORDER BY l_orderkey, l_linenumber, l_extendedprice) AS BIGINT)
             AS rn,
           l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
           round(l_extendedprice, 2) AS l_extendedprice
    FROM (
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_orderkey, l_linenumber, l_extendedprice LIMIT 1000
    )
    """,
)
def q_orderby(spark, sf_dir):
    """W1/S14: global composite-key sort, made hash-visible by
    materializing the rank (the driver's compare is order-insensitive,
    so the ORDER is checked through the rn column). Spark executes the
    bounded sort as TakeOrderedAndProject — per-partition top-k then a
    driver-side merge of k·p rows — never a global single-partition
    sort; the row_number window then runs on just the k survivors.
    The synthetic (l_orderkey, l_linenumber) pair is NOT unique, so
    l_extendedprice completes the total order — rank determinism needs
    a tie-free key (SURVEY §7.4 note 1).
    (Mirrors the reference's (id, frame) file re-sort, helpers.py:293-336.)"""
    li = _t(spark, sf_dir, "lineitem")
    top = li.select("l_orderkey", "l_linenumber", "l_extendedprice").orderBy(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    ).limit(1000)
    w = Window.orderBy("l_orderkey", "l_linenumber", "l_extendedprice")
    return top.select(
        F.row_number().over(w).cast("long").alias("rn"),
        "l_orderkey",
        F.col("l_linenumber").cast("long").alias("l_linenumber"),
        F.round("l_extendedprice", 2).alias("l_extendedprice"),
    )


@query(
    "q_ratio_expr",
    oracle="""
    SELECT p_brand,
           round(avg(CASE WHEN greatest(l_quantity * 10.0, p_size) > 0
                     THEN least(l_quantity * 10.0, p_size)
                          / greatest(l_quantity * 10.0, p_size)
                     ELSE 0.0 END), 6) AS avg_size_sim,
           count(*) AS n
    FROM lineitem JOIN part ON l_partkey = p_partkey
    GROUP BY p_brand
    """,
)
def q_ratio_expr(spark, sf_dir):
    """X5: size-similarity ratio min(a,b)/max(a,b) with 0-guard
    (reference get_size_similarity, feature_extraction.py:300-332) as a
    pure least/greatest expression over a broadcast dimension join."""
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_quantity")
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    a = F.col("l_quantity") * 10.0
    b = F.col("p_size")
    sim = F.when(
        F.greatest(a, b) > 0, F.least(a, b) / F.greatest(a, b)
    ).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.round(F.avg(sim), 6).alias("avg_size_sim"),
            F.count(F.lit(1)).alias("n"),
        )
    )


# ------------------------------------------- multimodal, driver-visible

# Materialized at import so the fixture exists before EITHER side of
# the q_binary_scan check (Spark scan or DuckDB read_blob) runs — the
# driver may execute the oracle SQL first. Best-effort: on a read-only
# filesystem import must still succeed (the query fn re-ensures).
from ..sources.binary import FIXTURE_DIR, ensure_binary_fixture, read_binary_files  # noqa: E402

try:
    ensure_binary_fixture()
except OSError:
    pass


@query(
    "q_binary_scan",
    oracle=f"""
    SELECT parse_filename(filename) AS file_name,
           size AS n_bytes,
           md5(hex(content)) AS content_md5
    FROM read_blob('{FIXTURE_DIR}/*.bin')
    """,
)
def q_binary_scan(spark, sf_dir):
    """S8: REAL raw-file ingestion — `spark.read.format("binaryFile")`
    over a directory of actual .bin files (reference embedding.py:234-250
    image-directory scan). Projects per-file name / byte length /
    content hash; the oracle re-reads the same files independently via
    DuckDB `read_blob`, so row splitting, glob filtering, and content
    bytes are verified end-to-end. Scales by file-parallel splits; the
    glob prunes at listing time."""
    df = read_binary_files(spark, ensure_binary_fixture())
    return df.select(
        F.element_at(F.split(F.col("path"), "/"), -1).alias("file_name"),
        F.col("length").alias("n_bytes"),
        F.md5(F.hex(F.col("content"))).alias("content_md5"),
    )

@query(
    "q_frame_sample",
    oracle="""
    SELECT media_id, unnest(range(0, duration_ms + 1, 1000)) AS sample_ms
    FROM (
        SELECT doc_id AS media_id, n_chars * 10 AS duration_ms FROM documents
    )
    """,
)
def q_frame_sample(spark, sf_dir):
    """M-surface: video frame-sampling plan — one row per sampled
    timestamp via sequence()+explode (the tile-planner pattern M2 on
    the time axis). Pure Catalyst; the decode of each sampled frame
    would be the mapInPandas stage exercised by q_media_features."""
    from ..operators.multimodal import sample_video_frames, synthesize_media_table

    media = synthesize_media_table(spark, sf_dir)
    return sample_video_frames(media, every_ms=1000).select(
        "media_id", F.col("sample_ms").cast("long").alias("sample_ms")
    )


def _media_features_oracle() -> str:
    """Contract oracle for the FULL media-features union (r4 verdict
    item 5 — the last `no_oracle` row). Three parts, all re-derived
    independently in DuckDB:

    - synthesized + binary-fixture blobs run the md5-digest-tile stub
      (`_fake_decode`): pixel(i,j) = digest16[(i*w+j) % 16] where
      digest16 = md5(lowercase-hex(content)) — so mean/std are exact
      weighted byte statistics and the phash bit-grid indexes into the
      digest, all hex-char arithmetic;
    - image-fixture PGM blobs decode FOR REAL: pixels come out of the
      actual file bytes exactly like _image_decode_oracle, extended
      with E[x²] for std and the 8×-downsampled phash grid.
    """
    from ..sources.binary import FIXTURE_DIR, IMAGE_FIXTURE_DIR

    def bk(m: str, k: str) -> str:  # digest byte k (dynamic) of hex str m
        return (
            f"((strpos('0123456789abcdef', substr({m}, 2*({k}) + 1, 1)) - 1) * 16"
            f" + (strpos('0123456789abcdef', substr({m}, 2*({k}) + 2, 1)) - 1))"
        )

    def px(pos: str) -> str:  # pixel byte whose first hex char is at `pos`
        return (
            f"((strpos('0123456789abcdef', substr(hx, {pos}, 1)) - 1) * 16"
            f" + (strpos('0123456789abcdef', substr(hx, {pos} + 1, 1)) - 1))"
        )

    cnt_k = "((N // 16) + CASE WHEN k < N % 16 THEN 1 ELSE 0 END)"
    phash = (
        "md5(list_aggregate(list_transform(sv, v -> CASE WHEN v > smean "
        "THEN '1' ELSE '0' END), 'string_agg', ''))"
    )
    return f"""
    WITH syn AS (
        SELECT doc_id AS media_id,
               md5(lower(hex(encode(text)))) AS m,
               doc_id % 64 + 32 AS w,
               doc_id % 48 + 24 AS h,
               octet_length(encode(text)) AS n_bytes
        FROM documents
    ),
    bin AS (
        SELECT i + 1000000 AS media_id, m,
               i % 64 + 32 AS w, i % 48 + 24 AS h, n_bytes
        FROM (
            SELECT CAST(regexp_extract(filename, '(\\d+)\\.bin$', 1) AS BIGINT)
                       AS i,
                   md5(lower(hex(content))) AS m,
                   octet_length(content) AS n_bytes
            FROM read_blob('{FIXTURE_DIR}/*.bin')
        )
    ),
    stub AS (
        SELECT *, w * h AS N, (w + 7) // 8 AS C, (h + 7) // 8 AS R
        FROM (SELECT * FROM syn UNION ALL SELECT * FROM bin)
    ),
    stub_stats AS (
        SELECT media_id, n_bytes, w, h, N, C, R, m,
               list_sum(list_transform(range(0, 16),
                   k -> {bk('m', 'k')} * {cnt_k})) * 1.0 / N AS mean_i,
               list_sum(list_transform(range(0, 16),
                   k -> {bk('m', 'k')} * {bk('m', 'k')} * {cnt_k}))
                   * 1.0 / N AS ex2
        FROM stub
    ),
    stub_small AS (
        SELECT media_id, n_bytes, mean_i, ex2,
               list_transform(range(0, R * C),
                   i -> {bk('m', '((8 * (i // C)) * w + 8 * (i % C)) % 16')})
                   AS sv
        FROM stub_stats
    ),
    stub_out AS (
        SELECT media_id, n_bytes,
               round(mean_i, 6) AS mean_intensity,
               round(sqrt(ex2 - mean_i * mean_i), 6) AS std_intensity,
               {phash} AS phash
        FROM (SELECT *, list_sum(sv) * 1.0 / len(sv) AS smean FROM stub_small)
    ),
    img AS (
        SELECT CAST(regexp_extract(filename, '(\\d+)\\.pgm$', 1) AS BIGINT)
                   + 2000000 AS media_id,
               octet_length(content) AS n_bytes,
               lower(hex(content)) AS hx
        FROM read_blob('{IMAGE_FIXTURE_DIR}/*.pgm')
    ),
    img_hdr AS (
        SELECT media_id, n_bytes, hx,
               length(regexp_extract(hx,
                   '^50350a(?:3[0-9])+20(?:3[0-9])+0a3235350a', 0)) + 1 AS p0,
               CAST(regexp_replace(
                   regexp_extract(hx, '^50350a((?:3[0-9])+)20', 1),
                   '3(.)', '\\1', 'g') AS INTEGER) AS w,
               CAST(regexp_replace(
                   regexp_extract(hx, '^50350a(?:3[0-9])+20((?:3[0-9])+)0a', 1),
                   '3(.)', '\\1', 'g') AS INTEGER) AS h
        FROM img
    ),
    img_pix AS (
        SELECT media_id, n_bytes, w, h,
               (w + 7) // 8 AS C, (h + 7) // 8 AS R,
               list_transform(range(0, w * h), i -> {px('2*i + p0')}) AS pix
        FROM img_hdr
    ),
    img_small AS (
        SELECT media_id, n_bytes,
               list_sum(pix) * 1.0 / (w * h) AS mean_i,
               list_sum(list_transform(pix, v -> v * v)) * 1.0 / (w * h) AS ex2,
               list_transform(range(0, R * C),
                   i -> pix[(8 * (i // C)) * w + 8 * (i % C) + 1]) AS sv
        FROM img_pix
    ),
    img_out AS (
        SELECT media_id, n_bytes,
               round(mean_i, 6) AS mean_intensity,
               round(sqrt(ex2 - mean_i * mean_i), 6) AS std_intensity,
               {phash} AS phash
        FROM (SELECT *, list_sum(sv) * 1.0 / len(sv) AS smean FROM img_small)
    )
    SELECT * FROM stub_out UNION ALL SELECT * FROM img_out
    """


@query("q_media_features", oracle=_media_features_oracle())
def q_media_features(spark, sf_dir):
    """M1/M3: decode + feature-extraction over binary media columns via
    Arrow-batched mapInPandas (per-partition decoder init). The media
    relation is a UNION of a REAL `binaryFile` directory scan (S8 —
    genuine file bytes) and the sf-scaled synthesized blobs, so the
    query both exercises raw-file ingestion and grows with the corpus.
    PGM blobs (the real-image fixture) decode FOR REAL via the numpy
    codec; the non-image blobs exercise the deterministic stub path
    (no compressed-codec libs in this container). Partitioning, batch
    shapes, and schema plumbing are shared by both."""
    from ..operators.multimodal import (
        extract_media_features,
        media_from_binary_files,
        media_from_image_files,
        synthesize_media_table,
    )

    real_files = media_from_binary_files(spark).withColumn(
        "media_id", F.col("media_id") + 1_000_000  # keep ids disjoint
    )
    real_images = media_from_image_files(spark).withColumn(
        "media_id", F.col("media_id") + 2_000_000
    )
    media = (
        scatter(synthesize_media_table(spark, sf_dir))
        .unionByName(real_files)
        .unionByName(real_images)
    )
    return extract_media_features(media).select(
        "media_id",
        "n_bytes",
        F.round("mean_intensity", 6).alias("mean_intensity"),
        F.round("std_intensity", 6).alias("std_intensity"),
        "phash",
    )


def _batch_infer_oracle() -> str:
    """Re-derive the stub detector's md5 arithmetic in SQL.

    The tile planner is integral arithmetic (window 1536, stride
    int(1536*0.65)=998, last tile snapped to the edge); the stub
    forward draws box count and coordinates from md5 digests of
    "{media_id}_{scale}_{tx}_{ty}" / "{seed}_{k}" key strings — both
    exactly re-computable in DuckDB (same lowercase-hex md5)."""
    from ._sqlgen import byte_val, hex_int

    positions = (
        "unnest(list_distinct(list_transform("
        "range(0, greatest(CAST(ceil(({d} - 1536) / 998.0) AS BIGINT) + 1, 1)), "
        "i -> least(i * 998, greatest({d} - 1536, 0)))))"
    )
    scaled = " UNION ALL ".join(
        f"""
        SELECT media_id, CAST({s} AS DOUBLE) AS scale, '{s}' AS scale_str,
               CAST(floor(width * {s}) AS INTEGER) AS sw,
               CAST(floor(height * {s}) AS INTEGER) AS sh
        FROM media"""
        for s in ("0.5", "1.0")
    )
    seed = hex_int("sm", 1, 8)
    return f"""
    WITH media AS (
        SELECT doc_id AS media_id,
               CAST(doc_id % 64 + 32 AS INTEGER) * 40 AS width,
               CAST(doc_id % 48 + 24 AS INTEGER) * 30 AS height
        FROM documents
    ),
    scaled AS ({scaled}),
    tiles_x AS (
        SELECT media_id, scale, scale_str, sw, sh, {positions.format(d="sw")} AS tx
        FROM scaled
    ),
    tiles AS (
        SELECT media_id, scale, scale_str, sw, tx, {positions.format(d="sh")} AS ty
        FROM tiles_x
    ),
    seeded AS (
        SELECT media_id, scale, tx, ty,
               {seed} AS seed
        FROM (
            SELECT *, md5(CAST(media_id AS VARCHAR) || '_' || scale_str
                          || '_' || CAST(tx AS VARCHAR)
                          || '_' || CAST(ty AS VARCHAR)) AS sm
            FROM tiles
        )
    ),
    boxes AS (
        SELECT media_id, scale, tx, ty,
               md5(CAST(seed AS VARCHAR) || '_' || CAST(k.k AS VARCHAR)) AS h
        FROM seeded, (SELECT unnest([0, 1]) AS k) k
        WHERE k.k < seed % 3
    )
    SELECT media_id, scale,
           CAST(tx AS INTEGER) AS tile_x, CAST(ty AS INTEGER) AS tile_y,
           {byte_val('h', 0)} * 4.0 AS bb_left,
           {byte_val('h', 1)} * 4.0 AS bb_top,
           20.0 + {byte_val('h', 2)} % 64 AS bb_width,
           20.0 + {byte_val('h', 3)} % 64 AS bb_height,
           ({byte_val('h', 4)} % 100) / 100.0 AS conf
    FROM boxes
    """


@query("q_batch_infer", oracle=_batch_infer_oracle())
def q_batch_infer(spark, sf_dir):
    """M1+M2 composed: declarative multi-scale sliding-window tile plan
    (explode) → mapInPandas batch inference (per-partition model load,
    deterministic stub forward) → boxes translated back to original
    coordinates (X14). The end-to-end shape of the reference's detect
    stage (detection.py:1307-1423) as one distributed pipeline. The
    oracle re-derives both the integral tile planner and the stub
    forward's md5 arithmetic in SQL, so tile layout, per-tile fan-out,
    and box values are all exact-hash-checked."""
    from ..operators.inference import detect_tiles, tile_plan
    from ..operators.multimodal import synthesize_media_table

    media = scatter(synthesize_media_table(spark, sf_dir)).withColumn(
        "width", F.col("width") * 40
    ).withColumn("height", F.col("height") * 30)
    tiles = tile_plan(media, window=1536, overlap=0.35, scales=(0.5, 1.0))
    return detect_tiles(tiles)


@query(
    "q_pivot",
    oracle="""
    SELECT l_linestatus,
           round(coalesce(sum(CASE WHEN l_returnflag = 'A' THEN l_quantity END), 0), 2) AS qty_A,
           round(coalesce(sum(CASE WHEN l_returnflag = 'N' THEN l_quantity END), 0), 2) AS qty_N,
           round(coalesce(sum(CASE WHEN l_returnflag = 'R' THEN l_quantity END), 0), 2) AS qty_R
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def q_pivot(spark, sf_dir):
    """Pivot (rows→columns reshaping): quantity by linestatus × pinned
    returnflag values. The value list is explicit — at 100 TB an
    unpinned pivot would scan once just to discover column names; with
    pinned values this is one pass of conditional aggregation (exactly
    the oracle's CASE form, which is what Spark lowers pivot to)."""
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.groupBy("l_linestatus")
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.round(F.sum("l_quantity"), 2))
    )
    # coalesce must wrap the PIVOTED columns: a missing (status, flag)
    # combo yields NULL cells (the agg expression never runs for an
    # absent group), while the oracle's coalesce(sum(...), 0) gives 0.
    return out.select(
        "l_linestatus",
        F.coalesce(F.col("A"), F.lit(0.0)).alias("qty_A"),
        F.coalesce(F.col("N"), F.lit(0.0)).alias("qty_N"),
        F.coalesce(F.col("R"), F.lit(0.0)).alias("qty_R"),
    )


@query(
    "q_rolling_window",
    oracle="""
    SELECT o_orderkey, o_custkey,
           round(sum(o_totalprice) OVER (
               PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
               RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW), 2)
             AS wk_revenue,
           first_value(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
             AS first_orderkey,
           last_value(o_orderkey) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS last_orderkey
    FROM orders
    """,
)
def q_rolling_window(spark, sf_dir):
    """RANGE-framed rolling aggregation: per-customer 7-day revenue
    window over event time (peers at the same instant are frame-mates,
    per SQL RANGE semantics) plus first_value/last_value — the
    value-based frame family that completes ROWS BETWEEN
    (q_cumsum_window). Ordering by epoch seconds makes the interval
    arithmetic engine-portable."""
    o = _t(spark, sf_dir, "orders")
    epoch = F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
    w_range = (
        Window.partitionBy("o_custkey")
        .orderBy(epoch)
        .rangeBetween(-604800, 0)
    )
    w_order = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w_order.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.round(F.sum("o_totalprice").over(w_range), 2).alias("wk_revenue"),
        F.first("o_orderkey").over(w_order).alias("first_orderkey"),
        F.last("o_orderkey").over(w_full).alias("last_orderkey"),
    )


@query(
    "q_rank_family",
    oracle="""
    SELECT o_orderkey, o_custkey,
           CAST(rank() OVER w AS BIGINT) AS rnk,
           CAST(dense_rank() OVER w AS BIGINT) AS drnk,
           round(percent_rank() OVER w, 6) AS prnk,
           CAST(ntile(4) OVER (PARTITION BY o_custkey
                               ORDER BY o_totalprice DESC, o_orderkey)
                AS BIGINT) AS quartile
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY round(o_totalprice, 2) DESC)
    """,
)
def q_rank_family(spark, sf_dir):
    """The full ranking family per customer: rank/dense_rank (gap vs
    dense tie semantics over the SAME tied ordering), percent_rank, and
    ntile quartiles (tie-broken ordering — ntile splits peers, so its
    order must be total for engine parity)."""
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.round("o_totalprice", 2).desc()
    )
    w_tiebroken = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.round(F.percent_rank().over(w), 6).alias("prnk"),
        F.ntile(4).over(w_tiebroken).cast("long").alias("quartile"),
    )


@query(
    "q_skew_join",
    oracle="""
    WITH dim AS (
        SELECT event_type, round(avg(value), 4) AS type_avg
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           round(e.value - d.type_avg, 2) AS delta
    FROM events e JOIN dim d USING (event_type)
    """,
)
def q_skew_join(spark, sf_dir):
    """Skew-resistant join via `salted_join` (operators/joins.py): every
    event joins its per-type average, but `event_type` has single-digit
    cardinality, so a plain shuffle join funnels ~1/8 of 100 TB through
    one reducer per type. Salting spreads each hot key over 16 reducers;
    the build side (tiny here, medium in the real case this targets) is
    replicated ×16. The oracle is the PLAIN join — salting must not
    change a single row. The per-type average is rounded to 4dp before
    the subtraction on both engines so summation order can't leak into
    the 2dp delta."""
    from ..operators.joins import salted_join

    ev = _t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    dim = ev.groupBy("event_type").agg(
        F.round(F.avg("value"), 4).alias("type_avg")
    )
    out = salted_join(ev, dim.hint("shuffle_hash"), key="event_type", n_salts=16)
    return out.select(
        "event_id",
        "event_type",
        F.round(F.col("value") - F.col("type_avg"), 2).alias("delta"),
    )


def _kmeans_step_oracle() -> str:
    from ..operators.clustering import duck_sqdist_sql

    return f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id % 101 = 0),
    d AS (SELECT v.vec_id, c.cid, v.e,
                 {duck_sqdist_sql('v.e', 'c.ce', _DIM)} AS dist
          FROM v CROSS JOIN c),
    a AS (SELECT vec_id, cid, e FROM (
              SELECT *, row_number() OVER (
                  PARTITION BY vec_id ORDER BY dist ASC, cid ASC) AS rn
              FROM d) WHERE rn = 1),
    idx AS (SELECT unnest(range(1, {_DIM} + 1)) AS i),
    x AS (SELECT a.cid, CAST(i - 1 AS BIGINT) AS pos, a.e[i] AS val
          FROM a CROSS JOIN idx)
    SELECT cid, pos, round(avg(val), 4) AS c_val,
           count(*) AS n_members
    FROM x GROUP BY cid, pos
    """


@query("q_kmeans_step", oracle=_kmeans_step_oracle())
def q_kmeans_step(spark, sf_dir):
    """One Lloyd k-means iteration as a relational program
    (operators/clustering.py): assign all vectors to their nearest of
    the stride-seeded centroids (broadcast k-row table, hash-agg
    argmin, bit-identical left-fold distances so ties can't flip
    cross-engine), then emit the updated centroids in long
    (cid, pos, mean) form. The assignment pass is the per-iteration
    cost at 100 TB: one broadcast join over the data, shuffles carry
    only k*dim partial means. The full iterative loop is `q_kmeans`
    (rows-only: iteration count is imperative, not SQL)."""
    from ..operators.clustering import assign_clusters

    v = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cents = v.filter(F.col("vec_id") % 101 == 0).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    assigned = assign_clusters(v, cents)
    return (
        assigned.select("cid", F.posexplode("e").alias("pos", "v"))
        .groupBy("cid", F.col("pos").cast("long").alias("pos"))
        .agg(
            F.round(F.avg("v"), 4).alias("c_val"),
            F.count(F.lit(1)).alias("n_members"),
        )
    )


def _kmeans_full_oracle(k: int = 8, n_iter: int = 3, stride: int = 59) -> str:
    """Fully UNROLLED 3-iteration Lloyd loop in DuckDB SQL.

    Mirrorability rests on two contracts shared with the Spark side:
    deterministic stride seeds (lowest k vec_ids ≡ 0 mod stride — the
    same 8 ids at every sf), and 4dp centroid rounding after every
    update, which re-synchronizes the two engines' summation-order
    float drift each iteration so distances (identical left folds)
    stay bit-identical throughout the trajectory.
    """
    from ..operators.clustering import duck_sqdist_sql

    dist = duck_sqdist_sql("v.e", "c.ce", _DIM)
    ctes = [
        "v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings)",
        f"dims AS (SELECT unnest(range(1, {_DIM + 1})) AS i)",
        f"""c0 AS (
        SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid,
               e AS ce
        FROM (SELECT vec_id, e FROM v WHERE vec_id % {stride} = 0
              ORDER BY vec_id LIMIT {k})
    )""",
    ]
    for it in range(1, n_iter + 1):
        prev = f"c{it - 1}"
        ctes.append(f"""a{it} AS (
        SELECT vec_id, e, cid FROM (
            SELECT v.vec_id, v.e, c.cid,
                   row_number() OVER (PARTITION BY v.vec_id
                                      ORDER BY {dist} ASC, c.cid ASC) AS rn
            FROM v CROSS JOIN {prev} c
        ) WHERE rn = 1
    )""")
        ctes.append(f"""m{it} AS (
        SELECT cid, i, round(avg(e[i]), 4) AS mv
        FROM a{it} CROSS JOIN dims GROUP BY cid, i
    )""")
        ctes.append(f"""c{it} AS (
        SELECT p.cid, coalesce(n.ce, p.ce) AS ce
        FROM {prev} p LEFT JOIN (
            SELECT cid, list(mv ORDER BY i) AS ce FROM m{it} GROUP BY cid
        ) n USING (cid)
    )""")
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
    SELECT vec_id, cid, round(d, 6) AS dist FROM (
        SELECT v.vec_id, c.cid, {dist} AS d,
               row_number() OVER (PARTITION BY v.vec_id
                                  ORDER BY {dist} ASC, c.cid ASC) AS rn
        FROM v CROSS JOIN c{n_iter} c
    ) WHERE rn = 1
    """
    )


@query("q_kmeans", oracle=_kmeans_full_oracle())
def q_kmeans(spark, sf_dir):
    """Trained k-means (3 Lloyd iterations, k=8) over the embedding
    store — the quantizer-training path IVF needs. Returns one row per
    vector with its final cluster and squared distance.

    Was rows-only through r3 ("iterative loop isn't SQL-expressible");
    now EXACTLY oracle-checked by unrolling the fixed-depth loop into
    DuckDB CTEs (`_kmeans_full_oracle`). The enabling contracts:
    engine-portable stride seeds (vec_id % 59 = 0, lowest 8 — identical
    at every sf) instead of Spark-hash seeds, and per-iteration 4dp
    centroid quantization on BOTH engines, which absorbs cross-engine
    mean-summation-order drift so the trajectories cannot diverge.
    Loop-depth invariants stay pinned in tests/test_clustering.py."""
    from ..operators.clustering import kmeans

    v = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    seed_rows = (
        v.filter(F.col("vec_id") % 59 == 0)
        .orderBy("vec_id")
        .limit(8)
        .collect()
    )
    init = spark.createDataFrame(
        [(i, [float(x) for x in r["e"]]) for i, r in enumerate(seed_rows)],
        "cid INT, ce ARRAY<DOUBLE>",
    )
    _, assigned = kmeans(v, k=8, n_iter=3, init=init, round_digits=4)
    return assigned.select(
        "vec_id", "cid", F.round("dist", 6).alias("dist")
    )


def _zorder_oracle() -> str:
    from ..sources.zorder import duck_zvalue_sql

    return f"""
    SELECT event_id, user_id,
           {duck_zvalue_sql('user_id', 'CAST(floor(value) AS BIGINT)')}
             AS zval
    FROM events
    """


@query("q_zorder", oracle=_zorder_oracle())
def q_zorder(spark, sf_dir):
    """Morton z-value computation (sources/zorder.py) — the clustering
    key behind multi-column data skipping (Iceberg/Delta OPTIMIZE
    ZORDER). Pure shift/mask Catalyst expressions, bit-identical to
    the oracle; the write path that sorts files by this key and the
    parquet-footer pruning it buys are pinned in tests/test_zorder.py.
    `floor` before the cast because Spark truncates double→long while
    DuckDB rounds (portability rule)."""
    from ..sources.zorder import zvalue

    ev = _t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        zvalue(
            F.col("user_id"), F.floor("value").cast("long")
        ).alias("zval"),
    )


@query(
    "q_grouping_sets",
    oracle="""
    SELECT o_orderpriority, o_orderstatus,
           CAST(count(*) AS BIGINT) AS n,
           round(sum(o_totalprice), 2) AS total,
           CAST(GROUPING(o_orderpriority) * 2 + GROUPING(o_orderstatus)
                AS BIGINT) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
    """,
)
def q_grouping_sets(spark, sf_dir):
    """Explicit GROUPING SETS — two independent one-column rollups in a
    single pass (neither CUBE nor ROLLUP expresses {(a),(b)} without
    extra sets). Spark plans one Expand + one aggregate: the scan and
    shuffle are paid once for both groupings, which is the whole point
    at 100 TB vs two separate groupBys + union. grouping_id bit order
    is mirrored into DuckDB as GROUPING(a)*2+GROUPING(b)."""
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupingSets(
            [["o_orderpriority"], ["o_orderstatus"]],
            "o_orderpriority",
            "o_orderstatus",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
            F.grouping_id().cast("long").alias("gid"),
        )
    )


@query(
    "q_data_profile",
    oracle="""
    SELECT 'user_id' AS col, CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count(user_id) AS BIGINT) AS n_null,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct,
           round(min(user_id), 4) AS min_val,
           round(max(user_id), 4) AS max_val
    FROM events
    UNION ALL
    SELECT 'value', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(value) AS BIGINT),
           CAST(count(DISTINCT value) AS BIGINT),
           round(min(value), 4), round(max(value), 4)
    FROM events
    UNION ALL
    SELECT 'event_id', CAST(count(*) AS BIGINT),
           CAST(count(*) - count(event_id) AS BIGINT),
           CAST(count(DISTINCT event_id) AS BIGINT),
           round(min(event_id), 4), round(max(event_id), 4)
    FROM events
    """,
)
def q_data_profile(spark, sf_dir):
    """Column-profiling audit (the pre-ingest data-quality pass every
    100 TB pipeline runs): per column — row count, NULL count, distinct
    count, min, max, in long format. ONE aggregate over ONE scan
    produces all columns' stats simultaneously (count(col) vs count(*)
    for nulls, count(DISTINCT col) per column); the long layout is then
    a zero-cost literal pivot of that single row. The oracle's
    three-scan UNION is the semantic spec, not the plan — Spark pays
    one pass."""
    ev = _t(spark, sf_dir, "events")
    agg = ev.agg(
        F.count(F.lit(1)).alias("n"),
        *[
            x
            for c in ("user_id", "value", "event_id")
            for x in (
                F.count(c).alias(f"nn_{c}"),
                F.countDistinct(c).alias(f"nd_{c}"),
                F.round(F.min(c), 4).alias(f"mn_{c}"),
                F.round(F.max(c), 4).alias(f"mx_{c}"),
            )
        ],
    )
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col"),
                F.col("n").alias("n_rows"),
                (F.col("n") - F.col(f"nn_{c}")).alias("n_null"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").cast("double").alias("min_val"),
                F.col(f"mx_{c}").cast("double").alias("max_val"),
            )
            for c in ("user_id", "value", "event_id")
        ]
    )
    return agg.select(F.explode(rows).alias("r")).select("r.*")


@query(
    "q_gram_matrix",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    idx AS (SELECT unnest(range(1, {_DIM} + 1)) AS i),
    x AS (SELECT v.vec_id, i, e[i] AS xi FROM v CROSS JOIN idx)
    SELECT CAST(a.i - 1 AS BIGINT) AS gi, CAST(b.i - 1 AS BIGINT) AS gj,
           round(sum(a.xi * b.xi), 4) AS g
    FROM x a JOIN x b USING (vec_id)
    WHERE a.i <= b.i
    GROUP BY 1, 2
    """,
)
def q_gram_matrix(spark, sf_dir):
    """Distributed Gram matrix (X^T X upper triangle) — the reduction
    behind PCA/covariance/linear solvers at scale
    (operators/decomposition.py): only d(d+1)/2 = 2080 sums leave the
    cluster, never the data. Join-free: each task folds its Arrow
    batches into one numpy X^T X partial (2080 rows per task on the
    wire), so the only shuffle is the (i, j)-keyed sum of partials —
    the oracle's self-join formulation is the spec, not the plan."""
    from ..operators.decomposition import gram_upper

    v = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    return gram_upper(v, _DIM).select(
        "gi", "gj", F.round("g", 4).alias("g")
    )


@query(
    "q_forward_fill",
    oracle="""
    WITH bounds AS (
        SELECT user_id,
               CAST(floor(epoch_ms(min(ts)) / 86400000.0) AS BIGINT) AS d0,
               CAST(floor(epoch_ms(max(ts)) / 86400000.0) AS BIGINT) AS d1
        FROM events GROUP BY user_id
    ),
    grid AS (
        SELECT user_id, unnest(range(d0, d1 + 1)) AS day FROM bounds
    ),
    actual AS (
        SELECT user_id,
               CAST(floor(epoch_ms(ts) / 86400000.0) AS BIGINT) AS day,
               round(sum(value), 2) / count(*) AS day_avg
        FROM events GROUP BY 1, 2
    )
    SELECT user_id, day,
           last_value(day_avg IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS filled,
           day_avg IS NULL AS was_filled
    FROM (
        SELECT g.user_id, g.day, a.day_avg
        FROM grid g LEFT JOIN actual a
          ON g.user_id = a.user_id AND g.day = a.day
    )
    """,
)
def q_forward_fill(spark, sf_dir):
    """LOCF forward fill (the other half of time-series densification
    next to q_gap_fill's zero-fill): each user's daily average carries
    forward across event-less days via last(ignorenulls) over an
    ordered running frame — one window shuffle on the user key, no
    self-join, no loop. `was_filled` marks imputed rows so a consumer
    can distinguish observation from carry. The first grid day is
    always observed (the grid starts at each user's first event), so
    `filled` is never NULL."""
    ev = _t(spark, sf_dir, "events").select(
        "user_id",
        day_id("ts").alias("day"),
        "value",
    )
    # Portability: round(avg, 4) hit a real .xxxx5 edge at sf0.1 — avg
    # of 2-decimal values over an 8*odd-sized group terminates at
    # exactly 5 decimals ending in 5, and the engines' summation orders
    # land on opposite sides. round(sum, 2) instead sits ON the 2dp
    # grid (sums of 2dp values are 2dp-exact), so the division — and
    # every LOCF carry of it — is bit-identical cross-engine with no
    # further rounding needed.
    actual = ev.groupBy("user_id", "day").agg(
        (F.round(F.sum("value"), 2) / F.count(F.lit(1))).alias("day_avg")
    )
    grid = (
        ev.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("d0"), F.col("d1"))).alias("day"),
        )
    )
    joined = grid.join(actual, ["user_id", "day"], "left")
    w = Window.partitionBy("user_id").orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "user_id",
        "day",
        F.last("day_avg", ignorenulls=True).over(w).alias("filled"),
        F.col("day_avg").isNull().alias("was_filled"),
    )


# ----------------------------------------------------- count-min sketch

_CMS_K = 4  # hash functions
_CMS_W = 512  # buckets per row

_DUCK_CMS_TOKS = (
    "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
)


def _cms_oracle() -> str:
    """Exact mirror of the relational CMS: same md5 bucket function
    (first 8 hex chars of md5('{fn}:{tok}') mod W, via portable
    hex-char arithmetic — DuckDB has no strtol), same min-over-rows
    estimate — the oracle rebuilds the identical sketch, so the
    comparison pins the full build+query pipeline, not just a bound."""
    from ._sqlgen import hex_int

    md5_expr = "md5(CAST(fn AS VARCHAR) || ':' || tok)"
    bucket = f"({hex_int(md5_expr, 1, 8)} % {_CMS_W})"
    return f"""
    WITH stream AS (
        SELECT u.tok AS tok
        FROM (SELECT {_DUCK_CMS_TOKS} AS l FROM documents), unnest(l) AS u(tok)
    ),
    hashed AS (
        SELECT tok, fn, {bucket} AS bucket
        FROM stream, (SELECT unnest(range(0, {_CMS_K})) AS fn)
    ),
    cms AS (
        SELECT fn, bucket, count(*) AS c
        FROM hashed GROUP BY fn, bucket
    ),
    top_toks AS (
        SELECT tok, count(*) AS exact_count
        FROM stream GROUP BY tok
        ORDER BY exact_count DESC, tok ASC LIMIT 20
    ),
    probes AS (
        SELECT tok, exact_count, fn, {bucket} AS bucket
        FROM top_toks, (SELECT unnest(range(0, {_CMS_K})) AS fn)
    )
    SELECT p.tok AS token, p.exact_count,
           min(c.c) AS cms_estimate
    FROM probes p JOIN cms c ON c.fn = p.fn AND c.bucket = p.bucket
    GROUP BY p.tok, p.exact_count
    """


@query("q_count_min", oracle=_cms_oracle())
def q_count_min(spark, sf_dir):
    """Count-min sketch as a composition of DataFrame ops (the "novel
    sketch" pattern): the token stream explodes to K=4 md5-derived
    (row, bucket) cells, one hash aggregate builds the K×512 table, and
    a point query is an equi-join on (row, bucket) + min-over-rows.
    Output: the 20 most frequent tokens with exact count and CMS
    estimate (estimate ≥ exact always; equality whenever no collision).

    Scale story: the sketch build is ONE map-side-combining aggregate
    over K× the stream — the sketch itself is K·W rows (~2k) regardless
    of corpus size, i.e. constant-size state that merges across
    partitions, streams, and days (the same property approx_count_
    distinct's HLL exploits, here built from first principles). At
    100 TB the CMS table broadcasts for O(1)-per-probe lookups.
    """
    from ..operators.sketches import cms_probe, cms_table

    d = scatter(load_table(spark, sf_dir, "documents"))
    stream = d.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("tok")
    )
    cms = cms_table(stream)
    top = (
        stream.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("exact_count"))
        .orderBy(F.desc("exact_count"), F.asc("tok"))
        .limit(20)
    )
    return (
        cms_probe(cms, top)
        .join(F.broadcast(top), "tok")
        .select(F.col("tok").alias("token"), "exact_count", "cms_estimate")
    )


# ------------------------------------------------------- bloom filter

_BLOOM_K = 4
_BLOOM_W = 2048


def _bloom_oracle() -> str:
    """Mirror of the relational Bloom filter, bit-for-bit: member set =
    tokens of 'en' documents, probes = distinct tokens of all other
    documents; same md5 cell function as the Spark side."""
    from ._sqlgen import hex_int

    md5_expr = "md5(CAST(fn AS VARCHAR) || ':' || tok)"
    bucket = f"({hex_int(md5_expr, 1, 8)} % {_BLOOM_W})"
    return f"""
    WITH members AS (
        SELECT DISTINCT u.tok AS tok
        FROM (SELECT {_DUCK_CMS_TOKS} AS l FROM documents WHERE lang = 'en'),
             unnest(l) AS u(tok)
    ),
    bits AS (
        SELECT DISTINCT fn, {bucket} AS bucket
        FROM members, (SELECT unnest(range(0, {_BLOOM_K})) AS fn)
    ),
    probes AS (
        SELECT DISTINCT u.tok AS tok
        FROM (SELECT {_DUCK_CMS_TOKS} AS l FROM documents WHERE lang <> 'en'),
             unnest(l) AS u(tok)
    ),
    probe_hits AS (
        SELECT p.tok,
               count(b.fn) AS cells_set
        FROM (SELECT tok, fn, {bucket} AS bucket
              FROM probes, (SELECT unnest(range(0, {_BLOOM_K})) AS fn)) p
        LEFT JOIN bits b ON b.fn = p.fn AND b.bucket = p.bucket
        GROUP BY p.tok
    ),
    flagged AS (
        SELECT h.tok,
               h.cells_set = {_BLOOM_K} AS maybe_member,
               m.tok IS NOT NULL AS is_member
        FROM probe_hits h LEFT JOIN members m ON m.tok = h.tok
    )
    SELECT count(*) AS n_probed,
           CAST(sum(CASE WHEN is_member THEN 1 ELSE 0 END) AS BIGINT)
               AS n_members,
           CAST(sum(CASE WHEN maybe_member THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged,
           CAST(sum(CASE WHEN maybe_member AND NOT is_member THEN 1 ELSE 0 END)
               AS BIGINT) AS n_false_pos,
           CAST(sum(CASE WHEN is_member AND NOT maybe_member THEN 1 ELSE 0 END)
               AS BIGINT) AS n_false_neg
    FROM flagged
    """


@query("q_bloom_filter", oracle=_bloom_oracle())
def q_bloom_filter(spark, sf_dir):
    """Bloom filter as a composition of DataFrame ops (the membership
    sibling of q_count_min): the member set ('en' vocabulary) maps to
    K=4 md5-derived cells, the filter is the DISTINCT (fn, bucket)
    relation (≤ K·2048 rows regardless of corpus size), and a probe is
    "all K cells set" — computed as one equi-join + count-per-token.
    Output is the audit row: probes, true members, flagged,
    false positives, and false negatives (ALWAYS 0 — the Bloom
    guarantee, and the DuckDB oracle proves it on real data).

    Scale story: this is the join-pruning primitive — broadcast the
    constant-size bit relation to pre-filter a 100 TB probe side down
    to (members + ε·probes) rows before an expensive join, exactly what
    engines do with runtime BloomFilter pushdown, built here from
    first principles with engine-portable hashing.
    """
    d = scatter(load_table(spark, sf_dir, "documents"))

    def toks(pred):
        return (
            d.filter(pred)
            .select(
                F.explode(
                    F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
                ).alias("tok")
            )
            .distinct()
        )

    from ..operators.sketches import bloom_bits, bloom_maybe_member

    members = toks(F.col("lang") == "en")
    bits = bloom_bits(members)
    probes = toks(F.col("lang") != "en")
    flagged = bloom_maybe_member(bits, probes).join(
        members.select(F.col("tok"), F.lit(True).alias("is_member")),
        "tok",
        "left",
    ).select(
        "tok",
        "maybe_member",
        F.coalesce(F.col("is_member"), F.lit(False)).alias("is_member"),
    )
    t = F.lit(1)
    return flagged.agg(
        F.count(t).alias("n_probed"),
        F.sum(F.when(F.col("is_member"), 1).otherwise(0)).alias("n_members"),
        F.sum(F.when(F.col("maybe_member"), 1).otherwise(0)).alias("n_flagged"),
        F.sum(
            F.when(F.col("maybe_member") & ~F.col("is_member"), 1).otherwise(0)
        ).alias("n_false_pos"),
        F.sum(
            F.when(F.col("is_member") & ~F.col("maybe_member"), 1).otherwise(0)
        ).alias("n_false_neg"),
    )


# ------------------------------------- Misra-Gries heavy hitters

_HH_K = 16


def _hh_oracle() -> str:
    """Exact mirror of the canonical Misra-Gries reduction: exact
    counts → rank by (c desc, tok asc) → subtract the (k+1)-th largest
    count from the kept top-k → keep positive counters. Deterministic
    because the rank order is total, so the hash compare pins the full
    construction — including the approximate regime where counters are
    genuinely decremented (the documents vocabulary is far larger than
    k=16, so delta > 0 on every fixture)."""
    return f"""
    WITH stream AS (
        SELECT u.tok AS tok
        FROM (SELECT {_DUCK_CMS_TOKS} AS l FROM documents), unnest(l) AS u(tok)
    ),
    counts AS (SELECT tok, count(*) AS c FROM stream GROUP BY tok),
    ranked AS (
        SELECT tok, c, row_number() OVER (ORDER BY c DESC, tok ASC) AS rn
        FROM counts
    ),
    delta AS (
        SELECT coalesce(max(CASE WHEN rn = {_HH_K + 1} THEN c END), 0) AS d
        FROM ranked WHERE rn <= {_HH_K + 1}
    )
    SELECT r.tok AS token,
           r.c AS exact_count,
           r.c - d.d AS hh_count
    FROM ranked r, delta d
    WHERE r.rn <= {_HH_K} AND r.c - d.d > 0
    """


@query("q_heavy_hitters", oracle=_hh_oracle())
def q_heavy_hitters(spark, sf_dir):
    """Misra-Gries heavy-hitter summary over the document token stream
    (`operators/sketches.py:hh_table`) — the frequent-items sketch
    beside count-min/bloom/HLL/histogram, k=16 counters. Output joins
    the exact count so the MG guarantee is visible in the checked
    values: hh_count ≤ exact_count ≤ hh_count + N/(k+1), and every
    token with exact_count > N/(k+1) appears.

    vs q_vocab_topk: top-k reports the k most frequent with EXACT
    counts but cannot be merged after the fact; the MG summary is the
    MERGEABLE form — constant-size daily summaries sum per token and
    re-reduce (`hh_merge`), errors adding linearly, without ever
    reprocessing the raw streams (Agarwal et al., PODS 2012 §3). The
    merge law and both guarantees are pinned in tests/test_sketches.py.

    Scale shape: one map-side-combining count aggregate; the rank cut
    compiles to a WindowGroupLimit so only k+1 rows per partition reach
    the final stage; the delta is a 1-row broadcast scalar."""
    from ..operators.sketches import hh_table

    d = scatter(load_table(spark, sf_dir, "documents"))
    stream = d.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("tok")
    )
    summary = hh_table(stream, k=_HH_K)
    exact = stream.groupBy("tok").agg(F.count(F.lit(1)).alias("exact_count"))
    return (
        summary.join(exact, "tok")
        .select(
            F.col("tok").alias("token"),
            "exact_count",
            F.col("c").alias("hh_count"),
        )
    )


# ------------------------------------- bloom-pruned join (runtime filter)


def _bloom_prune_oracle() -> str:
    """The oracle is the PLAIN join — the bloom prefilter is
    semantics-preserving by construction (no false negatives, and the
    final equi-join eliminates every false positive), so the sketch
    side needs no mirroring at all. That IS the property being checked:
    pruning must never change the answer."""
    return """
    SELECT p.p_brand AS brand,
           CAST(count(*) AS BIGINT) AS n_items,
           round(sum(l.l_extendedprice * (1 - l.l_discount)), 4) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_size = 1
    GROUP BY p.p_brand
    """


@query("q_bloom_pruned_join", oracle=_bloom_prune_oracle())
def q_bloom_pruned_join(spark, sf_dir):
    """Runtime-filter join pruning built from the relational bloom
    sketch: the dim side (parts with p_size = 1, ~2% of parts) builds
    the constant-size bit relation once, and the fact scan is
    pre-filtered MAP-SIDE — K chained broadcast left-semi joins, one
    per hash function, each on that function's computed cell — before
    any shuffle or the real join runs. No false negatives means no
    lost rows; false positives survive the prefilter but die in the
    real equi-join, so the result is bit-identical to the plain join
    (which is exactly what the oracle runs).

    This is the engine-internal `runtime bloom filter pushdown`
    pattern (Spark's spark.sql.optimizer.runtime.bloomFilter, Iceberg
    row-group bloom skipping) built from first principles: at 100 TB
    the shuffle after pruning carries ~(selectivity + ε) of the fact
    table instead of all of it — the ε is the bloom false-positive
    rate, measured and bounded in tests/test_sketches.py.

    Plan shape: 4 BroadcastHashJoin(LeftSemi) over the ≤ K·W-row bit
    relation, then one broadcast join to the small dim — zero extra
    shuffles (tests/test_plans.py pins it). Hash family: the
    engine-native xxhash64 cells (2.3× faster than the md5 family,
    measured min-of-3 at sf0.1: 1.4s vs 3.2s) — portability of the
    CELLS is irrelevant here precisely because the oracle is the plain
    join; q_bloom_filter keeps the md5 family its oracle rebuilds."""
    from ..operators.sketches import bloom_bits_fast, bloom_prune

    part = load_table(spark, sf_dir, "part")
    dim = part.filter(F.col("p_size") == 1).select("p_partkey", "p_brand")
    bits = bloom_bits_fast(
        dim.select(F.col("p_partkey").alias("tok"))
    ).localCheckpoint()  # K consumers; the bit relation is ≤ K·W rows
    li = scatter(load_table(spark, sf_dir, "lineitem")).select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    pruned = bloom_prune(li, F.col("l_partkey"), bits, family="xxhash")
    return (
        pruned.join(F.broadcast(dim), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.col("p_brand").alias("brand"))
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


# -------------------------------------------------------- hyperloglog

_HLL_M = 64  # buckets (first 6 md5 bits)
_HLL_ALPHA = 0.7213 / (1 + 1.079 / _HLL_M)


def _hll_rho_sql(hexpr: str) -> str:
    """CASE chain: position of the first 1-bit in the 52 bits held by
    hex chars 3..15 of md5 (1-based; 53 when all zero)."""
    arms = []
    for i in range(13):
        nib = f"(strpos('0123456789abcdef', substr({hexpr}, {3 + i}, 1)) - 1)"
        arms.append(
            f"WHEN {nib} > 0 THEN {4 * i + 4} - CAST(floor(log2({nib})) AS BIGINT)"
        )
    return "CASE " + " ".join(arms) + " ELSE 53 END"


def _hll_oracle() -> str:
    """Bit-identical HLL rebuild in SQL: same md5 bucket/rho split, the
    same alpha literal, the same small-range correction."""
    from ._sqlgen import hex_int

    bucket = f"({hex_int('h', 1, 2)} % {_HLL_M})"
    return f"""
    WITH stream AS (
        SELECT md5(u.tok) AS h
        FROM (SELECT {_DUCK_CMS_TOKS} AS l FROM documents), unnest(l) AS u(tok)
    ),
    regs AS (
        SELECT {bucket} AS bucket, max({_hll_rho_sql('h')}) AS m
        FROM stream GROUP BY {bucket}
    ),
    agg AS (
        SELECT sum(power(2.0, -m)) + ({_HLL_M} - count(*)) AS denom,
               {_HLL_M} - count(*) AS zeros
        FROM regs
    ),
    est AS (
        SELECT CASE
            WHEN CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M * _HLL_M} / denom <= {2.5 * _HLL_M}
                 AND zeros > 0
            THEN {_HLL_M} * ln({_HLL_M} * 1.0 / zeros)
            ELSE CAST({_HLL_ALPHA!r} AS DOUBLE) * {_HLL_M * _HLL_M} / denom
        END AS raw
        FROM agg
    )
    SELECT round((SELECT raw FROM est), 4) AS hll_estimate,
           (SELECT count(DISTINCT tok) FROM (
               SELECT u.tok AS tok
               FROM (SELECT {_DUCK_CMS_TOKS} AS l FROM documents),
                    unnest(l) AS u(tok))) AS exact_distinct
    """


@query("q_hll", oracle=_hll_oracle())
def q_hll(spark, sf_dir):
    """HyperLogLog from first principles (the cardinality member of the
    sketch trio: q_count_min = frequency, q_bloom_filter = membership):
    md5 splits into a 6-bit bucket and 52 payload bits, the register
    table is max(first-1-bit-position) per bucket — 64 rows of
    mergeable state regardless of corpus size — and the harmonic-mean
    estimate with small-range correction follows Flajolet et al. §4.
    The DuckDB oracle rebuilds the identical registers (same hashes,
    same alpha literal, same correction branch), so the comparison is
    exact, not a tolerance band. Output: (hll_estimate,
    exact_distinct) side by side.

    This is what `approx_count_distinct` does inside the JVM — built
    here as two hash aggregates so the mechanics (and the 64-row state
    that makes streaming/partition merges free) are visible and
    portable.
    """
    d = scatter(load_table(spark, sf_dir, "documents"))
    stream = d.select(
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("tok")
    )
    from ..operators.sketches import hll_estimate, hll_registers

    est = hll_estimate(hll_registers(stream))
    exact = stream.agg(F.count_distinct("tok").alias("exact_distinct"))
    return est.crossJoin(F.broadcast(exact))


# --------------------------------------------- CMS join-size estimate

def _join_size_oracle() -> str:
    """Both the exact join size and the CMS inner-product estimate
    rebuilt in SQL with the same md5 cells as operators/sketches.py."""
    from ._sqlgen import hex_int

    md5_expr = "md5(CAST(fn AS VARCHAR) || ':' || tok)"
    bucket = f"({hex_int(md5_expr, 1, 8)} % {_CMS_W})"
    return f"""
    WITH ca AS (
        SELECT CAST(o_custkey AS VARCHAR) AS tok, count(*) AS c
        FROM orders GROUP BY o_custkey
    ),
    cb AS (
        SELECT CAST(c_custkey AS VARCHAR) AS tok, count(*) AS c
        FROM customer GROUP BY c_custkey
    ),
    exact AS (
        SELECT CAST(sum(ca.c * cb.c) AS BIGINT) AS exact_join_size
        FROM ca JOIN cb USING (tok)
    ),
    cms_a AS (
        SELECT fn, {bucket} AS bucket, sum(c) AS c
        FROM ca, (SELECT unnest(range(0, {_CMS_K})) AS fn)
        GROUP BY fn, {bucket}
    ),
    cms_b AS (
        SELECT fn, {bucket} AS bucket, sum(c) AS c
        FROM cb, (SELECT unnest(range(0, {_CMS_K})) AS fn)
        GROUP BY fn, {bucket}
    ),
    est AS (
        SELECT CAST(min(prod) AS BIGINT) AS cms_estimate FROM (
            SELECT a.fn, sum(a.c * b.c) AS prod
            FROM cms_a a JOIN cms_b b ON a.fn = b.fn AND a.bucket = b.bucket
            GROUP BY a.fn
        )
    )
    SELECT (SELECT exact_join_size FROM exact) AS exact_join_size,
           (SELECT cms_estimate FROM est) AS cms_estimate
    """


@query("q_join_size_estimate", oracle=_join_size_oracle())
def q_join_size_estimate(spark, sf_dir):
    """Join-cardinality estimation from count-min sketches — the query-
    planning application of q_count_min: |A ⋈ B| on a key equals
    Σ_v c_A(v)·c_B(v), and the CMS inner product Σ_b cmsA[fn][b]·
    cmsB[fn][b] (min over the K rows) upper-bounds it using only the
    two constant-size sketches. This is how an optimizer sizes a
    100 TB join WITHOUT touching either table a second time: each side
    keeps a K×512 sketch from ingest, and the estimate is a ~2k-row
    join. Output: exact vs estimate side by side on customer⋈orders
    (estimate ≥ exact always; collisions only ever add).
    """
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").cast("string").alias("tok")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").cast("string").alias("tok")
    )
    from ..operators.sketches import cms_table

    ca = o.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    cb = c.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    exact = (
        ca.join(cb.withColumnRenamed("c", "c2"), "tok")
        .agg(F.sum(F.col("c") * F.col("c2")).alias("exact_join_size"))
    )
    cms_a = cms_table(o)
    cms_b = cms_table(c).withColumnRenamed("c", "c2")
    est = (
        cms_a.join(cms_b, ["fn", "bucket"])
        .groupBy("fn")
        .agg(F.sum(F.col("c") * F.col("c2")).alias("prod"))
        .agg(F.min("prod").alias("cms_estimate"))
    )
    return exact.crossJoin(F.broadcast(est))


_HIST_LO, _HIST_HI, _HIST_BINS = 0.0, 110_000.0, 256
_HIST_W = (_HIST_HI - _HIST_LO) / _HIST_BINS  # 429.6875, binary-exact
_HIST_QS = (0.25, 0.5, 0.75, 0.9, 0.99)


@query(
    "q_histogram_quantiles",
    oracle=f"""
    WITH h AS (
        SELECT greatest(0, least({_HIST_BINS - 1},
                   CAST(floor(l_extendedprice / {_HIST_W}) AS BIGINT))) AS bin,
               count(*) AS c
        FROM lineitem GROUP BY 1
    ),
    cum AS (
        SELECT a.bin, sum(b.c) AS cum
        FROM h a LEFT JOIN h b ON b.bin <= a.bin
        GROUP BY a.bin
    ),
    t AS (SELECT sum(c) AS n_total FROM h),
    qq AS (SELECT unnest([{", ".join(str(q) for q in _HIST_QS)}]) AS q)
    SELECT q, min(bin) AS bin,
           round((min(bin) + 0.5) * {_HIST_W}, 6) AS estimate
    FROM cum CROSS JOIN t CROSS JOIN qq
    WHERE cum >= q * n_total
    GROUP BY q
    """,
)
def q_histogram_quantiles(spark, sf_dir):
    """Mergeable equi-width histogram sketch + quantile estimation
    (operators/sketches.py:hist_table) — the percentile-monitoring
    primitive at 100 TB: per-partition/per-day histograms are ≤256-row
    additive relations (merge = cell-wise sum, exactly the CMS family),
    and any quantile is read off the merged histogram with ≤ bin-width
    error, without ever sorting or shuffling the raw values.

    The estimator is fully deterministic (first bin whose cumulative
    reaches q·N, midpoint estimate), so the DuckDB oracle rebuilds the
    identical sketch and the hash check pins the whole path. The
    cumulative runs as a triangular broadcast join over the tiny bin
    relation — no unpartitioned window (plan-guard clean)."""
    from ..operators.sketches import hist_quantiles, hist_table

    li = _t(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("v")
    )
    h = hist_table(li, "v", lo=_HIST_LO, hi=_HIST_HI, n_bins=_HIST_BINS)
    return hist_quantiles(
        h, list(_HIST_QS), lo=_HIST_LO, hi=_HIST_HI, n_bins=_HIST_BINS
    )


def _ann_recall_oracle() -> str:
    planes = hyperplane_sql_literals(DEFAULT_BITS, _DIM)
    plane_cols = ", ".join(f"{p} AS h{b}" for b, p in enumerate(planes))
    return f"""
    WITH p AS (SELECT {plane_cols}),
    v AS (
        SELECT vec_id, embedding::DOUBLE[] AS e,
               CAST({duck_sig_sql(_DIM)} AS BIGINT) AS sig
        FROM embeddings, p
    ),
    q AS (SELECT vec_id AS qid, e AS qe, sig FROM v WHERE vec_id % 50 = 0),
    ann AS (
        SELECT qid, nid FROM (
            SELECT q.qid, v.vec_id AS nid,
                   round({duck_cosine_sql('q.qe', 'v.e', _DIM)}, 6) AS sim,
                   row_number() OVER (
                       PARTITION BY q.qid
                       ORDER BY round({duck_cosine_sql('q.qe', 'v.e', _DIM)}, 6)
                                DESC, v.vec_id) AS rn
            FROM q JOIN v ON v.sig = q.sig AND v.vec_id <> q.qid
        ) WHERE rn <= 3
    ),
    exact AS (
        SELECT qid, nid FROM (
            SELECT q.qid, v.vec_id AS nid,
                   row_number() OVER (
                       PARTITION BY q.qid
                       ORDER BY round({duck_cosine_sql('q.qe', 'v.e', _DIM)}, 6)
                                DESC, v.vec_id) AS rn
            FROM q JOIN v ON v.vec_id <> q.qid
        ) WHERE rn <= 3
    ),
    hits AS (
        SELECT e.qid, count(*) AS n_hit
        FROM exact e JOIN ann a ON a.qid = e.qid AND a.nid = e.nid
        GROUP BY e.qid
    )
    SELECT q.qid,
           CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           round(coalesce(h.n_hit, 0) / 3.0, 6) AS recall
    FROM q LEFT JOIN hits h ON h.qid = q.qid
    """


@query("q_ann_recall", oracle=_ann_recall_oracle())
def q_ann_recall(spark, sf_dir):
    """Recall@3 of the LSH ANN path against the exact top-3 — the
    standard quality metric every approximate index ships with (how
    many of the TRUE nearest neighbors does the bucketed search find).
    Both sides run the engine's own operators: lsh_bucket_topk for the
    candidates, brute_force_topk for the ground truth, one semi-join
    counts the overlap per query.

    Scale shape: the ANN side is the production bucketed join; the
    exact side is the EVAL harness and runs on a sampled query set
    (vec_id % 50 — recall estimation needs a sample, not the corpus),
    so the brute-force cost is queries × corpus with a broadcast query
    table, bounded by the sample size. This is exactly how recall is
    monitored on a billion-vector index."""
    from ..operators.similarity import brute_force_topk

    pred = F.col("vec_id") % 50 == 0
    v = scatter(
        _t(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
    )
    qs = v.filter(pred).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    exact = brute_force_topk(v, qs, k=3).select("qid", "nid")
    ann = lsh_bucket_topk(v, dim=_DIM, k=3, query_pred=pred).select(
        "qid", "nid"
    )
    hits = (
        exact.join(ann, ["qid", "nid"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        qs.select("qid")
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(F.coalesce(F.col("n_hit"), F.lit(0)) / 3.0, 6).alias(
                "recall"
            ),
        )
    )


def _ann_recall_multiprobe_oracle() -> str:
    planes = hyperplane_sql_literals(DEFAULT_BITS, _DIM)
    plane_cols = ", ".join(f"{p} AS h{b}" for b, p in enumerate(planes))
    return f"""
    WITH p AS (SELECT {plane_cols}),
    v AS (
        SELECT vec_id, embedding::DOUBLE[] AS e,
               CAST({duck_sig_sql(_DIM)} AS BIGINT) AS sig
        FROM embeddings, p
    ),
    q AS (SELECT vec_id AS qid, e AS qe, sig FROM v WHERE vec_id % 50 = 0),
    ann AS (
        SELECT qid, nid FROM (
            SELECT q.qid, v.vec_id AS nid,
                   round({duck_cosine_sql('q.qe', 'v.e', _DIM)}, 6) AS sim,
                   row_number() OVER (
                       PARTITION BY q.qid
                       ORDER BY round({duck_cosine_sql('q.qe', 'v.e', _DIM)}, 6)
                                DESC, v.vec_id) AS rn
            FROM q JOIN v
              ON v.vec_id <> q.qid
             AND v.sig IN (q.sig, xor(q.sig, 1), xor(q.sig, 2))
        ) WHERE rn <= 3
    ),
    exact AS (
        SELECT qid, nid FROM (
            SELECT q.qid, v.vec_id AS nid,
                   row_number() OVER (
                       PARTITION BY q.qid
                       ORDER BY round({duck_cosine_sql('q.qe', 'v.e', _DIM)}, 6)
                                DESC, v.vec_id) AS rn
            FROM q JOIN v ON v.vec_id <> q.qid
        ) WHERE rn <= 3
    ),
    hits AS (
        SELECT e.qid, count(*) AS n_hit
        FROM exact e JOIN ann a ON a.qid = e.qid AND a.nid = e.nid
        GROUP BY e.qid
    )
    SELECT q.qid,
           CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           round(coalesce(h.n_hit, 0) / 3.0, 6) AS recall
    FROM q LEFT JOIN hits h ON h.qid = q.qid
    """


@query("q_ann_recall_multiprobe", oracle=_ann_recall_multiprobe_oracle())
def q_ann_recall_multiprobe(spark, sf_dir):
    """Recall@3 with multi-probe LSH (probes=2: each query also
    searches the two buckets at Hamming distance 1 on its first
    signature bits) — the standard recall lever, measured: candidate
    volume grows ~3× while the index stays single-signature, and the
    per-query recall rows are directly comparable to q_ann_recall's
    single-bucket baseline. Same eval harness, same oracle contract."""
    from ..operators.similarity import brute_force_topk

    pred = F.col("vec_id") % 50 == 0
    v = scatter(
        _t(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
    )
    qs = v.filter(pred).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    exact = brute_force_topk(v, qs, k=3).select("qid", "nid")
    ann = lsh_bucket_topk(
        v, dim=_DIM, k=3, query_pred=pred, probes=2
    ).select("qid", "nid")
    hits = (
        exact.join(ann, ["qid", "nid"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        qs.select("qid")
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(F.coalesce(F.col("n_hit"), F.lit(0)) / 3.0, 6).alias(
                "recall"
            ),
        )
    )


# --------------------------------------- retrieval quality: MRR + NDCG@5

# Exact-arithmetic NDCG: log2 is transcendental (last-ulp rounding can
# differ across engines), so the per-rank discounts are INTEGER
# micro-unit literals round(1e6/log2(i+1)) computed ONCE here and
# embedded identically in the Spark expressions and the oracle SQL —
# DCG/IDCG become exact integer sums and NDCG one IEEE division.
import math as _math  # noqa: E402

_NDCG_K = 5
_NDCG_W = [round(1e6 / _math.log2(i + 1)) for i in range(1, _NDCG_K + 1)]
_NDCG_PREFIX = [0]
for _w in _NDCG_W:
    _NDCG_PREFIX.append(_NDCG_PREFIX[-1] + _w)


def _retrieval_metrics_oracle() -> str:
    w_case = " ".join(
        f"WHEN {i + 1} THEN {w}" for i, w in enumerate(_NDCG_W)
    )
    p_case = " ".join(
        f"WHEN {m} THEN {p}" for m, p in enumerate(_NDCG_PREFIX)
    )
    return f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS e, label FROM embeddings
    ),
    q AS (
        SELECT vec_id AS qid, e AS qe, label AS qlabel
        FROM v WHERE vec_id % 25 = 0
    ),
    ranked AS (
        SELECT qid, qlabel, nid, nlabel, rn FROM (
            SELECT q.qid, q.qlabel, v.vec_id AS nid, v.label AS nlabel,
                   row_number() OVER (
                       PARTITION BY q.qid
                       ORDER BY round({duck_cosine_sql('q.qe', 'v.e', _DIM)}, 6)
                                DESC, v.vec_id) AS rn
            FROM q JOIN v ON v.vec_id <> q.qid
        ) WHERE rn <= {_NDCG_K}
    ),
    per_q AS (
        SELECT qid,
               CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rel_topk,
               CAST(sum(CASE WHEN nlabel = qlabel
                        THEN CASE rn {w_case} ELSE 0 END
                        ELSE 0 END) AS BIGINT) AS dcg_int,
               min(CASE WHEN nlabel = qlabel THEN rn END) AS first_rel
        FROM ranked GROUP BY qid
    ),
    rel_corpus AS (
        SELECT q.qid,
               least({_NDCG_K},
                     (SELECT count(*) FROM v
                      WHERE v.label = q.qlabel AND v.vec_id <> q.qid)) AS m
        FROM q
    )
    SELECT p.qid,
           p.n_rel_topk,
           CASE WHEN p.first_rel IS NULL THEN 0.0
                ELSE CAST(1 AS DOUBLE) / p.first_rel END AS mrr,
           CASE WHEN (CASE r.m {p_case} ELSE 0 END) = 0 THEN 0.0
                ELSE CAST(p.dcg_int AS DOUBLE)
                     / (CASE r.m {p_case} ELSE 0 END) END AS ndcg
    FROM per_q p JOIN rel_corpus r ON r.qid = p.qid
    """


@query("q_retrieval_metrics", oracle=_retrieval_metrics_oracle())
def q_retrieval_metrics(spark, sf_dir):
    """Graded retrieval quality — MRR and NDCG@5 per query, the ranking
    metrics that complete the retrieval-eval family next to recall@k
    (q_ann_recall) and AP/AUC (q_average_precision/q_auc). Relevance is
    label match (a query's relevant set = same-label vectors), ranking
    is the engine's exact cosine top-5.

    Exact-arithmetic discipline: rank discounts 1/log2(rank+1) are
    integer micro-unit LITERALS shared between the Spark plan and the
    oracle SQL, so DCG and IDCG are exact integer sums (order-free) and
    each metric is one IEEE division — no transcendental ever touches
    checked values. IDCG uses the standard ideal: prefix-sum of
    discounts over min(k, #relevant-in-corpus).

    Scale shape: the ranking side is the eval harness (broadcast
    sampled queries × corpus — same exemption as q_ann_recall); the
    per-label corpus counts are a broadcast ≤|labels|-row aggregate."""
    from ..operators.similarity import brute_force_topk

    v = scatter(
        _t(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e"), "label"
        )
    )
    qs = v.filter(F.col("vec_id") % 25 == 0).select(
        F.col("vec_id").alias("qid"),
        F.col("e").alias("qe"),
        F.col("label").alias("qlabel"),
    )
    top = brute_force_topk(
        v.select("vec_id", "e"), qs.select("qid", "qe"), k=_NDCG_K
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    ranked = (
        top.withColumn("rn", F.row_number().over(w))
        .join(F.broadcast(qs.select("qid", "qlabel")), "qid")
        .join(
            v.select(F.col("vec_id").alias("nid"), F.col("label").alias("nlabel")),
            "nid",
        )
    )
    rel = (F.col("nlabel") == F.col("qlabel")).cast("int")
    w_arr = F.array(*[F.lit(x) for x in _NDCG_W])
    per_q = ranked.groupBy("qid").agg(
        F.sum(rel).alias("n_rel_topk"),
        F.sum(rel * F.element_at(w_arr, F.col("rn"))).alias("dcg_int"),
        F.min(F.when(rel == 1, F.col("rn"))).alias("first_rel"),
    )
    label_counts = v.groupBy("label").agg(F.count(F.lit(1)).alias("n_lab"))
    prefix_arr = F.array(*[F.lit(x) for x in _NDCG_PREFIX])
    rel_corpus = (
        qs.select("qid", "qlabel")
        .join(
            F.broadcast(label_counts),
            F.col("qlabel") == F.col("label"),
            "left",
        )
        .select(
            "qid",
            F.least(
                F.lit(_NDCG_K), F.coalesce(F.col("n_lab"), F.lit(1)) - 1
            ).alias("m"),
        )
    )
    idcg = F.element_at(prefix_arr, (F.col("m") + 1).cast("int"))
    return per_q.join(rel_corpus, "qid").select(
        "qid",
        "n_rel_topk",
        F.when(F.col("first_rel").isNull(), F.lit(0.0))
        .otherwise(F.lit(1.0) / F.col("first_rel"))
        .alias("mrr"),
        F.when(idcg == 0, F.lit(0.0))
        .otherwise(F.col("dcg_int").cast("double") / idcg)
        .alias("ndcg"),
    )


def _ann_ivf_recall_oracle() -> str:
    return f"""
    WITH v AS (
        SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
    ),
    c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id % 50 = 1),
    scored AS (
        SELECT v.vec_id, v.e, c.cid,
               {duck_cosine_sql('v.e', 'c.ce', _DIM)} AS csim
        FROM v, c
    ),
    assigned AS (
        SELECT vec_id, cid, e FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY csim DESC, cid) AS rn
            FROM scored
        ) WHERE rn = 1
    ),
    probes AS (
        SELECT vec_id AS qid, e AS qe, cid FROM (
            SELECT *, row_number() OVER (PARTITION BY vec_id
                                         ORDER BY csim DESC, cid) AS rn
            FROM scored WHERE vec_id % 50 = 0
        ) WHERE rn <= 2
    ),
    ann AS (
        SELECT qid, nid FROM (
            SELECT p.qid, a.vec_id AS nid,
                   row_number() OVER (
                       PARTITION BY p.qid
                       ORDER BY round({duck_cosine_sql('p.qe', 'a.e', _DIM)}, 6)
                                DESC, a.vec_id) AS rn
            FROM probes p JOIN assigned a
              ON a.cid = p.cid AND a.vec_id <> p.qid
        ) WHERE rn <= 3
    ),
    q AS (SELECT vec_id AS qid, e AS qe FROM v WHERE vec_id % 50 = 0),
    exact AS (
        SELECT qid, nid FROM (
            SELECT q.qid, v.vec_id AS nid,
                   row_number() OVER (
                       PARTITION BY q.qid
                       ORDER BY round({duck_cosine_sql('q.qe', 'v.e', _DIM)}, 6)
                                DESC, v.vec_id) AS rn
            FROM q JOIN v ON v.vec_id <> q.qid
        ) WHERE rn <= 3
    ),
    hits AS (
        SELECT e.qid, count(*) AS n_hit
        FROM exact e JOIN ann a ON a.qid = e.qid AND a.nid = e.nid
        GROUP BY e.qid
    )
    SELECT q.qid,
           CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           round(coalesce(h.n_hit, 0) / 3.0, 6) AS recall
    FROM q LEFT JOIN hits h ON h.qid = q.qid
    """


@query("q_ann_ivf_recall", oracle=_ann_ivf_recall_oracle())
def q_ann_ivf_recall(spark, sf_dir):
    """Recall@3 of the IVF path against the exact top-3 — the quality
    monitor for the SECOND index family (q_ann_recall covers the LSH
    one; a production shop monitors every index it serves). Candidates
    come from `ivf_topk` (nprobe=2 coarse clusters), ground truth from
    `brute_force_topk` on the sampled query set, one semi-join counts
    overlap per query. The nprobe knob is the recall lever here the way
    multi-probe Hamming-1 buckets are for LSH
    (q_ann_recall_multiprobe).

    Scale shape: identical to q_ann_recall — the IVF side is the
    production cluster-bounded join; the exact side is the eval
    harness over sampled queries (vec_id % 50)."""
    from ..operators.similarity import brute_force_topk, ivf_topk

    pred = F.col("vec_id") % 50 == 0
    v = scatter(
        _t(spark, sf_dir, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("e")
        )
    )
    qs = v.filter(pred).select(
        F.col("vec_id").alias("qid"), F.col("e").alias("qe")
    )
    exact = brute_force_topk(v, qs, k=3).select("qid", "nid")
    ann = ivf_topk(
        v,
        k=3,
        query_pred=pred,
        centroid_pred=F.col("vec_id") % 50 == 1,
        nprobe=2,
    ).select("qid", "nid")
    hits = (
        exact.join(ann, ["qid", "nid"])
        .groupBy("qid")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        qs.select("qid")
        .join(hits, "qid", "left")
        .select(
            "qid",
            F.coalesce(F.col("n_hit"), F.lit(0)).alias("n_hit"),
            F.round(F.coalesce(F.col("n_hit"), F.lit(0)) / 3.0, 6).alias(
                "recall"
            ),
        )
    )


# ------------------------------------------- int8 embedding quantization


@query(
    "q_int8_quantize",
    oracle="""
    WITH e AS (
        SELECT vec_id,
               list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ed
        FROM embeddings
    ),
    a AS (
        SELECT vec_id, ed,
               list_max(list_transform(ed, x -> abs(x))) AS amax
        FROM e
    ),
    c AS (
        SELECT vec_id, amax,
               list_transform(ed, x -> CASE WHEN amax = 0 THEN 0
                   ELSE CAST(floor(x * 127.0 / amax) AS BIGINT) END) AS codes
        FROM a
    )
    SELECT vec_id,
           round(amax / 127.0, 6) AS scale_r,
           CAST(list_sum(codes) AS BIGINT) AS code_sum,
           CAST(list_min(codes) AS BIGINT) AS code_min,
           CAST(list_max(codes) AS BIGINT) AS code_max,
           CAST(len(list_filter(codes, v -> abs(v) >= 127)) AS BIGINT)
               AS n_sat
    FROM c
    """,
)
def q_int8_quantize(spark, sf_dir):
    """Symmetric per-vector int8 quantization of the embedding store —
    the 4× memory lever every billion-vector ANN deployment pulls
    before sharding (FAISS SQ8 / vector-DB "scalar quantization"):
    scale = max|e_i| / 127, code_i = floor(e_i·127/amax). Truncating
    (floor) rather than round-nearest keeps the quantizer cross-engine
    exact: float32→double widening is exact, the multiply/divide is
    the same IEEE op sequence on both engines, and floor is exact — so
    the integer codes hash-match bit-for-bit, no rounding edge
    anywhere. Emitted: the code moments (exact ints), saturation
    count, and the reconstruction scale (the one rounded float).

    Scale: a pure per-row projection over the corpus — zero shuffles,
    zero joins; at 100 TB this is the map stage that writes the
    quantized shadow table the ANN index then serves from. Zero-vector
    guard on BOTH engines (code 0, never NaN)."""
    v = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("ed"),
    )
    v = v.withColumn(
        "amax", F.array_max(F.transform("ed", lambda x: F.abs(x)))
    )
    codes = F.transform(
        "ed",
        lambda x: F.when(F.col("amax") == 0, F.lit(0).cast("long")).otherwise(
            F.floor(x * F.lit(127.0) / F.col("amax")).cast("long")
        ),
    )
    c = v.withColumn("codes", codes)
    return c.select(
        "vec_id",
        F.round(F.col("amax") / F.lit(127.0), 6).alias("scale_r"),
        F.aggregate(
            "codes", F.lit(0).cast("long"), lambda a, x: a + x
        ).alias("code_sum"),
        F.array_min("codes").cast("long").alias("code_min"),
        F.array_max("codes").cast("long").alias("code_max"),
        F.size(F.filter("codes", lambda x: F.abs(x) >= 127))
        .cast("long")
        .alias("n_sat"),
    )


# ------------------------------------------------ threshold confusion / F1

# threshold grid in score units (scores land in ~[-0.4, 0.46]); 0.1
# steps are NOT exactly representable in binary doubles — cross-engine
# agreement rests on both engines parsing the identical literal to the
# identical nearest double, so the oracle CASTs its unnest literals to
# DOUBLE (DuckDB would otherwise type them DECIMAL) to match Spark's
# double-typed threshold column (r8 ADVICE)
_CM_THRESHOLDS = [round(t / 10.0, 1) for t in range(-3, 4)]  # -0.3..0.3


@query(
    "q_confusion_matrix",
    oracle=f"""
    WITH scored AS (
        SELECT CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y,
               round(embedding[1] + embedding[2] * 0.5, 9) AS score
        FROM embeddings
    ),
    th AS (SELECT unnest([{", ".join(f"CAST({t} AS DOUBLE)" for t in _CM_THRESHOLDS)}]) AS t),
    cm AS (
        SELECT t,
               CAST(sum(CASE WHEN score >= t AND y = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS tp,
               CAST(sum(CASE WHEN score >= t AND y = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS fp,
               CAST(sum(CASE WHEN score < t AND y = 1 THEN 1 ELSE 0 END)
                    AS BIGINT) AS fn,
               CAST(sum(CASE WHEN score < t AND y = 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS tn
        FROM scored CROSS JOIN th
        GROUP BY t
    )
    SELECT t AS threshold, tp, fp, fn, tn,
           CASE WHEN tp + fp > 0
                THEN round(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6)
           END AS precision,
           CASE WHEN tp + fn > 0
                THEN round(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6)
           END AS recall,
           CASE WHEN 2 * tp + fp + fn > 0
                THEN round(CAST(2 * tp AS DOUBLE)
                           / CAST(2 * tp + fp + fn AS DOUBLE), 6)
           END AS f1
    FROM cm
    """,
)
def q_confusion_matrix(spark, sf_dir):
    """Threshold-sweep confusion matrix with precision/recall/F1 — the
    operating-point table behind q_auc's single summary number (an
    AUC tells you the ranker is good; a deployment needs the THRESHOLD,
    and this is the table it is read off). Same (y, score) relation as
    q_auc / q_average_precision, swept over a 7-point literal
    threshold grid.

    Determinism, house style: the four confusion cells are exact
    integer conditional counts; precision = tp/(tp+fp) and recall =
    tp/(tp+fn) are ONE IEEE division each; F1 is computed as
    2tp/(2tp+fp+fn) — the algebraic identity that avoids the float
    compound 2PR/(P+R) — so every emitted float is a single division
    of exact integers, rounded 6dp; degenerate cells NULL on both
    engines. The threshold grid is integer tenths — NOT exactly
    representable in binary doubles; agreement holds because both
    engines parse the identical literal to the identical nearest
    double (the oracle CASTs its unnest literals to DOUBLE so its
    threshold type matches Spark's double column).

    Scale: the sweep is a 7× broadcast fan of a projection followed by
    ONE map-side-combined hash aggregate to 7 rows — the fact relation
    is scanned once; no per-threshold passes."""
    emb = _t(spark, sf_dir, "embeddings").select(
        F.when(F.col("label") >= 5, 1).otherwise(0).alias("y"),
        F.round(
            F.element_at(F.col("embedding"), 1).cast("double")
            + F.element_at(F.col("embedding"), 2).cast("double") * 0.5,
            9,
        ).alias("score"),
    )
    th = spark.createDataFrame(
        [(t,) for t in _CM_THRESHOLDS], "t double"
    )
    pos = F.col("score") >= F.col("t")
    cm = (
        emb.crossJoin(F.broadcast(th))
        .groupBy("t")
        .agg(
            F.sum(F.when(pos & (F.col("y") == 1), 1).otherwise(0))
            .cast("long")
            .alias("tp"),
            F.sum(F.when(pos & (F.col("y") == 0), 1).otherwise(0))
            .cast("long")
            .alias("fp"),
            F.sum(F.when(~pos & (F.col("y") == 1), 1).otherwise(0))
            .cast("long")
            .alias("fn"),
            F.sum(F.when(~pos & (F.col("y") == 0), 1).otherwise(0))
            .cast("long")
            .alias("tn"),
        )
    )

    def _ratio(num, den):
        return F.when(
            den > 0, F.round(num.cast("double") / den.cast("double"), 6)
        )

    return cm.select(
        F.col("t").alias("threshold"),
        "tp",
        "fp",
        "fn",
        "tn",
        _ratio(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision"),
        _ratio(F.col("tp"), F.col("tp") + F.col("fn")).alias("recall"),
        _ratio(
            2 * F.col("tp"), 2 * F.col("tp") + F.col("fp") + F.col("fn")
        ).alias("f1"),
    )
