"""Vector similarity search operators (LLM-pipeline surface).

Generalizes the reference's appearance-similarity machinery
(reference feature_extraction.py:255-297: cosine over 256-d embedding
vectors) into the two standard large-scale shapes:

* ``brute_force_topk`` — exact cosine top-k; the small-query-set path
  (broadcast the queries, scan the corpus once). O(|Q|·|C|) but fully
  JVM-side and embarrassingly parallel — right answer when |Q| is
  small or a ground-truth oracle is needed.
* ``signature_lsh`` / ``lsh_bucket_topk`` — sign-random-projection LSH:
  each vector gets a b-bit signature (sign of dot with b fixed
  Rademacher hyperplanes); candidates share a signature bucket. The
  all-pairs comparison never happens — the only shuffle is the
  signature equi-join, so cost is Σ|bucket|² ≪ |C|² and the plan is a
  plain shuffled hash join Catalyst/AQE can optimize (skewed buckets
  split by AQE). This is the 100 TB scale path.

Hyperplanes are DETERMINISTIC (a fixed integer mix of (bit, dim)), so
the same planes are reproducible in any engine — the DuckDB oracle
re-derives them from the same formula via `hyperplane_sql_literals`.
All dot products fold left-to-right in both engines so the sign at the
bucket boundary is bit-identical.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_BITS = 8


def hyperplane(bit: int, dim: int) -> list[int]:
    """The ±1 Rademacher hyperplane for one signature bit.

    Entry i = the low bit of a splitmix64-style avalanche of
    (bit, i). The planes are computed HERE once and inlined as
    LITERALS on both engines (`hyperplane_sql_literals`), so the mix
    can be arbitrarily strong with zero SQL-expressibility cost.

    Why an avalanche and not a cheap linear mod-4 mix: the previous
    `((i+1)·2654435761 + (bit+1)·40503) mod 4 < 2` formula made every
    plane a cyclic shift of ONE period-4 pattern — exactly 4 distinct
    hyperplanes for ANY (n_bits, dim), so an n-bit signature had at
    most ~16 distinct values and LSH candidate reduction was capped at
    ~1/16th of the corpus regardless of configured bits (measured on a
    1M-vector synthetic corpus; see
    tests/test_scale_patterns.py::test_lsh_candidate_growth). With
    independent planes the bucket count actually tracks 2^n_bits and
    the reduction scales the way the 100 TB design assumes.
    """
    mask = (1 << 64) - 1
    out = []
    for i in range(dim):
        z = ((bit + 1) * 0x9E3779B97F4A7C15 + (i + 1) * 0xBF58476D1CE4E5B9) & mask
        z ^= z >> 30
        z = (z * 0x94D049BB133111EB) & mask
        z ^= z >> 27
        z = (z * 0xFF51AFD7ED558CCD) & mask
        z ^= z >> 31
        out.append(1 if z & 1 else -1)
    return out


def hyperplane_sql_literals(n_bits: int, dim: int) -> list[str]:
    """DuckDB array literals of the same hyperplanes, for oracle SQL."""
    return [
        "[" + ", ".join(f"{v}.0" for v in hyperplane(b, dim)) + "]"
        for b in range(n_bits)
    ]


# ---- DuckDB-side mirrors (oracle SQL fragments) -----------------------
# ONE canonical rendering of the fold-order-stable dot / norm / cosine /
# signature expressions. Every oracle that must be bit-identical to the
# Spark side builds from these — a second hand-written copy would let a
# future edit (fold order, bit count) silently desynchronize the hashes.


def duck_seq_dot_sql(a: str, b: str, dim: int) -> str:
    """DuckDB left-fold dot product, bit-identical to `seq_dot`."""
    return (
        f"list_reduce(list_transform(range(1, {dim + 1}), "
        f"i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
    )


def duck_norm_sql(a: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform({a}, x -> x * x), "
        "(x, y) -> x + y))"
    )


def duck_cosine_sql(a: str, b: str, dim: int) -> str:
    return (
        f"({duck_seq_dot_sql(a, b, dim)} "
        f"/ ({duck_norm_sql(a)} * {duck_norm_sql(b)}))"
    )


def duck_sig_sql(
    dim: int, n_bits: int = DEFAULT_BITS, vec: str = "e", plane_prefix: str = "p.h"
) -> str:
    """The b-bit sign-LSH signature as a DuckDB expression (planes from
    a CTE aliased `p`, columns `h0..h{n_bits-1}` via
    `hyperplane_sql_literals`)."""
    return " + ".join(
        f"(CASE WHEN {duck_seq_dot_sql(vec, f'{plane_prefix}{b}', dim)} > 0 "
        f"THEN {1 << b} ELSE 0 END)"
        for b in range(n_bits)
    )


def seq_dot(a: Column, b: Column) -> Column:
    """Left-to-right sequential dot product (order-stable across engines)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def norm(a: Column) -> Column:
    """L2 norm with the same left-to-right fold as `duck_norm_sql`."""
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def cosine(a: Column, b: Column) -> Column:
    return seq_dot(a, b) / (norm(a) * norm(b))


def cosine_prenormed(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """Cosine with norms precomputed PER VECTOR instead of per pair.

    On a pair-producing join, `cosine()` re-folds both norms for every
    pair — ~2/3 of the per-pair work. Projecting `norm(e)` below the
    join evaluates it once per row; the value (hence the quotient) is
    bit-identical, so oracles are unaffected. Measured ~1.5-2× on the
    bucket-rerank and brute-force hot paths.
    """
    return seq_dot(a, b) / (na * nb)


def signature_lsh(
    df: DataFrame, vec_col: str, dim: int, n_bits: int = DEFAULT_BITS
) -> DataFrame:
    """Add an integer `sig` column: the b-bit sign-LSH signature.

    `vec_col` must already be a materialized array<double> column (HOF
    lambdas re-evaluate inlined expressions — see queries_llm shingle
    note). Pure Catalyst expressions; no shuffle.
    """
    sig = None
    for b in range(n_bits):
        plane = F.array(*[F.lit(float(v)) for v in hyperplane(b, dim)])
        bit = F.when(seq_dot(F.col(vec_col), plane) > 0, F.lit(1 << b)).otherwise(
            F.lit(0)
        )
        sig = bit if sig is None else sig + bit
    return df.withColumn("sig", sig.cast("long"))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    query_id: str = "qid",
    vec_col: str = "e",
    query_vec_col: str = "qe",
    round_digits: int = 6,
) -> DataFrame:
    """Exact cosine top-k: broadcast queries × corpus scan + rank window.

    Similarity is rounded before ranking (tie-break: neighbor id) so
    float summation-order differences can't flip ranks across engines.
    """
    corpus_n = corpus.withColumn("_nrm", norm(F.col(vec_col)))
    queries_n = queries.withColumn("_qnrm", norm(F.col(query_vec_col)))
    sims = (
        F.broadcast(queries_n)
        .join(corpus_n, F.col(corpus_id) != F.col(query_id))
        .select(
            query_id,
            F.col(corpus_id).alias("nid"),
            F.round(
                cosine_prenormed(
                    F.col(query_vec_col), F.col(vec_col),
                    F.col("_qnrm"), F.col("_nrm"),
                ),
                round_digits,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(F.col("sim").desc(), F.col("nid").asc())
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop(
        "rn"
    )


def lsh_bucket_topk(
    vectors: DataFrame,
    dim: int,
    k: int,
    query_pred: Column,
    n_bits: int = DEFAULT_BITS,
    id_col: str = "vec_id",
    vec_col: str = "e",
    round_digits: int = 6,
    probes: int = 0,
) -> DataFrame:
    """ANN top-k: candidates restricted to the query's LSH bucket(s).

    Equi-join on `sig` replaces the all-pairs cross join; recall < 1 by
    design (vectors in other buckets are never scored) — the standard
    LSH trade. `probes` > 0 enables multi-probe: each query also
    searches the buckets at Hamming distance 1 obtained by flipping its
    first `probes` signature bits — candidate volume grows ~(probes+1)×
    while the corpus side is still touched only via the equi-join (the
    standard recall lever; index stays single-signature).
    """
    signed = signature_lsh(vectors, vec_col, dim, n_bits).withColumn(
        "_nrm", norm(F.col(vec_col))
    )
    q = signed.filter(query_pred).select(
        F.col(id_col).alias("qid"),
        F.col(vec_col).alias("qe"),
        F.col("_nrm").alias("_qnrm"),
        "sig",
    )
    if probes > 0:
        probe_sigs = F.array(
            F.col("sig"),
            *[
                F.col("sig").bitwiseXOR(F.lit(1 << b))
                for b in range(min(probes, n_bits))
            ],
        )
        q = q.select(
            "qid", "qe", "_qnrm", F.explode(probe_sigs).alias("sig")
        )
    sims = (
        F.broadcast(q)
        .join(signed, "sig")
        .filter(F.col(id_col) != F.col("qid"))
        .select(
            "qid",
            F.col(id_col).alias("nid"),
            F.round(
                cosine_prenormed(
                    F.col("qe"), F.col(vec_col), F.col("_qnrm"), F.col("_nrm")
                ),
                round_digits,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("sim").desc(), F.col("nid").asc())
    return sims.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k).drop(
        "rn"
    )


def ivf_topk(
    vectors: DataFrame,
    k: int,
    query_pred: Column,
    centroid_pred: Column,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "e",
    round_digits: int = 6,
) -> DataFrame:
    """ANN top-k via an IVF (inverted-file) coarse quantizer — the
    cluster-partitioned alternative to sign-LSH bucketing.

    * Centroids are data-sampled rows selected by `centroid_pred`
      (deterministic — no RNG, so any engine re-derives the identical
      index; one k-means assignment step away from a trained quantizer).
    * Assignment scores every vector against the broadcast centroid
      table (O(N·K), the actual IVF build cost) and keeps the argmax —
      a hash aggregate, not a sort window. Exact cosine with the
      left-to-right fold, so assignments are bit-identical cross-engine.
    * Search: each query probes its `nprobe` best clusters; candidates
      are the cluster members (equi-join on centroid id), re-ranked by
      exact cosine. Recall < 1 by design (the IVF trade).

    The O(N·K) assignment — the index build — runs exactly ONCE: its
    only consumer is the candidate equi-join. The probe side re-scores
    only the query vectors against the broadcast centroids (O(|Q|·K),
    negligible), so no branch re-touches the full corpus. At 100 TB the
    assignment would additionally be written out and reused across
    query batches (sources/catalog.VersionedTable is the write path);
    within one query the single-consumer plan needs no materialization.
    """
    from .windows import argmax_agg

    vectors_n = vectors.withColumn("_nrm", norm(F.col(vec_col)))
    cents = vectors_n.filter(centroid_pred).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("ce"),
        F.col("_nrm").alias("_cnrm"),
    )
    scored = vectors_n.crossJoin(F.broadcast(cents)).withColumn(
        "csim",
        cosine_prenormed(
            F.col(vec_col), F.col("ce"), F.col("_nrm"), F.col("_cnrm")
        ),
    )
    assigned = argmax_agg(
        scored,
        [id_col],
        F.struct(F.col("csim"), (-F.col("cid")).alias("_neg_cid")),
        {"cid": F.col("cid"), vec_col: F.col(vec_col), "_nrm": F.col("_nrm")},
    )
    # Probe ranking touches ONLY the query vectors — same fold-order
    # cosine, so ranks are identical to scoring them inside `scored`.
    q_scored = (
        vectors_n.filter(query_pred)
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "csim",
            cosine_prenormed(
                F.col(vec_col), F.col("ce"), F.col("_nrm"), F.col("_cnrm")
            ),
        )
    )
    w_probe = Window.partitionBy(id_col).orderBy(
        F.col("csim").desc(), F.col("cid").asc()
    )
    probes = (
        q_scored.withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select(
            F.col(id_col).alias("qid"),
            F.col(vec_col).alias("qe"),
            F.col("_nrm").alias("_qnrm"),
            "cid",
        )
    )
    sims = (
        F.broadcast(probes)
        .join(assigned, "cid")
        .filter(F.col(id_col) != F.col("qid"))
        .select(
            "qid",
            F.col(id_col).alias("nid"),
            F.round(
                cosine_prenormed(
                    F.col("qe"), F.col(vec_col), F.col("_qnrm"), F.col("_nrm")
                ),
                round_digits,
            ).alias("sim"),
        )
    )
    w_rank = Window.partitionBy("qid").orderBy(
        F.col("sim").desc(), F.col("nid").asc()
    )
    return (
        sims.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )


# --------------------------------------------------- product quantization


def pq_codebook(
    vectors: DataFrame,
    dim: int,
    n_sub: int,
    ksub: int,
    seed_pred: Column,
    id_col: str = "vec_id",
    vec_col: str = "e",
) -> DataFrame:
    """Deterministic PQ sub-codebooks: (sp, cid, ce) — one ksub-row
    codebook per subspace, sliced from seed vectors (lowest `ksub` ids
    matching `seed_pred`, ordered by id).

    Seed-sliced codebooks keep the construction engine-portable (the
    oracle rebuilds them in SQL); the production path trains each
    subspace with operators/clustering.kmeans and feeds the result in
    through the same (sp, cid, ce) contract. Only ksub rows transit
    the driver — the PQ analog of the k-means centroid contract.
    """
    subdim = dim // n_sub
    spark = vectors.sparkSession
    seeds = (
        vectors.filter(seed_pred).orderBy(id_col).limit(ksub).collect()
    )
    rows = []
    for cid, r in enumerate(seeds):
        e = [float(x) for x in r[vec_col]]
        for sp in range(n_sub):
            rows.append((sp, cid, e[sp * subdim : (sp + 1) * subdim]))
    return spark.createDataFrame(rows, "sp INT, cid INT, ce ARRAY<DOUBLE>")


def _subspace_explode(
    df: DataFrame, dim: int, n_sub: int, id_col: str, vec_col: str, out_id: str
) -> DataFrame:
    subdim = dim // n_sub
    slices = F.array(
        *[
            F.struct(
                F.lit(sp).alias("sp"),
                F.slice(F.col(vec_col), sp * subdim + 1, subdim).alias("sub"),
            )
            for sp in range(n_sub)
        ]
    )
    return df.select(
        F.col(id_col).alias(out_id), F.explode(slices).alias("_s")
    ).select(out_id, F.col("_s.sp").alias("sp"), F.col("_s.sub").alias("sub"))


def pq_encode(
    vectors: DataFrame,
    codebook: DataFrame,
    dim: int,
    n_sub: int,
    id_col: str = "vec_id",
    vec_col: str = "e",
) -> DataFrame:
    """PQ encoding: (id, sp, code, sub_dist) — nearest sub-centroid per
    subspace (squared-L2 left fold, ties to the lowest code).

    The compression step of IVF-PQ: dim doubles → n_sub small ints
    (~32x for 64-dim float64 → 8 codes). One broadcast join against the
    (n_sub*ksub)-row codebook + a hash argmin; shuffle carries only
    (id, sp) groups — linear, no pairwise work.
    """
    from .clustering import sq_dist
    from .windows import argmax_agg

    subs = _subspace_explode(vectors, dim, n_sub, id_col, vec_col, id_col)
    scored = subs.join(F.broadcast(codebook), "sp").withColumn(
        "_d", sq_dist(F.col("sub"), F.col("ce"))
    )
    return argmax_agg(
        scored,
        [id_col, "sp"],
        F.struct((-F.col("_d")).alias("_nd"), (-F.col("cid")).alias("_nc")),
        {"code": F.col("cid"), "sub_dist": F.col("_d")},
    )


def pq_adc_topk(
    vectors: DataFrame,
    codebook: DataFrame,
    dim: int,
    n_sub: int,
    k: int,
    query_pred: Column,
    id_col: str = "vec_id",
    vec_col: str = "e",
    round_digits: int = 6,
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ search: per query, top-k database
    vectors by the sum of per-subspace query-to-centroid distances
    looked up through the database codes — queries never touch raw
    database vectors, which is the point at 100 TB (codes are the only
    corpus-sized relation).

    Shape: LUT = queries x codebook (tiny, broadcast), joined to the
    code table on (sp, code); per (qid, id) the n_sub partial distances
    are folded IN SUBSPACE ORDER (array_sort + left fold) so the total
    is bit-identical to the oracle's `list_reduce(list(d ORDER BY sp))`
    — a float sum over a hash-shuffled group would be order-dependent.
    """
    codes = pq_encode(vectors, codebook, dim, n_sub, id_col, vec_col)
    from .clustering import sq_dist

    qsubs = _subspace_explode(
        vectors.filter(query_pred), dim, n_sub, id_col, vec_col, "qid"
    )
    lut = qsubs.join(F.broadcast(codebook), "sp").select(
        "qid", "sp", F.col("cid").alias("code"),
        sq_dist(F.col("sub"), F.col("ce")).alias("_d"),
    )
    joined = codes.join(F.broadcast(lut), ["sp", "code"]).filter(
        F.col("qid") != F.col(id_col)
    )
    folded = joined.groupBy("qid", id_col).agg(
        F.aggregate(
            F.transform(
                F.array_sort(F.collect_list(F.struct("sp", "_d"))),
                lambda s: s["_d"],
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("_adist")
    )
    w = Window.partitionBy("qid").orderBy(
        F.round("_adist", round_digits).asc(), F.col(id_col).asc()
    )
    return (
        folded.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select(
            "qid",
            F.col(id_col).alias("nid"),
            F.round("_adist", round_digits).alias("adist"),
        )
    )


def ivfpq_topk(
    vectors: DataFrame,
    codebook: DataFrame,
    dim: int,
    n_sub: int,
    k: int,
    query_pred: Column,
    centroid_pred: Column,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "e",
    round_digits: int = 6,
) -> DataFrame:
    """IVF-PQ search (the FAISS IVFADC layout, minus residual encoding):
    an IVF coarse quantizer bounds WHICH vectors each query compares
    against (nprobe clusters), and PQ codes bound WHAT is compared
    (8 small codes instead of raw vectors, ranked by LUT'd asymmetric
    distance). At 100 TB the corpus-sized relations are exactly two —
    the coarse assignment and the code table, both linear and both
    write-once reusable (sources/catalog.VersionedTable) — while every
    per-query structure (probe list, distance LUT) is a broadcast.

    Simplification vs FAISS: codes quantize raw vectors, not residuals
    against the coarse centroid — residuals would break the shared
    codebook contract with `pq_encode`'s oracle; the recall trade is
    the standard IVFFlat-with-PQ-ranking layout.
    """
    from .clustering import sq_dist
    from .windows import argmax_agg

    vectors_n = vectors.withColumn("_nrm", norm(F.col(vec_col)))
    cents = vectors_n.filter(centroid_pred).select(
        F.col(id_col).alias("cid"),
        F.col(vec_col).alias("ce"),
        F.col("_nrm").alias("_cnrm"),
    )
    coarse = vectors_n.crossJoin(F.broadcast(cents)).withColumn(
        "csim",
        cosine_prenormed(
            F.col(vec_col), F.col("ce"), F.col("_nrm"), F.col("_cnrm")
        ),
    )
    assigned = argmax_agg(
        coarse,
        [id_col],
        F.struct(F.col("csim"), (-F.col("cid")).alias("_neg_cid")),
        {"cid": F.col("cid")},
    )
    w_probe = Window.partitionBy(id_col).orderBy(
        F.col("csim").desc(), F.col("cid").asc()
    )
    probes = (
        vectors_n.filter(query_pred)
        .crossJoin(F.broadcast(cents))
        .withColumn(
            "csim",
            cosine_prenormed(
                F.col(vec_col), F.col("ce"), F.col("_nrm"), F.col("_cnrm")
            ),
        )
        .withColumn("rn", F.row_number().over(w_probe))
        .filter(F.col("rn") <= nprobe)
        .select(F.col(id_col).alias("qid"), "cid")
    )
    candidates = (
        F.broadcast(probes)
        .join(assigned, "cid")
        .filter(F.col("qid") != F.col(id_col))
        .select("qid", id_col)
    )
    codes = pq_encode(vectors, codebook, dim, n_sub, id_col, vec_col)
    qsubs = _subspace_explode(
        vectors.filter(query_pred), dim, n_sub, id_col, vec_col, "qid"
    )
    lut = qsubs.join(F.broadcast(codebook), "sp").select(
        "qid", "sp", F.col("cid").alias("code"),
        sq_dist(F.col("sub"), F.col("ce")).alias("_d"),
    )
    folded = (
        candidates.join(codes, id_col)
        .join(F.broadcast(lut), ["qid", "sp", "code"])
        .groupBy("qid", id_col)
        .agg(
            F.aggregate(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("sp", "_d"))),
                    lambda s: s["_d"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("_adist")
        )
    )
    w_rank = Window.partitionBy("qid").orderBy(
        F.round("_adist", round_digits).asc(), F.col(id_col).asc()
    )
    return (
        folded.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") <= k)
        .select(
            "qid",
            F.col(id_col).alias("nid"),
            F.round("_adist", round_digits).alias("adist"),
        )
    )


def exact_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int,
    corpus_id: str = "vec_id",
    vec_col: str = "e",
    query_id: str = "qid",
    query_vec_col: str = "qe",
    round_digits: int = 6,
) -> DataFrame:
    """Exact-distance refinement of an approximate candidate list —
    the FAISS "refine" stage that makes PQ-coded search usable: the
    coded index (ivfpq_topk / pq_adc_topk with a WIDE k) bounds WHICH
    vectors are touched, then the true cosine ranks that small
    candidate set and keeps the real top-k. ADC distances rank on
    quantized codes, so their @k=small recall collapses whenever
    quantization cells are coarse relative to neighbor gaps (measured:
    recall@3 ~ 0.11 on an 8-dim uniform corpus); re-ranking the ADC
    top-64/top-256 with exact distances recovers 0.497/0.735 at fixed
    nprobe=2 on the same corpus, and widening the probe to nprobe=4
    lifts it to 0.755 (tests/test_scale_patterns.py pins all four —
    the two levers measured separately). Cost at
    scale: |queries| x refine_width exact distances — per-query
    constant, never a corpus scan; the raw vectors of only the
    candidate rows are fetched (an equi-join on the candidate ids).

    `candidates` carries (query_id, nid); `corpus` the raw vectors;
    `queries` the (query_id, query_vec) pairs. Output: (qid, nid, sim),
    top-k per query by rounded cosine, nid tie-break — the
    brute_force_topk contract over the candidate subset.
    """
    ne = corpus.select(
        F.col(corpus_id).alias("nid"),
        F.col(vec_col).alias("_ne"),
        norm(F.col(vec_col)).alias("_nnrm"),
    )
    qe = queries.select(
        query_id,
        F.col(query_vec_col).alias("_qe"),
        norm(F.col(query_vec_col)).alias("_qnrm"),
    )
    scored = (
        candidates.select(query_id, "nid")
        # self-pair exclusion: part of the brute_force_topk contract —
        # when queries are drawn from the corpus and the upstream
        # index did not filter self, the query would otherwise take
        # rank 1 at sim=1.0 and silently waste one of the k slots
        .filter(F.col("nid") != F.col(query_id))
        .join(ne, "nid")
        .join(F.broadcast(qe), query_id)
        .select(
            query_id,
            "nid",
            F.round(
                cosine_prenormed(
                    F.col("_qe"), F.col("_ne"), F.col("_qnrm"), F.col("_nnrm")
                ),
                round_digits,
            ).alias("sim"),
        )
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("sim").desc(), F.col("nid").asc()
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
