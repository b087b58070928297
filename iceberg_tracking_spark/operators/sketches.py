"""Probabilistic sketches as DataFrame relations (SURVEY §2.8 "novel
sketch" surface; driver queries q_count_min / q_bloom_filter / q_hll).

A sketch here is just a SMALL RELATION with a merge law:

* count-min:  (fn, bucket) → count      merge = sum per cell
* bloom:      (fn, bucket) present      merge = set union (DISTINCT)
* hyperloglog:(bucket) → max rho        merge = max per bucket
* heavy hitters (Misra-Gries): (tok) → counter
                                        merge = sum per tok, re-reduce

That's what makes them the scale primitives — the state is constant-
size no matter the input, every law is a commutative hash aggregate
(so partition/stream/day merges are free), and a probe is an equi-join
against a broadcast of the sketch. tests/test_operators.py pins the
merge laws: sketch(A ∪ B) == merge(sketch(A), sketch(B)) exactly.

All hashing is md5-derived so any SQL engine rebuilds the identical
sketch (the DuckDB oracles in plans/queries_scale.py do exactly that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CMS_K = 4
CMS_W = 512
BLOOM_K = 4
BLOOM_W = 2048
HLL_M = 64
HLL_ALPHA = 0.7213 / (1 + 1.079 / HLL_M)


def _cell_bucket(tok: Column, fn: Column, width: int) -> Column:
    """md5-derived bucket for (hash-fn, token): first 8 hex chars of
    md5('{fn}:{tok}') mod width — portable to any engine."""
    key = F.concat_ws(":", fn.cast("string"), tok)
    return F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("long") % width


def _fanout(df: DataFrame, tok_col: str, k: int, width: int) -> DataFrame:
    fn = F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("fn")
    return df.select(F.col(tok_col).alias("tok"), fn).withColumn(
        "bucket", _cell_bucket(F.col("tok"), F.col("fn"), width)
    )


def cms_table(stream: DataFrame, tok_col: str = "tok") -> DataFrame:
    """Count-min sketch: (fn, bucket, c) — ≤ K·W rows."""
    return (
        _fanout(stream, tok_col, CMS_K, CMS_W)
        .groupBy("fn", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def cms_merge(*tables: DataFrame) -> DataFrame:
    """Merge law: cell-wise sum (counts are additive)."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("fn", "bucket").agg(F.sum("c").alias("c"))


def cms_probe(cms: DataFrame, probes: DataFrame, tok_col: str = "tok") -> DataFrame:
    """Point estimates: min over the K cells — (tok, cms_estimate).

    LEFT join against the sketch with empty cells counting as 0, the
    true count-min semantics: a probe token never seen in the stream
    gets estimate 0 (not a dropped row, not an inflated min over only
    its non-empty cells). The sketch side is the broadcast one — it is
    the constant-size (K·W) relation."""
    return (
        _fanout(probes, tok_col, CMS_K, CMS_W)
        .join(F.broadcast(cms), ["fn", "bucket"], "left")
        .groupBy("tok")
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("cms_estimate"))
    )


def bloom_bits(members: DataFrame, tok_col: str = "tok") -> DataFrame:
    """Bloom filter: the DISTINCT (fn, bucket) relation — ≤ K·W rows."""
    return _fanout(members, tok_col, BLOOM_K, BLOOM_W).select("fn", "bucket").distinct()


def bloom_merge(*tables: DataFrame) -> DataFrame:
    """Merge law: set union of set bits."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.distinct()


def bloom_maybe_member(
    bits: DataFrame, probes: DataFrame, tok_col: str = "tok"
) -> DataFrame:
    """(tok, maybe_member): true iff all K cells are set. No false
    negatives ever; false-positive rate governed by fill factor.

    One output row per DISTINCT probe token — the probe stream is
    deduplicated first, otherwise a token appearing t times would
    count K·t set cells and fail the `== K` test (a real false
    negative, caught by test_sketches.py)."""
    uniq = probes.select(F.col(tok_col).alias("tok")).distinct()
    hits = (
        _fanout(uniq, "tok", BLOOM_K, BLOOM_W)
        .join(F.broadcast(bits), ["fn", "bucket"], "left_semi")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cells_set"))
    )
    return uniq.join(hits, "tok", "left").select(
        "tok",
        (F.coalesce(F.col("cells_set"), F.lit(0)) == BLOOM_K).alias("maybe_member"),
    )


def _xx_cell(tok: Column, fn: int, width: int = BLOOM_W) -> Column:
    """Engine-native bloom cell: xxhash64 seeded by the hash-function
    index. Measured 2.3× faster than the md5 family on a 600k-row
    prune (1.4s vs 3.2s min-of-3 at sf0.1) — xxhash64 is one JVM
    intrinsic per row vs md5's digest + hex parse, and it hashes any
    column type directly (no string cast). Used where no SQL oracle
    needs to rebuild the bits: the runtime-filter path, whose
    correctness contract is the PLAIN join result. The md5 family
    (`_cell_bucket`) remains the portable one for oracle-mirrored
    sketches (q_bloom_filter / q_count_min)."""
    return F.pmod(F.xxhash64(F.lit(fn), tok), F.lit(width))


def bloom_bits_fast(members: DataFrame, tok_col: str = "tok") -> DataFrame:
    """`bloom_bits` on the engine-native xxhash64 family — pair with
    `bloom_prune(..., family="xxhash")` (both sides must hash alike)."""
    frames = [
        members.select(
            F.lit(fn).alias("fn"),
            _xx_cell(F.col(tok_col), fn).alias("bucket"),
        )
        for fn in range(BLOOM_K)
    ]
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f)
    return out.distinct()


def bloom_prune(
    facts: DataFrame, key: Column, bits: DataFrame, family: str
) -> DataFrame:
    """Runtime-filter pruning: keep only `facts` rows whose `key`
    passes the bloom filter `bits` — K chained broadcast LEFT-SEMI
    joins, one per hash function, each on that function's computed
    cell. All map-side (the bit relation is ≤ K·W rows, broadcast), so
    the fact table is pruned BEFORE any shuffle. No false negatives:
    a row whose key is in the member set passes all K tests. False
    positives pass too — callers follow with the real join, which
    removes them, so pruning is semantics-preserving by construction.

    `family` is REQUIRED and must match how `bits` was built: "xxhash"
    (the fast engine-native family — build with `bloom_bits_fast`) or
    "md5" (the oracle-portable family — build with `bloom_bits`, and
    cast the key to string to match its token hashing). A mismatch
    would not error — it would silently drop matching rows (false
    negatives, the one thing a bloom filter must never do), which is
    why there is no default."""
    if family not in ("xxhash", "md5"):
        raise ValueError(f"unknown bloom family: {family!r}")
    cell = _xx_cell if family == "xxhash" else (
        lambda k, fn: _cell_bucket(k, F.lit(fn), BLOOM_W)
    )
    pruned = facts
    for fn in range(BLOOM_K):
        fn_bits = bits.filter(F.col("fn") == fn).select(
            F.col("bucket").alias("_cell")
        )
        pruned = pruned.withColumn("_cell", cell(key, fn)).join(
            F.broadcast(fn_bits), "_cell", "left_semi"
        )
    return pruned.drop("_cell")


def hll_registers(stream: DataFrame, tok_col: str = "tok") -> DataFrame:
    """HLL register table: (bucket, m) with m = max first-1-bit
    position over the 52 payload bits — ≤ 64 rows."""
    h = F.md5(F.col(tok_col))
    hexd = F.lit("0123456789abcdef")
    rho = None
    for i in range(13):
        nib = F.instr(hexd, F.substring(h, 3 + i, 1)) - 1
        val = F.lit(4 * i + 4) - F.floor(F.log2(nib)).cast("long")
        rho = F.when(nib > 0, val) if rho is None else rho.when(nib > 0, val)
    rho = rho.otherwise(F.lit(53))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long") % HLL_M
    return (
        stream.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("m"))
    )


def hll_merge(*tables: DataFrame) -> DataFrame:
    """Merge law: bucket-wise max."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("bucket").agg(F.max("m").alias("m"))


def hll_estimate(regs: DataFrame) -> DataFrame:
    """One-row (hll_estimate): harmonic mean + small-range correction
    (Flajolet et al. 2007 §4)."""
    agg = regs.agg(
        (F.sum(F.pow(F.lit(2.0), -F.col("m"))) + (HLL_M - F.count(F.lit(1)))).alias(
            "denom"
        ),
        (HLL_M - F.count(F.lit(1))).alias("zeros"),
    )
    raw = F.lit(HLL_ALPHA) * HLL_M * HLL_M / F.col("denom")
    est = F.when(
        (raw <= 2.5 * HLL_M) & (F.col("zeros") > 0),
        HLL_M * F.log(HLL_M / F.col("zeros").cast("double")),
    ).otherwise(raw)
    return agg.select(F.round(est, 4).alias("hll_estimate"))


# ------------------------------------- Misra-Gries heavy hitters

HH_K = 16


def _hh_reduce(counts: DataFrame, k: int) -> DataFrame:
    """Reduce an exact (tok, c) count relation to the ≤ k-row canonical
    Misra-Gries summary: subtract the (k+1)-th largest count from every
    counter, keep the positive ones. Deterministic — the rank order
    (c desc, tok asc) is total — so any SQL engine rebuilds it
    bit-for-bit, unlike the classic streaming MG whose result depends
    on arrival order (the GUARANTEE is the same either way).

    Plan shape: the rank cut compiles to a WindowGroupLimit (each
    upstream partition forwards only its own top-(k+1) rows before the
    exchange), so the single-partition window stage sees ≤ (k+1) rows
    per partition, never the full count relation. The delta is a 1-row
    scalar aggregate broadcast back over the ≤ k kept rows."""
    from pyspark.sql import Window

    w = Window.orderBy(F.col("c").desc(), F.col("tok").asc())
    # two consumers (delta scalar, kept rows) re-derive the ≤(k+1)-row
    # rank; safe without materialization because the order is total
    # (deterministic on any recomputation) and the WindowGroupLimit
    # subtree is cheap — Catalyst's exchange reuse typically shares it
    ranked = counts.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= k + 1
    )
    delta = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("_rn") == k + 1, F.col("c"))), F.lit(0)
        ).alias("_delta")
    )
    return (
        ranked.filter(F.col("_rn") <= k)
        .crossJoin(F.broadcast(delta))
        .select("tok", (F.col("c") - F.col("_delta")).alias("c"))
        .filter(F.col("c") > 0)
    )


def hh_table(stream: DataFrame, k: int = HH_K, tok_col: str = "tok") -> DataFrame:
    """Misra-Gries heavy-hitter summary: ≤ k rows (tok, c).

    Canonical order-independent construction (Agarwal et al.,
    "Mergeable Summaries", PODS 2012 §3: the MG summary is exactly
    "exact counts minus the smallest uniform decrement leaving ≤ k
    positive counters"). Guarantees, N = stream length:
      c(x) − N/(k+1)  ≤  c_hat(x)  ≤  c(x)   for every token x,
    and every x with c(x) > N/(k+1) is RETAINED (a true heavy hitter
    can never be evicted). tests/test_sketches.py pins both, plus the
    merge law.

    Scale story: the exact-count stage is one map-side-combining
    aggregate (same cost class as any groupBy); what the sketch buys
    is the CONSTANT-SIZE state that ships across days/streams/tables —
    daily ≤ k-row summaries merge into a window summary without ever
    reprocessing the raw streams, with errors adding linearly."""
    counts = stream.groupBy(F.col(tok_col).alias("tok")).agg(
        F.count(F.lit(1)).alias("c")
    )
    return _hh_reduce(counts, k)


def hh_merge(*tables: DataFrame, k: int = HH_K) -> DataFrame:
    """Merge law (PODS 2012 §3.1): sum counters per token across
    summaries, then re-reduce to k. Error bounds ADD (δ ≤ Σ Nᵢ/(k+1)),
    so the merged summary keeps the heavy-hitter guarantee at constant
    size. In the exact regime (k ≥ distinct tokens of the union) the
    reduce is a no-op and the law is exact: merge(sketch(A), sketch(B))
    == sketch(A ∪ B)."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    summed = out.groupBy("tok").agg(F.sum("c").alias("c"))
    return _hh_reduce(summed, k)


# ------------------------------------------------ equi-width histogram

HIST_BINS = 256


def hist_table(
    values: DataFrame,
    value_col: str = "v",
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = HIST_BINS,
) -> DataFrame:
    """Equi-width histogram sketch: (bin, c) — ≤ n_bins rows.

    bin = floor((v - lo) / (hi - lo) * n_bins), clamped to [0, n_bins-1]
    (values outside [lo, hi) land in the edge bins, so mass is never
    lost). Merge law = cell-wise sum, same additive-state family as the
    count-min sketch — one map-side-combining aggregate builds it, and
    partition/stream/day merges are free.
    """
    width = (hi - lo) / n_bins
    raw = F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("long")
    b = F.greatest(F.lit(0), F.least(F.lit(n_bins - 1), raw))
    return (
        values.select(b.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def hist_merge(*tables: DataFrame) -> DataFrame:
    """Merge law: cell-wise sum (bin counts are additive)."""
    out = tables[0]
    for t in tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("bin").agg(F.sum("c").alias("c"))


def hist_quantiles(
    hist: DataFrame,
    qs: list[float],
    lo: float = 0.0,
    hi: float = 1.0,
    n_bins: int = HIST_BINS,
) -> DataFrame:
    """Quantile estimates from the histogram: for each q, the midpoint
    of the first bin whose cumulative count reaches q·N — the classic
    percentile-from-histogram estimator (error ≤ bin width), fully
    deterministic so any SQL engine reproduces it bit-for-bit.

    The cumulative runs as a triangular broadcast self-join over the
    ≤ n_bins-row relation, NOT an unpartitioned window — same
    no-single-partition discipline as distributed_cumulative (a window
    here would trip the plan guard even though the relation is tiny).
    """
    width = (hi - lo) / n_bins
    cum = (
        hist.alias("a")
        .join(
            F.broadcast(hist.alias("b")),
            F.col("b.bin") <= F.col("a.bin"),
            "left",
        )
        .groupBy(F.col("a.bin").alias("bin"))
        .agg(F.sum("b.c").alias("cum"))
    )
    total = hist.agg(F.sum("c").alias("n_total"))
    q = F.explode(F.array(*[F.lit(float(x)) for x in qs])).alias("q")
    # per (q, bin-reaching-q·N): the smallest such bin wins
    reach = (
        cum.crossJoin(F.broadcast(total))
        .select("bin", "cum", "n_total", q)
        .filter(F.col("cum") >= F.col("q") * F.col("n_total"))
        .groupBy("q")
        .agg(F.min("bin").alias("bin"))
    )
    est = F.round(F.lit(lo) + (F.col("bin") + 0.5) * F.lit(width), 6)
    return reach.select("q", "bin", est.alias("estimate"))
