"""Probabilistic sketches as DataFrame relations (SURVEY §2.8 "novel
sketch" surface; driver queries q_count_min / q_bloom_filter / q_hll).

A sketch here is just a SMALL RELATION with a merge law:

* count-min:  (fn, bucket) → count      merge = sum per cell
* bloom:      (fn, bucket) present      merge = set union (DISTINCT)
* hyperloglog:(bucket) → max rho        merge = max per bucket

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
    """Point estimates: min over the K cells — (tok, cms_estimate)."""
    return (
        F.broadcast(_fanout(probes, tok_col, CMS_K, CMS_W))
        .join(cms, ["fn", "bucket"])
        .groupBy("tok")
        .agg(F.min("c").alias("cms_estimate"))
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
