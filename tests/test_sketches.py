"""Merge laws of the relational sketches: sketch(A ∪ B) must equal
merge(sketch(A), sketch(B)) EXACTLY — the property that makes the
constant-size state free to combine across partitions, streams, and
days. Plus the core estimate invariants."""

from __future__ import annotations

from pyspark.sql import functions as F

from iceberg_tracking_spark.operators.sketches import (
    bloom_bits,
    bloom_maybe_member,
    bloom_merge,
    cms_merge,
    cms_probe,
    cms_table,
    hll_estimate,
    hll_merge,
    hll_registers,
)


def _toks(spark, words):
    return spark.createDataFrame([(w,) for w in words], "tok string")


def _words(seed: int, n: int) -> list[str]:
    return [f"w{(i * seed + i * i) % (n // 2 + 3)}" for i in range(n)]


def test_cms_merge_law_and_overestimate(spark):
    a, b = _words(7, 400), _words(11, 300)
    whole = cms_table(_toks(spark, a + b))
    merged = cms_merge(cms_table(_toks(spark, a)), cms_table(_toks(spark, b)))
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0
    # estimate >= exact for every token (the CMS guarantee)
    stream = _toks(spark, a + b)
    exact = stream.groupBy("tok").agg(F.count(F.lit(1)).alias("n"))
    probed = cms_probe(whole, exact.select("tok"))
    bad = probed.join(exact, "tok").filter(F.col("cms_estimate") < F.col("n"))
    assert bad.count() == 0


def test_cms_probe_absent_token_estimates_zero(spark):
    """True count-min semantics for never-seen probes: every empty cell
    counts as 0, so a token absent from the stream min()s to 0 — it
    must get a row (not vanish in an inner join) and must not inflate
    to a min over only its colliding non-empty cells."""
    cms = cms_table(_toks(spark, _words(7, 200)))
    probes = spark.createDataFrame(
        [("zz-never-seen-1",), ("zz-never-seen-2",)], "tok string"
    )
    rows = {r["tok"]: r["cms_estimate"] for r in cms_probe(cms, probes).collect()}
    assert set(rows) == {"zz-never-seen-1", "zz-never-seen-2"}
    # md5-derived cells of an unseen token may collide with real ones,
    # but with K=4 independent rows at this fill factor at least one
    # cell is empty → estimate exactly 0.
    assert all(v == 0 for v in rows.values())


def test_bloom_merge_law_and_no_false_negatives(spark):
    a, b = _words(5, 200), _words(13, 150)
    whole = bloom_bits(_toks(spark, a + b))
    merged = bloom_merge(bloom_bits(_toks(spark, a)), bloom_bits(_toks(spark, b)))
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0
    # every member probes positive
    flags = bloom_maybe_member(whole, _toks(spark, a + b))
    assert flags.filter(~F.col("maybe_member")).count() == 0


def test_hh_exact_regime_merge_law(spark):
    """With k ≥ distinct tokens, the Misra-Gries summary IS the exact
    count relation and the merge law is exact: merge(sketch(A),
    sketch(B)) == sketch(A ∪ B) == exact counts of A ∪ B."""
    from iceberg_tracking_spark.operators.sketches import hh_merge, hh_table

    a, b = _words(7, 400), _words(11, 300)
    k = len(set(a + b)) + 5
    whole = hh_table(_toks(spark, a + b), k=k)
    merged = hh_merge(
        hh_table(_toks(spark, a), k=k), hh_table(_toks(spark, b), k=k), k=k
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0
    exact = (
        _toks(spark, a + b).groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    )
    assert whole.exceptAll(exact).count() == 0
    assert exact.exceptAll(whole).count() == 0


def _skewed(n: int) -> list[str]:
    """Zipf-ish stream: token w{j} appears ~n/(4(j+1)) times (the top
    few tokens are true heavy hitters), padded with singletons to
    exactly n — the distribution MG is built for."""
    out: list[str] = []
    j = 0
    while len(out) < n and n // (4 * (j + 1)) > 1:
        out += [f"w{j}"] * (n // (4 * (j + 1)))
        j += 1
    out = out[:n]
    return out + [f"t{i}" for i in range(n - len(out))]


def test_hh_guarantees_in_approx_regime(spark):
    """The MG guarantees on a genuinely-reduced summary (k far below
    the distinct count): ≤ k counters, c_hat(x) ≤ c(x) ≤ c_hat(x) +
    N/(k+1) for every summarized token, and every true heavy hitter
    (c(x) > N/(k+1)) is RETAINED."""
    from iceberg_tracking_spark.operators.sketches import hh_table

    stream = _skewed(3000)
    k = 8
    n = len(stream)
    bound = n / (k + 1)
    summary = {
        r["tok"]: r["c"] for r in hh_table(_toks(spark, stream), k=k).collect()
    }
    assert 0 < len(summary) <= k
    exact: dict[str, int] = {}
    for t in stream:
        exact[t] = exact.get(t, 0) + 1
    for tok, c_hat in summary.items():
        assert c_hat <= exact[tok], (tok, c_hat, exact[tok])
        assert exact[tok] <= c_hat + bound, (tok, c_hat, exact[tok], bound)
    for tok, c in exact.items():
        if c > bound:
            assert tok in summary, (tok, c, bound)


def test_hh_merge_guarantee_in_approx_regime(spark):
    """Merging two reduced summaries keeps the (added) error bound
    (Agarwal et al., PODS 2012 §3.1): after merge, every token obeys
    c_hat(x) ≤ c(x) ≤ c_hat(x) + (N_A + N_B)/(k+1) — with c_hat(x) = 0
    for evicted tokens — and the merged summary stays ≤ k rows."""
    from iceberg_tracking_spark.operators.sketches import hh_merge, hh_table

    a, b = _skewed(2000), _skewed(1400)[::-1]
    k = 8
    bound = (len(a) + len(b)) / (k + 1)
    merged = {
        r["tok"]: r["c"]
        for r in hh_merge(
            hh_table(_toks(spark, a), k=k), hh_table(_toks(spark, b), k=k), k=k
        ).collect()
    }
    assert 0 < len(merged) <= k
    exact: dict[str, int] = {}
    for t in a + b:
        exact[t] = exact.get(t, 0) + 1
    for tok, c in exact.items():
        c_hat = merged.get(tok, 0)
        assert c_hat <= c, (tok, c_hat, c)
        assert c <= c_hat + bound, (tok, c_hat, c, bound)


def test_bloom_prune_preserves_join_and_prunes(spark, sf_dir):
    """bloom_prune is semantics-preserving (no fact row with a matching
    key is lost — the bloom no-false-negative guarantee) and actually
    prunes (the surviving fraction is bounded by selectivity + the
    false-positive rate, far below 1)."""
    from iceberg_tracking_spark.operators.sketches import (
        bloom_bits,
        bloom_bits_fast,
        bloom_prune,
    )
    from iceberg_tracking_spark.sources.tables import load_table

    part = load_table(spark, sf_dir, "part")
    dim = part.filter(F.col("p_size") == 1).select("p_partkey", "p_brand")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice"
    )
    # default engine-native xxhash family
    bits = bloom_bits_fast(dim.select(F.col("p_partkey").alias("tok")))
    pruned = bloom_prune(li, F.col("l_partkey"), bits, family="xxhash")
    # the md5 (oracle-portable) family must satisfy the same contract
    bits_md5 = bloom_bits(
        dim.select(F.col("p_partkey").cast("string").alias("tok"))
    )
    pruned_md5 = bloom_prune(
        li, F.col("l_partkey").cast("string"), bits_md5, family="md5"
    )
    n_match_md5 = pruned_md5.join(
        dim, F.col("l_partkey") == F.col("p_partkey")
    ).count()
    n_total = li.count()
    n_pruned = pruned.count()
    n_match = li.join(dim, F.col("l_partkey") == F.col("p_partkey")).count()
    # every matching row survives …
    assert n_pruned >= n_match
    lost = (
        li.join(dim, F.col("l_partkey") == F.col("p_partkey"))
        .select("l_partkey", "l_extendedprice")
        .exceptAll(
            pruned.join(
                dim, F.col("l_partkey") == F.col("p_partkey")
            ).select("l_partkey", "l_extendedprice")
        )
    )
    assert lost.count() == 0
    # … and the filter genuinely prunes: p_size=1 selects ~2% of parts,
    # so even with bloom false positives the surviving fraction stays
    # far below the full scan (30% is a very loose cap on fill-factor
    # drift across sf fixtures)
    assert n_pruned < 0.3 * n_total, (n_pruned, n_total, n_match)
    # md5 family: same no-false-negative contract (post-join row count
    # equals the unpruned join's)
    assert n_match_md5 == n_match


def test_hll_merge_law_and_accuracy(spark):
    a = [f"a{i}" for i in range(800)]
    b = [f"b{i}" for i in range(600)] + a[:100]  # overlap
    whole = hll_registers(_toks(spark, a + b))
    merged = hll_merge(hll_registers(_toks(spark, a)), hll_registers(_toks(spark, b)))
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0
    # estimate within the ~1.04/sqrt(64) = 13% band (3 sigma ≈ 39%)
    est = hll_estimate(whole).first()["hll_estimate"]
    true = len(set(a + b))
    assert abs(est - true) / true < 0.39, (est, true)


def test_streaming_hll_maintenance_equals_batch(spark, sf_dir, tmp_path):
    """Maintain HLL registers over a document stream with foreachBatch:
    each micro-batch's 64-row register table max-merges into a
    VersionedTable snapshot. After all batches the stored sketch must
    equal the from-scratch batch sketch EXACTLY (the merge law live on
    a real stream), and so must the cardinality estimate."""
    from iceberg_tracking_spark.sources.catalog import VersionedTable
    from iceberg_tracking_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = lambda df: df.select(  # noqa: E731
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("tok")
    )
    src = str(tmp_path / "src")
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(src)

    t = VersionedTable(str(tmp_path / "hll_regs"))

    def merge_batch(batch_df, batch_id: int) -> None:
        regs = hll_registers(toks(batch_df))
        if t.current_version() is not None:
            regs = hll_merge(t.read(batch_df.sparkSession), regs)
        t.write(regs.coalesce(1))

    stream = (
        spark.readStream.schema(docs.schema).parquet(src).writeStream
        .foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
    )
    q = stream.start()
    q.awaitTermination(120)
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
    q2 = stream.start()
    q2.awaitTermination(120)

    stored = t.read(spark)
    batch = hll_registers(toks(docs))
    assert stored.exceptAll(batch).count() == 0
    assert batch.exceptAll(stored).count() == 0
    est_stream = hll_estimate(stored).first()["hll_estimate"]
    est_batch = hll_estimate(batch).first()["hll_estimate"]
    assert est_stream == est_batch


def test_streaming_hh_maintenance_keeps_guarantee(spark, sf_dir, tmp_path):
    """Maintain the Misra-Gries summary over a document stream with
    foreachBatch: each micro-batch's ≤k-row summary sum-merges into a
    VersionedTable snapshot and re-reduces to k. Unlike the additive
    sketches, the streamed MG summary need not equal the from-scratch
    batch one — what survives streaming is the GUARANTEE: after all
    batches, c_hat(x) ≤ c(x) ≤ c_hat(x) + N/(k+1) for every corpus
    token (c_hat = 0 for evicted ones), since per-batch errors add to
    at most Σ Nᵢ/(k+1) = N/(k+1) (PODS 2012 §3.1)."""
    from iceberg_tracking_spark.operators.sketches import hh_merge, hh_table
    from iceberg_tracking_spark.sources.catalog import VersionedTable
    from iceberg_tracking_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = lambda df: df.select(  # noqa: E731
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("tok")
    )
    k = 16
    src = str(tmp_path / "src")
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(src)

    t = VersionedTable(str(tmp_path / "hh"))

    def merge_batch(batch_df, batch_id: int) -> None:
        s = hh_table(toks(batch_df), k=k)
        if t.current_version() is not None:
            s = hh_merge(t.read(batch_df.sparkSession), s, k=k)
        t.write(s.coalesce(1))

    stream = (
        spark.readStream.schema(docs.schema).parquet(src).writeStream
        .foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
    )
    q = stream.start()
    q.awaitTermination(120)
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
    q2 = stream.start()
    q2.awaitTermination(120)

    stored = {r["tok"]: r["c"] for r in t.read(spark).collect()}
    assert 0 < len(stored) <= k
    exact = {
        r["tok"]: r["n"]
        for r in toks(docs)
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_total = sum(exact.values())
    bound = n_total / (k + 1)
    for tok, c in exact.items():
        c_hat = stored.get(tok, 0)
        assert c_hat <= c, (tok, c_hat, c)
        assert c <= c_hat + bound, (tok, c_hat, c, bound)


def test_histogram_merge_law_and_quantile_bounds(spark):
    """hist(A ∪ B) == merge(hist(A), hist(B)) exactly, and every
    histogram-estimated quantile is within one bin width of the exact
    percentile."""
    from iceberg_tracking_spark.operators.sketches import (
        hist_merge,
        hist_quantiles,
        hist_table,
    )

    a = spark.range(0, 4000).select(((F.col("id") * 37) % 1000 / 10.0).alias("v"))
    b = spark.range(0, 3000).select(((F.col("id") * 91) % 1000 / 10.0).alias("v"))
    lo, hi, bins = 0.0, 100.0, 64
    whole = hist_table(a.unionAll(b), "v", lo, hi, bins)
    merged = hist_merge(
        hist_table(a, "v", lo, hi, bins), hist_table(b, "v", lo, hi, bins)
    )
    assert whole.exceptAll(merged).count() == 0
    assert merged.exceptAll(whole).count() == 0

    est = {
        r["q"]: r["estimate"]
        for r in hist_quantiles(whole, [0.5, 0.9], lo, hi, bins).collect()
    }
    exact = (
        a.unionAll(b)
        .agg(F.expr("percentile(v, array(0.5, 0.9))").alias("p"))
        .collect()[0]["p"]
    )
    width = (hi - lo) / bins
    assert abs(est[0.5] - exact[0]) <= width
    assert abs(est[0.9] - exact[1]) <= width


def test_streaming_histogram_maintenance_equals_batch(spark, sf_dir, tmp_path):
    """Maintain the equi-width histogram over a document stream with
    foreachBatch: each micro-batch's ≤64-row bin table sum-merges into
    a VersionedTable snapshot. After all batches the stored sketch and
    its quantile reads must equal the from-scratch batch sketch EXACTLY
    — the additive merge law live on a real stream (same harness as the
    streaming HLL test)."""
    from iceberg_tracking_spark.operators.sketches import (
        hist_merge,
        hist_quantiles,
        hist_table,
    )
    from iceberg_tracking_spark.sources.catalog import VersionedTable
    from iceberg_tracking_spark.sources.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    lo, hi, bins = 0.0, 4000.0, 64
    vals = lambda df: df.select(F.col("n_chars").cast("double").alias("v"))  # noqa: E731
    src = str(tmp_path / "src")
    docs.filter(F.col("doc_id") % 2 == 0).write.mode("overwrite").parquet(src)

    t = VersionedTable(str(tmp_path / "hist_bins"))

    def merge_batch(batch_df, batch_id: int) -> None:
        h = hist_table(vals(batch_df), "v", lo, hi, bins)
        if t.current_version() is not None:
            h = hist_merge(t.read(batch_df.sparkSession), h)
        t.write(h.coalesce(1))

    stream = (
        spark.readStream.schema(docs.schema).parquet(src).writeStream
        .foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
    )
    q = stream.start()
    q.awaitTermination(120)
    docs.filter(F.col("doc_id") % 2 == 1).write.mode("append").parquet(src)
    q2 = stream.start()
    q2.awaitTermination(120)

    stored = t.read(spark)
    batch = hist_table(vals(docs), "v", lo, hi, bins)
    assert stored.exceptAll(batch).count() == 0
    assert batch.exceptAll(stored).count() == 0
    qa = sorted(hist_quantiles(stored, [0.5, 0.9], lo, hi, bins).collect())
    qb = sorted(hist_quantiles(batch, [0.5, 0.9], lo, hi, bins).collect())
    assert qa == qb
