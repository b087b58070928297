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
