"""Paper-backed corpus-curation operators (training-data pipeline
surface, extending queries_llm):

* SemDeDup semantic dedup (Abbas et al. 2023, arXiv:2303.09540):
  cluster embeddings, then dedup ONLY within clusters — the cluster
  bound is what makes semantic dedup tractable at 100 TB (pairs are
  O(Σ|c|²), not O(N²), and k grows with the corpus so |c| stays
  bounded).
* Gopher document-quality rules (Rae et al. 2021, arXiv:2112.11446
  §A1.1): word-count / word-length / symbol-ratio / stopword gates as
  pure per-row Catalyst expressions — embarrassingly parallel.
* One BPE merge step (Sennrich et al. 2016, arXiv:1508.07909):
  corpus-level adjacent-symbol-pair counting. The distributed insight:
  count the VOCABULARY once (word → weight), then explode pairs per
  distinct word — pair work scales with |vocab|, not corpus size,
  exactly how production BPE trainers shard the count step.
* Full BPE merge LEARNING (q_bpe_learn): three unrolled
  count→select→rewrite iterations with an engine-exact replace
  contract.
* Temperature domain mixture (XLM-R, arXiv:1911.02116 §3.1): sampling
  weights ∝ tokens^α per (lang, source) — the data-mixing step.
* Curriculum ordering (q_curriculum): global difficulty rank through
  distributed_cumulative, decile schedule buckets.
* The composed training manifest (q_training_manifest): gate → dedup
  → mixture weight → sharded packing → curriculum, one plan.

All are fully oracle-checked: every expression is mirrored in
DuckDB SQL with the shared fold-order/rounding contracts from
operators/similarity.py and queries_llm.py.

Reference tie-in: the reference's appearance-embedding dedup machinery
(feature_extraction.py:255-297) is the same shape as SemDeDup's
cluster-then-compare; these queries generalize it to corpus curation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import STOPWORDS, shingles_from_tokens, tokens
from ..operators.similarity import (
    cosine_prenormed,
    duck_cosine_sql,
    norm,
)
from ..schemas import EMB_DIM as _EMB_DIM
from ..sources.tables import load_table, scatter
from .registry import query

_DUCK_TOKS = "list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')"
_DUCK_SHINGLES = (
    "CASE WHEN len({toks}) >= 3 THEN "
    "list_transform(range(1, len({toks}) - 1), "
    "i -> {toks}[i] || ' ' || {toks}[i+1] || ' ' || {toks}[i+2]) "
    "ELSE [] END"
).format(toks=_DUCK_TOKS)


def _t(spark: SparkSession, sf_dir: str, name: str):
    return scatter(load_table(spark, sf_dir, name))


# ------------------------------------------------------------ SemDeDup

_SEMDEDUP_K = 8  # deterministic seed centroids (vec_id < k)
_SEMDEDUP_TAU = 0.45

_COS_VC = duck_cosine_sql("v.e", "c.ce", _EMB_DIM)
_COS_AB = duck_cosine_sql("a.e", "b.e", _EMB_DIM)


@query(
    "q_semdedup",
    oracle=f"""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
    c AS (SELECT vec_id AS cid, e AS ce FROM v WHERE vec_id < {_SEMDEDUP_K}),
    s AS (
        SELECT v.vec_id, c.cid, round({_COS_VC}, 6) AS sim
        FROM v CROSS JOIN c
    ),
    asn AS (
        SELECT vec_id, cid AS cluster FROM (
            SELECT vec_id, cid,
                   row_number() OVER (PARTITION BY vec_id
                                      ORDER BY sim DESC, cid) AS rn
            FROM s
        ) WHERE rn = 1
    ),
    m AS (SELECT asn.vec_id, asn.cluster, v.e FROM asn JOIN v USING (vec_id)),
    dup AS (
        SELECT DISTINCT b.vec_id
        FROM m a JOIN m b
          ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE round({_COS_AB}, 6) >= {_SEMDEDUP_TAU}
    )
    SELECT asn.vec_id, asn.cluster,
           CAST(CASE WHEN dup.vec_id IS NULL THEN 0 ELSE 1 END AS INT) AS is_dup
    FROM asn LEFT JOIN dup ON asn.vec_id = dup.vec_id
    """,
)
def q_semdedup(spark, sf_dir):
    """SemDeDup (arXiv:2303.09540): assign every embedding to its
    nearest of k seed centroids by cosine, then mark as duplicate any
    vector that has a same-cluster neighbor with smaller vec_id and
    cosine ≥ τ (keep-first policy, like q_dedup_keep_one).

    Scale design: the centroid table is k rows (broadcast); assignment
    is a broadcast nested loop over k → hash-argmax, one pass, no
    shuffle of the corpus. The pair stage joins on `cluster` — the
    quadratic blowup is bounded per cluster, which is the entire point
    of SemDeDup (k ≈ √N keeps Σ|c|² ≈ N^1.5 / work per executor flat).
    Seeds here are deterministic (vec_id < k) for oracle parity; the
    production path fits real centroids with operators/clustering
    (q_kmeans) and feeds them in identically.
    """
    v = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    ).withColumn("_nrm", norm(F.col("e")))
    seeds = v.filter(F.col("vec_id") < _SEMDEDUP_K).select(
        F.col("vec_id").alias("cid"),
        F.col("e").alias("ce"),
        F.col("_nrm").alias("_cnrm"),
    )
    sims = v.crossJoin(F.broadcast(seeds)).select(
        "vec_id",
        "cid",
        "e",
        "_nrm",
        F.round(
            cosine_prenormed(
                F.col("e"), F.col("ce"), F.col("_nrm"), F.col("_cnrm")
            ),
            6,
        ).alias("sim"),
    )
    w = Window.partitionBy("vec_id").orderBy(F.desc("sim"), F.asc("cid"))
    asn = (
        sims.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", F.col("cid").alias("cluster"), "e", "_nrm")
    )
    a = asn.select(
        F.col("cluster"),
        F.col("vec_id").alias("va"),
        F.col("e").alias("ea"),
        F.col("_nrm").alias("na"),
    )
    b = asn.select(
        F.col("cluster"),
        F.col("vec_id").alias("vb"),
        F.col("e").alias("eb"),
        F.col("_nrm").alias("nb"),
    )
    dup = (
        a.join(b, "cluster")
        .filter(F.col("va") < F.col("vb"))
        .filter(
            F.round(
                cosine_prenormed(
                    F.col("ea"), F.col("eb"), F.col("na"), F.col("nb")
                ),
                6,
            )
            >= F.lit(_SEMDEDUP_TAU)
        )
        .select(F.col("vb").alias("vec_id"))
        .distinct()
        .withColumn("_d", F.lit(1))
    )
    return asn.join(dup, "vec_id", "left").select(
        "vec_id",
        "cluster",
        F.coalesce(F.col("_d"), F.lit(0)).cast("int").alias("is_dup"),
    )


# ------------------------------------------------------------ Gopher rules

_SW_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)


@query(
    "q_gopher_rules",
    oracle=f"""
    WITH t AS (
        SELECT doc_id, {_DUCK_TOKS} AS toks, lower(text) AS lo FROM documents
    ),
    s AS (
        SELECT doc_id,
               len(toks) AS n_words,
               round(CASE WHEN len(toks) > 0
                     THEN list_reduce(list_transform(toks, x -> CAST(len(x) AS DOUBLE)),
                                      (x, y) -> x + y) / len(toks)
                     ELSE 0.0 END, 4) AS mean_word_len,
               len(list_filter(toks, x -> x IN ({_SW_LIST}))) AS stop_hits,
               round(CASE WHEN len(toks) > 0
                     THEN CAST(len(list_filter(toks, x -> regexp_full_match(x, '[a-z]+')))
                          AS DOUBLE) / len(toks)
                     ELSE 0.0 END, 4) AS alpha_frac,
               round(CASE WHEN len(toks) > 0
                     THEN CAST(len(lo) - len(replace(replace(lo, '#', ''), '...', ''))
                          AS DOUBLE) / len(toks)
                     ELSE 0.0 END, 4) AS symbol_ratio
        FROM t
    )
    SELECT doc_id, n_words, mean_word_len, stop_hits, alpha_frac, symbol_ratio,
           CAST(CASE WHEN n_words BETWEEN 10 AND 100000 THEN 1 ELSE 0 END AS INT) AS pass_nwords,
           CAST(CASE WHEN mean_word_len BETWEEN 2 AND 10 THEN 1 ELSE 0 END AS INT) AS pass_wordlen,
           CAST(CASE WHEN symbol_ratio <= 0.1 THEN 1 ELSE 0 END AS INT) AS pass_symbol,
           CAST(CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS INT) AS pass_stop,
           CAST(CASE WHEN alpha_frac >= 0.8 THEN 1 ELSE 0 END AS INT) AS pass_alpha,
           CAST(CASE WHEN n_words BETWEEN 10 AND 100000
                      AND mean_word_len BETWEEN 2 AND 10
                      AND symbol_ratio <= 0.1
                      AND stop_hits >= 2
                      AND alpha_frac >= 0.8
                     THEN 1 ELSE 0 END AS INT) AS keep
    FROM s
    """,
)
def q_gopher_rules(spark, sf_dir):
    """Gopher quality gates (arXiv:2112.11446 §A1.1) per document:
    word count in [10, 100k], mean word length in [2, 10], symbol-to-
    word ratio (# / ellipsis) ≤ 0.1, ≥ 2 stopword hits, ≥ 80% alphabetic
    words. Emits every intermediate stat plus per-rule flags and the
    final `keep` — the audit shape a curation pipeline actually needs
    (what fraction fails which rule), not just the filtered table.

    Scale: pure per-row expression work, no shuffle at all; the flags
    stay inside one WholeStageCodegen span over the parquet scan.
    (Thresholds adapted to the synthetic corpus: Gopher's originals are
    [50, 100k] words / [3, 10] chars — same algebra.)
    """
    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    lo = F.lower(F.col("text"))
    symbol_chars = F.length(lo) - F.length(
        F.replace(F.replace(lo, F.lit("#"), F.lit("")), F.lit("..."), F.lit(""))
    )
    s = d.select(
        "doc_id",
        F.size(toks).alias("n_words"),
        F.round(
            F.when(
                F.size(toks) > 0,
                F.aggregate(
                    F.transform(toks, lambda x: F.length(x).cast("double")),
                    F.lit(0.0),
                    lambda acc, x: acc + x,
                )
                / F.size(toks),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("mean_word_len"),
        F.size(F.filter(toks, lambda x: x.isin(STOPWORDS))).alias("stop_hits"),
        F.round(
            F.when(
                F.size(toks) > 0,
                F.size(F.filter(toks, lambda x: x.rlike("^[a-z]+$"))).cast("double")
                / F.size(toks),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("alpha_frac"),
        F.round(
            F.when(
                F.size(toks) > 0,
                symbol_chars.cast("double") / F.size(toks),
            ).otherwise(F.lit(0.0)),
            4,
        ).alias("symbol_ratio"),
    )
    pass_nwords = F.col("n_words").between(10, 100000)
    pass_wordlen = F.col("mean_word_len").between(2, 10)
    pass_symbol = F.col("symbol_ratio") <= 0.1
    pass_stop = F.col("stop_hits") >= 2
    pass_alpha = F.col("alpha_frac") >= 0.8
    return s.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "stop_hits",
        "alpha_frac",
        "symbol_ratio",
        pass_nwords.cast("int").alias("pass_nwords"),
        pass_wordlen.cast("int").alias("pass_wordlen"),
        pass_symbol.cast("int").alias("pass_symbol"),
        pass_stop.cast("int").alias("pass_stop"),
        pass_alpha.cast("int").alias("pass_alpha"),
        (pass_nwords & pass_wordlen & pass_symbol & pass_stop & pass_alpha)
        .cast("int")
        .alias("keep"),
    )


# ---------------------------------------------------- data-quality audit


@query(
    "q_expectations",
    oracle=f"""
    SELECT * FROM (
        SELECT 'doc_id_not_null' AS rule,
               CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_violations
        FROM documents
        UNION ALL
        SELECT 'doc_id_unique',
               CAST(count(*) AS BIGINT),
               CAST(count(*) - count(DISTINCT doc_id) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'n_chars_matches_text',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN n_chars <> len(text) THEN 1 ELSE 0 END) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'lang_in_domain',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN lang NOT IN ('en','fr','es','de','zh')
                             THEN 1 ELSE 0 END) AS BIGINT)
        FROM documents
        UNION ALL
        SELECT 'text_nonempty',
               CAST(count(*) AS BIGINT),
               CAST(sum(CASE WHEN len({_DUCK_TOKS}) = 0 THEN 1 ELSE 0 END) AS BIGINT)
        FROM documents
    ) ORDER BY rule
    """,
)
def q_expectations(spark, sf_dir):
    """Deequ-style data-quality expectations over `documents`: one row
    per declared constraint with its violation count — completeness
    (not-null), uniqueness, consistency (n_chars = len(text)), domain
    membership (lang), and non-emptiness. The pre-training gate a
    corpus pipeline runs before any expensive transform.

    Scale: every rule folds into ONE aggregation pass over the scan —
    conditional sums share the scan and the (single) reduce; only the
    uniqueness rule adds a count(distinct) expansion, which Spark
    plans as the standard two-stage distinct-agg. Rules are data, not
    code: adding one appends a (name, predicate) pair.
    """
    d = _t(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    rules = [
        ("doc_id_not_null", F.col("doc_id").isNull()),
        ("n_chars_matches_text", F.col("n_chars") != F.length("text")),
        ("lang_in_domain", ~F.col("lang").isin("en", "fr", "es", "de", "zh")),
        ("text_nonempty", F.size(toks) == 0),
    ]
    base = d.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct(F.col("doc_id")).alias("_ndist"),
        *[
            F.sum(pred.cast("int")).cast("long").alias(f"_v_{name}")
            for name, pred in rules
        ],
    )
    # Pivot the single aggregate row into one row per rule with ONE
    # explode — a unionByName of per-rule selects would re-run the
    # aggregation (and the scan) once per rule.
    rule_structs = [
        F.struct(
            F.lit(name).alias("rule"),
            F.col("n_rows").alias("n_rows"),
            F.col(f"_v_{name}").alias("n_violations"),
        )
        for name, _ in rules
    ] + [
        F.struct(
            F.lit("doc_id_unique").alias("rule"),
            F.col("n_rows").alias("n_rows"),
            (F.col("n_rows") - F.col("_ndist")).alias("n_violations"),
        )
    ]
    return (
        base.select(F.explode(F.array(*rule_structs)).alias("r"))
        .select("r.*")
        .orderBy("rule")
    )


# ---------------------------------------------------- cross-doc dup spans


@query(
    "q_dup_span_fraction",
    oracle=f"""
    WITH sh AS (
        SELECT DISTINCT doc_id, unnest(list_distinct({_DUCK_SHINGLES})) AS shingle
        FROM documents
    ),
    df AS (SELECT shingle, count(*) AS ndocs FROM sh GROUP BY shingle),
    j AS (SELECT sh.doc_id, df.ndocs FROM sh JOIN df USING (shingle))
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           round(CAST(sum(CASE WHEN ndocs >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
                 / count(*), 4) AS dup_frac
    FROM j GROUP BY doc_id
    """,
)
def q_dup_span_fraction(spark, sf_dir):
    """Cross-document duplicated-span fraction (Lee et al. 2021,
    arXiv:2107.06499 'Deduplicating Training Data Makes Language Models
    Better'): for each document, the share of its distinct 3-gram
    shingles that also occur in at least one OTHER document. The
    relational stand-in for their suffix-array duplicate-substring
    scan — same signal (how much of this doc is corpus boilerplate),
    join-based instead of suffix-automaton-based.

    Scale: shingle explode → distinct per doc (map-side combinable) →
    doc-frequency hash-agg keyed by shingle → join back keyed by
    shingle → per-doc agg. Two shuffles, both on hash keys with
    map-side partial aggregation; no windows, no sorts, no driver
    state. The shingle dictionary is the skew point (stopword-heavy
    shingles) — the same hot-band capping used in q_minhash_lsh applies
    if a shingle's doc list outgrows a partition.
    """
    d = _t(spark, sf_dir, "documents").withColumn(
        "toks", tokens(F.lower(F.col("text")))
    ).withColumn("shingles", shingles_from_tokens(F.col("toks")))
    sh = d.select(
        "doc_id", F.explode(F.array_distinct("shingles")).alias("shingle")
    )
    df = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("ndocs"))
    j = sh.join(df, "shingle")
    return j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.sum((F.col("ndocs") >= 2).cast("int")).cast("long").alias("n_dup"),
        F.round(
            F.sum((F.col("ndocs") >= 2).cast("int")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("dup_frac"),
    )


# ------------------------------------------------------------ BPE pair count


@query(
    "q_bpe_pair_count",
    oracle=f"""
    WITH w AS (
        SELECT unnest({_DUCK_TOKS}) AS word FROM documents
    ),
    vocab AS (
        SELECT word, count(*) AS wc FROM w WHERE len(word) >= 2 GROUP BY word
    ),
    pr AS (
        SELECT substring(word, CAST(i AS INT), 2) AS pair, wc
        FROM (SELECT word, wc, unnest(range(1, len(word))) AS i FROM vocab)
    )
    SELECT pair, CAST(sum(wc) AS BIGINT) AS freq
    FROM pr GROUP BY pair
    ORDER BY freq DESC, pair
    LIMIT 20
    """,
)
def q_bpe_pair_count(spark, sf_dir):
    """One BPE merge-candidate step (arXiv:1508.07909): count adjacent
    character pairs across the corpus, weighted by word frequency;
    emit the top-20 merge candidates.

    Scale design: the corpus is reduced to the VOCABULARY first (word →
    count hash-agg with map-side combine — the only corpus-sized
    shuffle), then pairs explode per *distinct* word, so the quadratic-
    ish pair stage scales with |vocab| (~10⁵-10⁶) regardless of corpus
    bytes. Top-20 runs as TakeOrdered (per-partition top-k + driver
    merge), never a full sort. This is exactly how distributed BPE/
    WordPiece trainers shard their count step.
    """
    d = _t(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(tokens(F.lower(F.col("text")))).alias("word"))
        .filter(F.length("word") >= 2)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    pairs = vocab.select(
        F.explode(
            F.expr("transform(sequence(1, length(word) - 1), i -> substring(word, i, 2))")
        ).alias("pair"),
        "wc",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("wc").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("pair"))
        .limit(20)
    )


# ------------------------------------------------- character entropy

@query(
    "q_char_entropy",
    oracle="""
    WITH chars AS (
        SELECT doc_id, unnest(string_split(lower(text), '')) AS ch
        FROM documents
    ),
    counts AS (
        SELECT doc_id, ch, count(*) AS c
        FROM chars WHERE ch <> ''
        GROUP BY doc_id, ch
    )
    SELECT doc_id,
           round(log2(sum(c)) - sum(c * log2(c)) / sum(c), 6) AS char_entropy
    FROM counts
    GROUP BY doc_id
    """,
)
def q_char_entropy(spark: SparkSession, sf_dir: str):
    """Per-document character-level Shannon entropy (bits/char) — the
    classic cheap gibberish/boilerplate signal (low entropy = repeated
    filler, high = random noise; both are curation cut candidates,
    cf. the Gopher rule family above).

    Computed via the log-identity H = log2(n) − (1/n)·Σ c·log2(c) so
    the whole thing is explode → two hash aggregates — no window, no
    per-doc sort, and the (doc_id, ch) key space is |docs|·|alphabet|,
    so partial aggregation collapses the exploded rows map-side. At
    100 TB the explode never materializes: it feeds straight into the
    partial agg inside one whole-stage-codegen span.
    """
    d = _t(spark, sf_dir, "documents")
    counts = (
        d.select("doc_id", F.explode(F.split(F.lower("text"), "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return counts.groupBy("doc_id").agg(
        F.round(
            F.log2(F.sum("c")) - F.sum(F.col("c") * F.log2("c")) / F.sum("c"), 6
        ).alias("char_entropy")
    )


# ------------------------------------------ Jensen-Shannon divergence


@query(
    "q_js_divergence",
    oracle="""
    WITH al AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS a
        FROM documents GROUP BY 1, 2
    ),
    tl AS (SELECT lang, CAST(count(*) AS BIGINT) AS t
           FROM documents GROUP BY 1),
    sa AS (SELECT source, CAST(count(*) AS BIGINT) AS a_tot
           FROM documents GROUP BY 1),
    n AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM documents),
    grid AS (
        SELECT sa.source, tl.lang, tl.t, sa.a_tot, n.n_all,
               coalesce(al.a, 0) AS a
        FROM sa CROSS JOIN tl CROSS JOIN n
        LEFT JOIN al ON al.source = sa.source AND al.lang = tl.lang
    ),
    terms AS (
        SELECT source, a_tot, n_all - a_tot AS b_tot, a, t - a AS b
        FROM grid
    ),
    s AS (
        SELECT source, a_tot, b_tot,
               sum(CASE WHEN a > 0 THEN a * (log2(CAST(a AS DOUBLE))
                   - log2(CAST(CAST(a AS HUGEINT) * b_tot
                     + CAST(b AS HUGEINT) * a_tot AS DOUBLE)))
                   ELSE 0 END) AS sum_a,
               sum(CASE WHEN b > 0 THEN b * (log2(CAST(b AS DOUBLE))
                   - log2(CAST(CAST(a AS HUGEINT) * b_tot
                     + CAST(b AS HUGEINT) * a_tot AS DOUBLE)))
                   ELSE 0 END) AS sum_b
        FROM terms GROUP BY 1, 2, 3
    )
    SELECT source, a_tot AS n_docs,
           CASE WHEN b_tot > 0 THEN
               round(0.5 * (sum_a / a_tot + 1 + log2(CAST(b_tot AS DOUBLE))
                          + sum_b / b_tot + 1 + log2(CAST(a_tot AS DOUBLE))),
                     6)
           END AS jsd_bits
    FROM s
    """,
)
def q_js_divergence(spark, sf_dir):
    """Jensen-Shannon divergence (bits) between each source's language
    distribution and the REST of the corpus — the domain-drift audit
    behind data-mixing decisions (q_domain_mixture picks weights; JSD
    quantifies how far a source's composition sits from the corpus —
    symmetric and bounded [0,1] bits, unlike raw KL which is neither).

    Exactness discipline (the q_char_entropy log-identity move, taken
    through both KL terms): with integer counts a_i (in-source per
    lang, total A) and b_i (rest, total B), m-terms reduce to logs of
    INTEGERS — KL(P‖M) = 1 + log2 B + (1/A)·Σ a_i·(log2 a_i −
    log2(a_i·B + b_i·A)) and symmetrically — so both engines evaluate
    the identical integer-argument log2 chain, rounded 6dp. Zero
    cells contribute exactly 0 on both sides by the CASE guard.

    Scale: ONE corpus scan — the (source, lang) grid aggregate — and
    every marginal (per-lang totals, per-source totals, the corpus
    total) re-aggregates the BOUNDED grid, so the corpus is read
    exactly once (the grid is materialized for its four consumers).
    The source × lang fan is a BROADCAST cross join of the two
    bounded dimension relations (the q_benford scalar-fan class,
    whitelisted in the plan guard: a dimension fan, not a pair
    explosion) + one left equi-join; totals are broadcast-sized. The
    products a·B + b·A are computed in decimal(38,0) (HUGEINT on the
    oracle side), exact to ~10¹⁹ docs — a long product would have
    silently wrapped past ~3·10⁹ docs with ANSI off (r10 ADVICE #3)."""
    d = _t(spark, sf_dir, "documents")
    al = (
        d.groupBy("source", "lang")
        .agg(F.count(F.lit(1)).alias("a"))
        .localCheckpoint()
    )
    tl = al.groupBy("lang").agg(F.sum("a").alias("t"))
    sa = al.groupBy("source").agg(F.sum("a").alias("a_tot"))
    n = al.agg(F.sum("a").alias("n_all"))
    grid = (
        sa.crossJoin(F.broadcast(tl))
        .crossJoin(F.broadcast(n))
        .join(al, ["source", "lang"], "left")
        .select(
            "source",
            "a_tot",
            (F.col("n_all") - F.col("a_tot")).alias("b_tot"),
            F.coalesce(F.col("a"), F.lit(0)).alias("a"),
            (F.col("t") - F.coalesce(F.col("a"), F.lit(0))).alias("b"),
        )
    )
    # a·B + b·A in decimal(38,0): a long product would silently wrap
    # past ~3e9 docs with ANSI off (r10 ADVICE #3) — the decimal lift
    # is exact to ~1e19 docs and costs nothing on the bounded grid
    mlog = F.log2(
        (
            F.col("a").cast("decimal(38,0)") * F.col("b_tot")
            + F.col("b").cast("decimal(38,0)") * F.col("a_tot")
        ).cast("double")
    )
    s = grid.groupBy("source", "a_tot", "b_tot").agg(
        F.sum(
            F.when(
                F.col("a") > 0,
                F.col("a") * (F.log2(F.col("a").cast("double")) - mlog),
            ).otherwise(F.lit(0.0))
        ).alias("sum_a"),
        F.sum(
            F.when(
                F.col("b") > 0,
                F.col("b") * (F.log2(F.col("b").cast("double")) - mlog),
            ).otherwise(F.lit(0.0))
        ).alias("sum_b"),
    )
    return s.select(
        "source",
        F.col("a_tot").alias("n_docs"),
        F.when(
            F.col("b_tot") > 0,
            F.round(
                F.lit(0.5)
                * (
                    F.col("sum_a") / F.col("a_tot")
                    + 1
                    + F.log2(F.col("b_tot").cast("double"))
                    + F.col("sum_b") / F.col("b_tot")
                    + 1
                    + F.log2(F.col("a_tot").cast("double"))
                ),
                6,
            ),
        ).alias("jsd_bits"),
    )


# ------------------------------------------------ governance / fuzzy

@query(
    "q_k_anonymity",
    oracle="""
    SELECT lang, source, n_chars // 100 AS size_band,
           count(*) AS group_size
    FROM documents
    GROUP BY lang, source, n_chars // 100
    HAVING count(*) < 5
    """,
)
def q_k_anonymity(spark, sf_dir):
    """k-anonymity audit (k=5) over the quasi-identifier tuple
    (lang, source, size band): emit every group small enough to
    re-identify members — the privacy gate run before releasing a
    curated corpus (companion to q_pii_scrub's content-level pass).
    One hash aggregate + HAVING; embarrassingly scalable."""
    d = _t(spark, sf_dir, "documents")
    return (
        d.groupBy(
            "lang",
            "source",
            (F.col("n_chars") / 100).cast("long").alias("size_band"),
        )
        .agg(F.count(F.lit(1)).alias("group_size"))
        .filter(F.col("group_size") < 5)
    )


_FUZZ_BUCKET = 20  # chars per length bucket = the max length difference
_FUZZ_PREFIX = 40
_FUZZ_MAXDIST = 5


def fuzzy_match_pairs(
    d: DataFrame,
    bucket: int = _FUZZ_BUCKET,
    max_dist: int = _FUZZ_MAXDIST,
) -> DataFrame:
    """The blocked fuzzy-match plan over a (doc_id, lang, len, prefix)
    relation — factored out of q_fuzzy_match (r9) so the 500k-row
    scale test drives the EXACT product plan without materializing
    document text. Each doc hashes to one ⌊len/bucket⌋ bucket, the
    probe side explodes to its 3 neighboring buckets (lossless for
    |Δlen| ≤ bucket — the 1-D grid-join trick), candidates come from
    an equi-join on (lang, bucket), and each qualifying pair meets in
    EXACTLY one bucket (the candidate's own), so no post-join dedup.
    Levenshtein runs JVM-side on the bounded prefixes only."""
    b = F.lit(bucket)
    probe = d.select(
        F.col("doc_id").alias("a_id"), "lang",
        F.col("len").alias("a_len"), F.col("prefix").alias("a_prefix"),
        F.explode(
            F.array(
                F.floor(F.col("len") / b) - 1,
                F.floor(F.col("len") / b),
                F.floor(F.col("len") / b) + 1,
            )
        ).alias("bkt"),
    )
    cand = d.select(
        F.col("doc_id").alias("b_id"), "lang",
        F.col("len").alias("b_len"), F.col("prefix").alias("b_prefix"),
        F.floor(F.col("len") / b).alias("bkt"),
    )
    dist = F.levenshtein("a_prefix", "b_prefix")
    return (
        probe.join(cand, ["lang", "bkt"])
        .filter(
            (F.col("a_id") < F.col("b_id"))
            & (F.abs(F.col("a_len") - F.col("b_len")) <= b)
        )
        .select("a_id", "b_id", dist.alias("dist"))
        .filter(F.col("dist") <= max_dist)
    )


@query(
    "q_fuzzy_match",
    oracle=f"""
    SELECT a.doc_id AS a_id, b.doc_id AS b_id,
           levenshtein(substr(a.text, 1, {_FUZZ_PREFIX}),
                       substr(b.text, 1, {_FUZZ_PREFIX})) AS dist
    FROM documents a JOIN documents b
      ON a.lang = b.lang AND a.doc_id < b.doc_id
     AND abs(length(a.text) - length(b.text)) <= {_FUZZ_BUCKET}
    WHERE levenshtein(substr(a.text, 1, {_FUZZ_PREFIX}),
                      substr(b.text, 1, {_FUZZ_PREFIX})) <= {_FUZZ_MAXDIST}
    """,
)
def q_fuzzy_match(spark, sf_dir):
    """Edit-distance fuzzy matching (record linkage / title dedup): doc
    pairs in the same language whose lengths differ ≤ 20 and whose
    40-char prefixes are within Levenshtein distance 5.

    The oracle states the naive same-language theta join; the Spark
    plan blocks first via fuzzy_match_pairs (factored for the 500k
    scale test, r9): one ⌊len/20⌋ bucket per doc, 3-bucket probe
    explode (lossless for |Δlen| ≤ 20), equi-join on (lang, bucket),
    Levenshtein JVM-side on bounded 40-char prefixes — O(40²) per
    candidate, never on full documents.
    """
    d = _t(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.length("text").alias("len"),
        F.substring("text", 1, _FUZZ_PREFIX).alias("prefix"),
    )
    return fuzzy_match_pairs(d)


# ------------------------------------------------- data mixing / curriculum

_MIX_ALPHA = 0.3          # sampling temperature (XLM-R style, arXiv:1911.02116)
_MIX_TOKEN_BUDGET = 10_000_000  # tokens drawn per "epoch" of the mixture


@query(
    "q_domain_mixture",
    oracle=f"""
    WITH dom AS (
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(sum(len(list_filter(string_split_regex(lower(text), '\\s+'),
                                        x -> x <> ''))) AS BIGINT) AS n_toks
        FROM documents
        GROUP BY lang, source
    ),
    w AS (
        SELECT *,
               CAST(round(pow(n_toks, {_MIX_ALPHA}), 6) AS DECIMAL(18,6))
                 AS w_raw
        FROM dom
    ),
    t AS (SELECT sum(w_raw) AS total_w FROM w)
    SELECT lang, source, n_docs, n_toks,
           round(CAST(w_raw AS DOUBLE) / CAST(total_w AS DOUBLE), 6)
             AS weight,
           round(round(CAST(w_raw AS DOUBLE) / CAST(total_w AS DOUBLE), 6)
                 * {_MIX_TOKEN_BUDGET}, 2) AS expected_toks
    FROM w CROSS JOIN t
    """,
)
def q_domain_mixture(spark: SparkSession, sf_dir: str):
    """Domain-mixture sampling weights — the "data mixing" step of LLM
    pre-training (temperature sampling over domains, XLM-R
    arXiv:1911.02116 §3.1): per (lang, source) domain, weight ∝
    (token count)^α with α=0.3, normalized over domains, plus the
    expected token budget each domain contributes per epoch. Low-
    resource domains are up-sampled, dominant ones down-sampled.

    Scale shape: ONE map-side-combining aggregate over the corpus
    (domains are the grouping key), then scalar algebra on the tiny
    domain relation with a broadcast 1-row total. Engine-portable
    float discipline: pow() is rounded to the 1e-6 grid and summed as
    DECIMAL so the normalizing total is exact and order-independent on
    both engines."""
    d = load_table(spark, sf_dir, "documents")
    n_toks = F.size(
        F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    )
    dom = (
        scatter(d)
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(n_toks).alias("n_toks"),
        )
    )
    w = dom.withColumn(
        "w_raw",
        F.round(F.pow(F.col("n_toks").cast("double"), _MIX_ALPHA), 6).cast(
            "decimal(18,6)"
        ),
    )
    total = w.agg(F.sum("w_raw").alias("total_w"))
    weight = F.round(
        F.col("w_raw").cast("double") / F.col("total_w").cast("double"), 6
    )
    return (
        w.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "source",
            "n_docs",
            "n_toks",
            weight.alias("weight"),
            F.round(weight * F.lit(_MIX_TOKEN_BUDGET), 2).alias(
                "expected_toks"
            ),
        )
    )


@query(
    "q_curriculum",
    oracle="""
    WITH r AS (
        SELECT doc_id, n_chars AS difficulty,
               row_number() OVER (ORDER BY n_chars, doc_id) AS rank
        FROM documents
    ),
    n AS (SELECT count(*) AS n_total FROM documents)
    SELECT doc_id, difficulty, rank,
           CAST(floor((rank - 1) * 10.0 / (SELECT n_total FROM n)) AS BIGINT)
               AS bucket
    FROM r
    """,
)
def q_curriculum(spark: SparkSession, sf_dir: str):
    """Curriculum ordering for training: every document gets a global
    difficulty rank (difficulty proxy: document length; tie-break
    doc_id) and a decile bucket 0-9 — the schedule a curriculum
    data loader consumes easy-to-hard.

    The global rank is the interesting part at scale: it runs on
    `distributed_cumulative` (percentile-bucketed two-pass ranking,
    operators/windows.py) — NO single-partition window anywhere, while
    the DuckDB oracle uses the plain global row_number the operator is
    proven bit-identical to."""
    from ..operators.windows import distributed_cumulative

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").alias("difficulty")
    )
    ranked = distributed_cumulative(
        scatter(d), ["difficulty", "doc_id"], out_col="rank"
    )
    total = ranked.agg(F.count(F.lit(1)).alias("n_total"))
    return ranked.crossJoin(F.broadcast(total)).select(
        "doc_id",
        "difficulty",
        "rank",
        F.floor((F.col("rank") - 1) * 10.0 / F.col("n_total"))
        .cast("long")
        .alias("bucket"),
    )


# ---------------------------------------------------- BPE merge learning

_BPE_STEPS = 3


def _bpe_learn_oracle() -> str:
    """Unrolled-CTE mirror of the 3-step BPE merge loop (same
    discipline as the k-means and PageRank oracles): per step, pair
    counting over the current symbol strings, argmin/argmax top pair,
    and the identical two-pass `replace` application."""
    steps = []
    for k in range(1, _BPE_STEPS + 1):
        steps.append(f"""
    p{k} AS (
        SELECT pr.a AS a, pr.b AS b, weight
        FROM (
            SELECT unnest(list_transform(range(1, len(l)),
                       i -> {{'a': l[i], 'b': l[i + 1]}})) AS pr,
                   weight
            FROM (
                SELECT list_filter(string_split(s, ' '), x -> x <> '') AS l,
                       weight
                FROM s{k - 1}
            )
        )
        WHERE pr.a <> pr.b
    ),
    t{k} AS (
        SELECT a, b, CAST(sum(weight) AS BIGINT) AS cnt
        FROM p{k} GROUP BY a, b
        ORDER BY cnt DESC, a, b LIMIT 1
    ),
    s{k} AS (
        SELECT replace(replace(v.s,
                   ' ' || t.a || ' ' || t.b || ' ', ' ' || t.a || t.b || ' '),
                   ' ' || t.a || ' ' || t.b || ' ', ' ' || t.a || t.b || ' ')
                   AS s,
               v.weight
        FROM s{k - 1} v CROSS JOIN t{k} t
    )""")
    outs = " UNION ALL ".join(
        f"SELECT {k} AS step, a, b, a || b AS merged, cnt FROM t{k}"
        for k in range(1, _BPE_STEPS + 1)
    )
    return f"""
    WITH vocab AS (
        SELECT word, count(*) AS weight
        FROM (SELECT unnest({_DUCK_TOKS}) AS word FROM documents)
        GROUP BY word
    ),
    s0 AS (
        SELECT ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS s, weight
        FROM vocab
    ),
    {",".join(steps)}
    SELECT CAST(step AS INT) AS step, a, b, merged, cnt FROM ({outs})
    """


@query("q_bpe_learn", oracle=_bpe_learn_oracle())
def q_bpe_learn(spark: SparkSession, sf_dir: str):
    """BPE vocabulary LEARNING (Sennrich et al. 2016, arXiv:1508.07909
    algorithm 1), three unrolled merge iterations: count adjacent
    symbol pairs across the vocabulary (weighted by word frequency),
    adopt the most frequent pair as a merge, rewrite every word's
    symbol sequence, repeat. Output: the learned merge table
    (step, a, b, merged, cnt) — the artifact a BPE tokenizer ships.

    Engine contracts that make this exact cross-engine:
    * words live as separator-joined symbol strings (' a b c '); a
      merge applies as TWO passes of plain `replace(' a b ', ' ab ')`
      — for a ≠ b this is provably identical to the left-to-right
      greedy scan (occurrences are token-disjoint; pass 1 takes the
      odd ones sharing separators, pass 2 the rest), and self-pairs
      (a = b) are excluded from merge selection so the parity edge
      case cannot arise.
    * top pair ties break (count DESC, a, b) — deterministic.

    Scale shape: everything after the first aggregate operates on the
    VOCABULARY relation (word, weight), not the corpus — pair counting
    is a map-side-combining hash aggregate over vocab-sized data, the
    winning pair is a 1-row TakeOrdered broadcast, and the rewrite is
    a narrow projection. Exactly how production BPE trainers shard:
    corpus → counts once, then iterate on counts."""
    d = scatter(load_table(spark, sf_dir, "documents"))
    vocab = (
        d.select(F.explode(tokens(F.lower(F.col("text")))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("weight"))
    )
    cur = vocab.select(
        F.concat(
            F.lit(" "), F.regexp_replace("word", "(.)", "$1 ")
        ).alias("s"),
        "weight",
    )
    outs = []
    for step in range(1, _BPE_STEPS + 1):
        syms = F.filter(F.split(F.col("s"), " "), lambda t: t != "")
        prs = F.when(
            F.size(syms) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.struct(
                    F.element_at(syms, i).alias("a"),
                    F.element_at(syms, i + F.lit(1)).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        top = (
            cur.select(F.explode(prs).alias("pr"), "weight")
            .select(F.col("pr.a").alias("a"), F.col("pr.b").alias("b"), "weight")
            .filter(F.col("a") != F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("weight").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
        )
        outs.append(
            top.select(
                F.lit(step).alias("step"),
                "a",
                "b",
                F.concat("a", "b").alias("merged"),
                "cnt",
            )
        )
        pat = F.concat(F.lit(" "), F.col("_ma"), F.lit(" "), F.col("_mb"), F.lit(" "))
        rep = F.concat(F.lit(" "), F.col("_ma"), F.col("_mb"), F.lit(" "))
        cur = (
            cur.crossJoin(
                F.broadcast(
                    top.select(
                        F.col("a").alias("_ma"), F.col("b").alias("_mb")
                    )
                )
            )
            .select(F.replace(F.replace(F.col("s"), pat, rep), pat, rep).alias("s"), "weight")
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@query(
    "q_training_manifest",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, source, n_chars, {_DUCK_TOKS} AS toks
        FROM documents
    ),
    gated AS (
        SELECT doc_id, lang, source, n_chars,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               md5(array_to_string(toks, ' ')) AS fingerprint
        FROM toks
        WHERE len(toks) >= 5 AND n_chars >= 30
    ),
    kept AS (
        SELECT doc_id, lang, source, n_chars, n_tokens FROM (
            SELECT *, row_number() OVER (PARTITION BY fingerprint
                                         ORDER BY doc_id) AS rn
            FROM gated
        ) WHERE rn = 1
    ),
    dom AS (
        SELECT lang, source,
               CAST(round(pow(sum(n_tokens), 0.3), 6) AS DECIMAL(18,6))
                 AS w_raw
        FROM kept GROUP BY lang, source
    ),
    tot AS (SELECT sum(w_raw) AS total_w FROM dom),
    packed AS (
        SELECT doc_id, lang, source, n_chars, n_tokens,
               ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
                 % 8 AS shard_id,
               sum(n_tokens) OVER (
                   PARTITION BY ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 8
                   ORDER BY doc_id ROWS UNBOUNDED PRECEDING) - n_tokens
                 AS cum_before
        FROM kept
    )
    SELECT p.doc_id, p.lang, p.source, p.shard_id,
           CAST(floor(p.cum_before / 512.0) AS BIGINT) AS bin_id,
           CAST(p.cum_before - floor(p.cum_before / 512.0) * 512 AS BIGINT)
               AS offset_in_bin,
           round(CAST(d.w_raw AS DOUBLE) / CAST(t.total_w AS DOUBLE), 6)
               AS weight,
           least(CAST(floor(p.n_chars / 400.0) AS BIGINT), 9)
               AS difficulty_bucket
    FROM packed p
    JOIN dom d USING (lang, source)
    CROSS JOIN tot t
    """,
)
def q_training_manifest(spark: SparkSession, sf_dir: str):
    """THE composed LLM-pretraining data pipeline as one declarative
    plan — what a user of this engine actually ships to the trainer:

      quality gate (token/char floors, the Gopher-rule shape)
        → exact-dedup keep-first (normalized-token fingerprint)
        → temperature domain-mixture weight per (lang, source)
          (q_domain_mixture's DECIMAL-exact normalizer)
        → hash-sharded sequence packing (q_pack_sequences_sharded's
          per-shard token tapes — no global order anywhere)
        → fixed-width curriculum difficulty bucket

    emitting one manifest row per surviving document: where it lives
    (shard, bin, offset), how often to sample its domain (weight), and
    when to schedule it (difficulty_bucket).

    Scale shape: one corpus scan; one dedup shuffle (fingerprint); one
    shard-window shuffle; the domain relation reduces to a handful of
    rows and broadcasts back. Every stage is an already-oracle-verified
    operator — this query proves they COMPOSE without materialization
    barriers."""
    d = load_table(spark, sf_dir, "documents").withColumn(
        "toks", tokens(F.lower(F.col("text")))
    )
    gated = d.filter(
        (F.size("toks") >= 5) & (F.col("n_chars") >= 30)
    ).select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.size("toks").cast("long").alias("n_tokens"),
        F.md5(F.array_join("toks", " ")).alias("fingerprint"),
    )
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    kept = (
        gated.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn", "fingerprint")
    )
    dom = (
        kept.groupBy("lang", "source")
        .agg(
            F.round(F.pow(F.sum("n_tokens").cast("double"), 0.3), 6)
            .cast("decimal(18,6)")
            .alias("w_raw")
        )
    )
    tot = dom.agg(F.sum("w_raw").alias("total_w"))
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 8
    )
    wp = Window.partitionBy("shard_id").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    packed = kept.withColumn("shard_id", shard).withColumn(
        "cum_before", F.sum("n_tokens").over(wp) - F.col("n_tokens")
    )
    bin_id = F.floor(F.col("cum_before") / 512.0)
    weight = F.round(
        F.col("w_raw").cast("double") / F.col("total_w").cast("double"), 6
    )
    return (
        packed.join(F.broadcast(dom), ["lang", "source"])
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "lang",
            "source",
            "shard_id",
            bin_id.cast("long").alias("bin_id"),
            (F.col("cum_before") - bin_id * 512).cast("long").alias(
                "offset_in_bin"
            ),
            weight.alias("weight"),
            F.least(F.floor(F.col("n_chars") / 400.0).cast("long"), F.lit(9))
            .alias("difficulty_bucket"),
        )
    )


@query(
    "q_dedup_canonical",
    oracle=f"""
    WITH fp AS (
        SELECT doc_id, lang, source,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               round(CASE WHEN len(toks) > 0
                     THEN CAST(len(list_filter(toks, x -> x IN ({_SW_LIST})))
                          AS DOUBLE) / len(toks)
                     ELSE 0.0 END, 6) AS quality,
               md5(array_to_string(toks, ' ')) AS fingerprint
        FROM (SELECT doc_id, lang, source, {_DUCK_TOKS} AS toks FROM documents)
    ),
    best AS (
        SELECT doc_id, lang, source, n_tokens, quality, fingerprint, n_copies
        FROM (
            SELECT *,
                   row_number() OVER (PARTITION BY fingerprint
                                      ORDER BY quality DESC, doc_id) AS rn,
                   count(*) OVER (PARTITION BY fingerprint) AS n_copies
            FROM fp
        ) WHERE rn = 1
    )
    SELECT doc_id, lang, source, n_tokens, quality,
           CAST(n_copies AS BIGINT) AS n_copies
    FROM best
    """,
)
def q_dedup_canonical(spark: SparkSession, sf_dir: str):
    """Canonical-copy selection: exact-duplicate groups (normalized-
    token fingerprint) keep the HIGHEST-QUALITY copy, not the first —
    the curation policy that matters when duplicates differ in
    extraction quality (quality proxy here: stopword fraction, the
    natural-language signal; tie-break doc_id). Output: the surviving
    document per group plus how many copies it beat.

    Scale shape: keep-best is a single map-side-combining hash
    aggregate — `max(struct(quality, -doc_id, payload...))` per
    fingerprint (operators/windows.argmax_agg), with the copy count in
    the SAME aggregate. No sort window touches the corpus; the shuffle
    carries one candidate per (partition, fingerprint). Contrast with
    q_dedup_keep_one (graph-clustered near-dups, keep-min-id) and
    q_dedup_keep_one's window-based keep-first — this is the shape to
    prefer at 100 TB."""
    d = scatter(load_table(spark, sf_dir, "documents")).withColumn(
        "toks", tokens(F.lower(F.col("text")))
    )
    fp = d.select(
        "doc_id",
        "lang",
        "source",
        F.size("toks").cast("long").alias("n_tokens"),
        F.round(
            F.when(
                F.size("toks") > 0,
                F.size(
                    F.filter("toks", lambda t: t.isin(*STOPWORDS))
                ).cast("double")
                / F.size("toks"),
            ).otherwise(0.0),
            6,
        ).alias("quality"),
        F.md5(F.array_join("toks", " ")).alias("fingerprint"),
    )
    best = fp.groupBy("fingerprint").agg(
        F.max(
            F.struct(
                F.col("quality"),
                (-F.col("doc_id")).alias("_neg_id"),
                F.col("doc_id").alias("doc_id"),
                F.col("lang").alias("lang"),
                F.col("source").alias("source"),
                F.col("n_tokens").alias("n_tokens"),
            )
        ).alias("w"),
        F.count(F.lit(1)).alias("n_copies"),
    )
    return best.select(
        F.col("w.doc_id").alias("doc_id"),
        F.col("w.lang").alias("lang"),
        F.col("w.source").alias("source"),
        F.col("w.n_tokens").alias("n_tokens"),
        F.col("w.quality").alias("quality"),
        "n_copies",
    )


# ----------------------------------- learned quality classifier (linear)

_CLF_VOCAB = 500  # model vocabulary: top-N corpus tokens
_CLF_BIAS = -40  # integer bias on the 1/1000 weight grid


def _clf_oracle() -> str:
    from ._sqlgen import hex_int

    w_int = f"({hex_int('md5(tok)', 1, 8)} % 2001 - 1000)"
    return f"""
    WITH tok AS (
        SELECT doc_id, u.tok AS tok
        FROM (SELECT doc_id, {_DUCK_TOKS} AS l FROM documents),
             unnest(l) AS u(tok)
    ),
    vocab AS (
        SELECT tok, {w_int} AS w_int FROM (
            SELECT tok, row_number() OVER (ORDER BY count(*) DESC, tok) AS rn
            FROM tok GROUP BY tok
        ) WHERE rn <= {_CLF_VOCAB}
    ),
    doc_len AS (
        SELECT doc_id, count(*) AS n_toks FROM tok GROUP BY doc_id
    ),
    dots AS (
        SELECT t.doc_id, CAST(sum(v.w_int) AS BIGINT) AS dot_int
        FROM tok t JOIN vocab v ON v.tok = t.tok
        GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(o.dot_int, 0) + {_CLF_BIAS} * d.n_toks AS DOUBLE)
               / (1000 * d.n_toks) AS logit,
           (coalesce(o.dot_int, 0) + {_CLF_BIAS} * d.n_toks) > 0 AS accepted
    FROM doc_len d LEFT JOIN dots o ON o.doc_id = d.doc_id
    """


@query("q_classifier_score", oracle=_clf_oracle())
def q_classifier_score(spark, sf_dir):
    """Learned quality filter as a relational op — the fasttext-style
    linear classifier every production curation pipeline runs after the
    heuristic gates (CCNet, arXiv:1911.00359 §4.3; GPT-3's quality
    classifier, arXiv:2005.14165 §A): score each document with a
    broadcast (term, weight) model table and threshold.

    Model = top-500 corpus tokens with md5-derived INTEGER weights on a
    1/1000 grid (a deterministic stand-in for trained weights — the
    relational shape is identical: at 100 TB the model table is a
    ~vocab-row broadcast, the scoring one explode + broadcast join +
    map-side-combined sum per doc). logit = (Σ w_int·tf + bias·n_toks)
    / (1000·n_toks): everything up to the last step is exact integer
    arithmetic, and the one float op is a single correctly-rounded IEEE
    division of identical operands — bit-identical cross-engine with NO
    round() call (a round(·, 6) here hit a live half-tie where Spark's
    BigDecimal HALF_UP and DuckDB's multiply-based rounding disagreed;
    the acceptance flag is likewise a pure integer sign test). The
    output is the logit, not sigmoid(logit):
    sigmoid is monotone, so the accept threshold is equivalent, and no
    transcendental function (whose last-ulp rounding differs across
    engines) ever touches the checked values.

    Output: (doc_id, logit, accepted) for every document — tokens
    outside the model vocabulary contribute 0 (the left join)."""
    d = scatter(load_table(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("tok"),
    )
    # WindowGroupLimit: each partition forwards only its top-500 counts
    vocab = (
        tok.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("_n"))
        .withColumn("rn", F.row_number().over(Window.orderBy(F.col("_n").desc(), F.col("tok").asc())))
        .filter(F.col("rn") <= _CLF_VOCAB)
        .select(
            "tok",
            (
                F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("long")
                % 2001
                - 1000
            ).alias("w_int"),
        )
    )
    doc_len = tok.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks"))
    dots = (
        tok.join(F.broadcast(vocab), "tok")
        .groupBy("doc_id")
        .agg(F.sum("w_int").alias("dot_int"))
    )
    num = F.coalesce(F.col("dot_int"), F.lit(0)) + F.lit(_CLF_BIAS) * F.col(
        "n_toks"
    )
    return doc_len.join(dots, "doc_id", "left").select(
        "doc_id",
        (num.cast("double") / (1000 * F.col("n_toks"))).alias("logit"),
        (num > 0).alias("accepted"),
    )


# ------------------------------------- context-window chunking

_CHUNK_LEN = 128  # tokens per chunk
_CHUNK_STRIDE = 96  # overlap = 32 tokens


@query(
    "q_chunk_documents",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, {_DUCK_TOKS} AS l FROM documents
    ),
    sized AS (
        SELECT doc_id, l, len(l) AS n_toks FROM toks WHERE len(l) > 0
    ),
    chunks AS (
        SELECT doc_id, n_toks, u.start AS start_tok
        FROM sized, unnest(range(0, n_toks, {_CHUNK_STRIDE})) AS u(start)
    )
    SELECT c.doc_id,
           CAST(c.start_tok / {_CHUNK_STRIDE} AS BIGINT) AS chunk_id,
           c.start_tok,
           CAST(least({_CHUNK_LEN}, c.n_toks - c.start_tok) AS BIGINT)
               AS chunk_len,
           md5(array_to_string(
               list_slice(s.l, c.start_tok + 1,
                          c.start_tok + least({_CHUNK_LEN},
                                              c.n_toks - c.start_tok)),
               ' ')) AS chunk_digest
    FROM chunks c JOIN sized s ON s.doc_id = c.doc_id
    """,
)
def q_chunk_documents(spark, sf_dir):
    """Context-window chunking — the preprocessing step that turns
    variable-length documents into model-sized training windows:
    {_CHUNK_LEN}-token chunks every {_CHUNK_STRIDE} tokens (32-token
    overlap so no span is ever split across a boundary without also
    appearing whole in a neighbor; the RAG/pretraining sliding-window
    standard). The final chunk is short (n_toks − start), never padded
    here — padding policy belongs to the packer (q_pack_sequences).

    Checked values include the md5 of each chunk's reassembled text, so
    the hash compare pins the exact token SLICES, not just the offsets.

    Scale shape: embarrassingly parallel — one generator expression
    (sequence + explode) per document, no shuffle at all; the chunk
    relation is the input to the packing/dedup stages downstream."""
    d = scatter(load_table(spark, sf_dir, "documents"))
    sized = d.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "").alias(
            "l"
        ),
    ).withColumn("n_toks", F.size("l")).filter(F.col("n_toks") > 0)
    chunks = sized.select(
        "doc_id",
        "l",
        "n_toks",
        F.explode(
            F.sequence(
                F.lit(0),
                F.col("n_toks") - 1,
                F.lit(_CHUNK_STRIDE),
            )
        ).alias("start_tok"),
    )
    chunk_len = F.least(F.lit(_CHUNK_LEN), F.col("n_toks") - F.col("start_tok"))
    return chunks.select(
        "doc_id",
        (F.col("start_tok") / _CHUNK_STRIDE).cast("long").alias("chunk_id"),
        "start_tok",
        chunk_len.cast("long").alias("chunk_len"),
        F.md5(
            F.concat_ws(
                " ", F.slice(F.col("l"), F.col("start_tok") + 1, chunk_len)
            )
        ).alias("chunk_digest"),
    )


# ----------------------------------------------------------- l-diversity

_LDIV_MIN = 3  # required distinct sensitive values per QI group


@query(
    "q_l_diversity",
    oracle=f"""
    SELECT user_id, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           count(DISTINCT event_type) AS l,
           count(*) AS group_size
    FROM events
    GROUP BY user_id, CAST(ts AS DATE)
    HAVING count(DISTINCT event_type) < {_LDIV_MIN}
    """,
)
def q_l_diversity(spark: SparkSession, sf_dir: str):
    """l-diversity audit (Machanavajjhala et al., ICDE'06) — the
    companion privacy gate to q_k_anonymity: a quasi-identifier group
    can be large (k-anonymous) yet still leak if every member shares
    the same SENSITIVE value. Here the QI tuple is (user, day) and the
    sensitive attribute is the event type; groups carrying fewer than
    l=3 distinct sensitive values are emitted for suppression before a
    behavioral dataset is released.

    One hash aggregate with an exact distinct count + HAVING — the
    same embarrassingly-scalable shape as q_k_anonymity (distinct
    counting within a group is a two-level hash aggregate; at 100 TB
    swap in approx_count_distinct per q_approx_count_distinct if the
    sensitive domain is unbounded).
    """
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy("user_id", F.to_date("ts").cast("string").alias("day"))
        .agg(
            F.countDistinct("event_type").alias("l"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .filter(F.col("l") < _LDIV_MIN)
    )


# -------------------------------------------------- BPE application

def _bpe_encode_oracle() -> str:
    """The learn chain with `word` carried through the rewrite CTEs,
    then token counts joined back onto the per-doc word stream."""
    steps = []
    for k in range(1, _BPE_STEPS + 1):
        steps.append(f"""
    p{k} AS (
        SELECT pr.a AS a, pr.b AS b, weight
        FROM (
            SELECT unnest(list_transform(range(1, len(l)),
                       i -> {{'a': l[i], 'b': l[i + 1]}})) AS pr,
                   weight
            FROM (
                SELECT list_filter(string_split(s, ' '), x -> x <> '') AS l,
                       weight
                FROM s{k - 1}
            )
        )
        WHERE pr.a <> pr.b
    ),
    t{k} AS (
        SELECT a, b, CAST(sum(weight) AS BIGINT) AS cnt
        FROM p{k} GROUP BY a, b
        ORDER BY cnt DESC, a, b LIMIT 1
    ),
    s{k} AS (
        SELECT v.word,
               replace(replace(v.s,
                   ' ' || t.a || ' ' || t.b || ' ', ' ' || t.a || t.b || ' '),
                   ' ' || t.a || ' ' || t.b || ' ', ' ' || t.a || t.b || ' ')
                   AS s,
               v.weight
        FROM s{k - 1} v CROSS JOIN t{k} t
    )""")
    return f"""
    WITH vocab AS (
        SELECT word, count(*) AS weight
        FROM (SELECT unnest({_DUCK_TOKS}) AS word FROM documents)
        GROUP BY word
    ),
    s0 AS (
        SELECT word, ' ' || regexp_replace(word, '(.)', '\\1 ', 'g') AS s,
               weight
        FROM vocab
    ),
    {",".join(steps)},
    wtok AS (
        SELECT word,
               CAST(len(list_filter(string_split(s, ' '), x -> x <> ''))
                    AS BIGINT) AS n_tok
        FROM s{_BPE_STEPS}
    ),
    docw AS (
        SELECT doc_id, unnest({_DUCK_TOKS}) AS word FROM documents
    )
    SELECT d.doc_id, count(*) AS n_words,
           CAST(sum(w.n_tok) AS BIGINT) AS n_tokens
    FROM docw d JOIN wtok w ON w.word = d.word
    GROUP BY d.doc_id
    """


@query("q_bpe_encode", oracle=_bpe_encode_oracle())
def q_bpe_encode(spark: SparkSession, sf_dir: str):
    """BPE tokenizer APPLICATION — the other half of q_bpe_learn's
    learn/apply pair (Sennrich et al., arXiv:1508.07909): learn the
    3-merge table from the corpus, apply it, and emit each document's
    post-merge token count — the number a training-data pipeline packs
    sequences and prices compute by (q_pack_sequences consumes
    whitespace tokens; this is the subword count the tokenizer would
    actually produce).

    The apply step runs over the VOCABULARY, not the corpus: each
    distinct word is rewritten through the learned merges once
    (identical two-pass replace contract as q_bpe_learn — provably the
    greedy scan for a ≠ b merges), then per-word subword counts join
    back onto the per-doc word stream and sum. Work scales with
    |vocab| + |corpus tokens|, never |vocab|·|merges|·|corpus|.

    Scale: merge selection is a 1-row TakeOrdered broadcast per step
    (whitelisted scalar pattern); the word→count join is a broadcast
    of the vocab-sized relation (at 100 TB: still vocab-sized — the
    point of subword vocabularies is that |vocab| is fixed).
    """
    d = scatter(load_table(spark, sf_dir, "documents"))
    doc_words = d.select(
        "doc_id", F.explode(tokens(F.lower(F.col("text")))).alias("word")
    )
    vocab = doc_words.groupBy("word").agg(F.count(F.lit(1)).alias("weight"))
    cur = vocab.select(
        "word",
        F.concat(
            F.lit(" "), F.regexp_replace("word", "(.)", "$1 ")
        ).alias("s"),
        "weight",
    )
    for _ in range(_BPE_STEPS):
        syms = F.filter(F.split(F.col("s"), " "), lambda t: t != "")
        prs = F.when(
            F.size(syms) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(syms) - 1),
                lambda i: F.struct(
                    F.element_at(syms, i).alias("a"),
                    F.element_at(syms, i + F.lit(1)).alias("b"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
        top = (
            cur.select(F.explode(prs).alias("pr"), "weight")
            .select(
                F.col("pr.a").alias("a"), F.col("pr.b").alias("b"), "weight"
            )
            .filter(F.col("a") != F.col("b"))
            .groupBy("a", "b")
            .agg(F.sum("weight").alias("cnt"))
            .orderBy(F.desc("cnt"), F.asc("a"), F.asc("b"))
            .limit(1)
        )
        pat = F.concat(
            F.lit(" "), F.col("_ma"), F.lit(" "), F.col("_mb"), F.lit(" ")
        )
        rep = F.concat(F.lit(" "), F.col("_ma"), F.col("_mb"), F.lit(" "))
        cur = cur.crossJoin(
            F.broadcast(
                top.select(F.col("a").alias("_ma"), F.col("b").alias("_mb"))
            )
        ).select(
            "word",
            F.replace(F.replace(F.col("s"), pat, rep), pat, rep).alias("s"),
            "weight",
        )
    wtok = cur.select(
        "word",
        F.size(
            F.filter(F.split(F.col("s"), " "), lambda t: t != "")
        ).cast("long").alias("n_tok"),
    )
    return (
        doc_words.join(F.broadcast(wtok), "word")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


# ----------------------------------------------------------- DSIR

_DSIR_B = 128  # hashed-unigram feature buckets


@query(
    "q_dsir_weights",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang = 'en' AS is_t,
               unnest({_DUCK_TOKS}) AS token
        FROM documents
    ),
    hb AS (
        SELECT doc_id, is_t,
               ('0x' || substr(md5(token), 1, 7))::BIGINT % {_DSIR_B} AS b
        FROM tok
    ),
    bc AS (
        SELECT b, count(*) AS cr,
               sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct
        FROM hb GROUP BY b
    ),
    tot AS (
        SELECT CAST(sum(cr) AS BIGINT) AS r, CAST(sum(ct) AS BIGINT) AS t
        FROM bc
    ),
    w AS (
        SELECT b,
               CAST(round(ln(CAST((ct + 1) * (r + {_DSIR_B}) AS DOUBLE)
                             / CAST((cr + 1) * (t + {_DSIR_B}) AS DOUBLE))
                          * 1e6, 0) AS BIGINT) AS w_micro
        FROM bc CROSS JOIN tot
    ),
    db AS (
        SELECT doc_id, b, count(*) AS c FROM hb GROUP BY doc_id, b
    )
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tok,
           CAST(sum(c * w_micro) AS BIGINT) AS weight_micro,
           CAST(sum(c * w_micro) AS DOUBLE) / 1e6 AS weight
    FROM db JOIN w USING (b)
    GROUP BY doc_id
    """,
)
def q_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, arXiv:2302.03169): score every raw document by how much its
    hashed-unigram profile looks like the TARGET domain (here lang
    'en'), weight = sum over tokens of ln(p_target(b)/p_raw(b)) with
    Laplace-smoothed bucket distributions over B=128 hashed features.
    Resampling raw data by these weights is the published recipe for
    target-matched pretraining corpora.

    Determinism: each bucket's log-ratio argument is ONE division of
    two exactly-derived integers ((ct+1)(R+B) / (cr+1)(T+B), products
    in DECIMAL/HUGEINT so no overflow at any corpus size); the
    per-bucket contribution is then frozen onto an integer micro-unit
    grid (round(ln·1e6), the q_retrieval_metrics trick), so each
    document's weight is an ORDER-INDEPENDENT integer sum — no float
    accumulation across tokens — and the emitted double is one final
    division by the 1e6 literal.

    Scale: token explode → ONE hash aggregate to the B-row bucket
    relation; the ≤B-row weight table joins back BROADCAST onto the
    per-doc bucket counts (one map-side-combined aggregate keyed
    (doc, bucket)). The corpus is never self-joined; importance
    estimation is O(tokens) + O(B).
    """
    from ..functions.keys import stable_id_hash

    tok = (
        _t(spark, sf_dir, "documents")
        .select(
            "doc_id",
            (F.col("lang") == "en").alias("is_t"),
            F.explode(tokens(F.lower(F.col("text")))).alias("token"),
        )
        .select(
            "doc_id",
            "is_t",
            (stable_id_hash(F.col("token")) % _DSIR_B).alias("b"),
        )
    )
    bc = tok.groupBy("b").agg(
        F.count(F.lit(1)).alias("cr"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
    )
    tot = bc.agg(F.sum("cr").alias("r"), F.sum("ct").alias("t"))
    dec = "decimal(38,0)"
    w = bc.crossJoin(F.broadcast(tot)).select(
        "b",
        F.round(
            F.log(
                (
                    (F.col("ct") + 1).cast(dec)
                    * (F.col("r") + _DSIR_B).cast(dec)
                ).cast("double")
                / (
                    (F.col("cr") + 1).cast(dec)
                    * (F.col("t") + _DSIR_B).cast(dec)
                ).cast("double")
            )
            * 1e6,
            0,
        )
        .cast("long")
        .alias("w_micro"),
    )
    db = tok.groupBy("doc_id", "b").agg(F.count(F.lit(1)).alias("c"))
    return (
        db.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tok"),
            F.sum(F.col("c") * F.col("w_micro")).alias("weight_micro"),
        )
        .withColumn(
            "weight", F.col("weight_micro").cast("double") / F.lit(1e6)
        )
    )


# --------------------------------------------- length-bucketed batching

_LB_WIDTH = 32  # tokens per bucket step


@query(
    "q_length_buckets",
    oracle=f"""
    WITH n AS (
        SELECT doc_id,
               CAST(len({_DUCK_TOKS}) AS BIGINT) AS n_toks
        FROM documents
    ),
    b AS (
        SELECT n_toks // {_LB_WIDTH} AS bucket,
               (n_toks // {_LB_WIDTH} + 1) * {_LB_WIDTH} AS cap,
               n_toks
        FROM n
    )
    SELECT bucket, cap,
           count(*) AS n_docs,
           CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
           CAST(count(*) * cap - sum(n_toks) AS BIGINT) AS pad_tokens,
           round(CAST(count(*) * cap - sum(n_toks) AS DOUBLE)
                 / (count(*) * cap), 6) AS pad_frac
    FROM b GROUP BY bucket, cap
    """,
)
def q_length_buckets(spark, sf_dir):
    """Length-bucketed batching audit — the inference/training-batch
    counterpart of q_pack_sequences: group documents into fixed-width
    token-length buckets (width 32) and measure the padding a
    bucket-cap batcher would spend, per bucket. pad_frac is the number
    a serving team tunes bucket width against (uniform batching pads
    to the global max; bucketing to the local cap — this query
    quantifies the win). Integer token counts, integer waste, ONE
    division rounded at 6 — the house exactness style.

    Scale: token counting is the map side; one hash aggregate keyed by
    bucket (≤ max_len/32 groups). No windows, no joins."""
    d = _t(spark, sf_dir, "documents").withColumn(
        "n_toks", F.size(tokens(F.lower(F.col("text")))).cast("long")
    )
    b = d.select(
        F.floor(F.col("n_toks") / _LB_WIDTH).cast("long").alias("bucket"),
        F.col("n_toks"),
    ).withColumn("cap", (F.col("bucket") + 1) * _LB_WIDTH)
    g = b.groupBy("bucket", "cap").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").alias("sum_tokens"),
    )
    pad = F.col("n_docs") * F.col("cap") - F.col("sum_tokens")
    return g.select(
        "bucket",
        "cap",
        "n_docs",
        "sum_tokens",
        pad.alias("pad_tokens"),
        F.round(
            pad.cast("double") / (F.col("n_docs") * F.col("cap")), 6
        ).alias("pad_frac"),
    )


# ------------------------------------- exact-substring dup-span removal

_DSR_W = 5  # tokens per duplicated window


@query(
    "q_dup_span_removal",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, {_DUCK_TOKS} AS toks FROM documents
    ),
    nt AS (
        SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks, toks FROM d
    ),
    win AS (
        SELECT doc_id, i AS p,
               md5(array_to_string(
                   list_slice(toks, i + 1, i + {_DSR_W}), ' ')) AS wh
        FROM nt, unnest(range(0, greatest(n_toks - {_DSR_W} + 1, 0))) u(i)
    ),
    freq AS (
        SELECT wh FROM win GROUP BY wh HAVING count(*) >= 2
    ),
    dup AS (
        SELECT w.doc_id, w.p, w.p + {_DSR_W} - 1 AS e
        FROM win w JOIN freq USING (wh)
    ),
    flagged AS (
        SELECT doc_id, p, e,
               max(e) OVER (PARTITION BY doc_id ORDER BY p
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING) AS prev_end
        FROM dup
    ),
    spans AS (
        SELECT doc_id, p, e,
               sum(CASE WHEN prev_end IS NULL OR p > prev_end
                   THEN 1 ELSE 0 END)
                 OVER (PARTITION BY doc_id ORDER BY p
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS span_id
        FROM flagged
    ),
    merged AS (
        SELECT doc_id, span_id,
               min(p) AS s, max(e) AS t
        FROM spans GROUP BY doc_id, span_id
    ),
    per_doc AS (
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_spans,
               CAST(sum(t - s + 1) AS BIGINT) AS tokens_removed
        FROM merged GROUP BY doc_id
    )
    SELECT nt.doc_id, nt.n_toks,
           coalesce(p.n_spans, 0) AS n_spans,
           coalesce(p.tokens_removed, 0) AS tokens_removed,
           CASE WHEN nt.n_toks = 0 THEN NULL
                ELSE round(1.0 - CAST(coalesce(p.tokens_removed, 0) AS DOUBLE)
                           / nt.n_toks, 6) END AS keep_frac
    FROM nt LEFT JOIN per_doc p USING (doc_id)
    """,
)
def q_dup_span_removal(spark, sf_dir):
    """Exact-substring dup-span REMOVAL plan (Lee et al. 2021,
    arXiv:2107.06499 §4.1 ExactSubstr): find every _DSR_W(=5)-token
    window occurring ≥2 times in the corpus, merge each document's
    overlapping duplicated windows into maximal spans (the
    gaps-and-islands interval merge: running cummax of span ends, new
    span when the next start clears it), and account the edit — spans
    to cut, tokens removed, kept fraction per document. Where
    q_dup_span_fraction measures HOW duplicated a doc is, this emits
    the positional REMOVAL plan the dedup pass would execute — the
    relational form of their suffix-array dup-range scan.

    Scale: windows explode ~n_tokens rows (hashed to 32 hex chars, so
    the shuffle carries digests, not text); duplicate detection is one
    hash aggregate keyed by window hash; the interval merge is
    windows PARTITIONED BY doc (no global sort, no funnel); join-backs
    are keyed shuffles with map-side combine. The window-hash
    dictionary is the skew point — the q_minhash_lsh hot-band cap
    applies if one boilerplate window's posting list outgrows a
    partition."""
    from ..operators.textdedup import dup_span_stats

    d = _t(spark, sf_dir, "documents").select(
        "doc_id", tokens(F.lower(F.col("text"))).alias("toks")
    )
    return dup_span_stats(d, w=_DSR_W)
