"""Text-analysis column expressions (LLM-pipeline surface).

Language-ID, quality scoring, token counting, shingling — all as native
Catalyst expressions so they scale to 100 TB of documents. Patterns are
kept to the regex subset shared by Java regex (Spark) and RE2 (DuckDB)
so the oracle SQL can mirror them exactly.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# language heuristic. Deterministic and engine-portable.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "fr": ["le", "la", "et", "les", "des"],
    "es": ["el", "la", "de", "que", "los"],
    "de": ["der", "die", "und", "das", "ein"],
    "zh": ["de", "le", "shi", "zai", "you"],
}

STOPWORDS = ["the", "a", "an", "and", "or", "of", "to", "in", "is", "it"]


def tokens(text: Column) -> Column:
    """Whitespace tokenization → array<string> (drops empty tokens)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(text, r"[A-Za-z0-9\s]", "")
    return F.when(
        F.length(text) > 0, F.length(stripped).cast("double") / F.length(text)
    ).otherwise(F.lit(0.0))


def stopword_ratio(text: Column) -> Column:
    """Fraction of tokens that are common English stopwords."""
    toks = tokens(F.lower(text))
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return F.when(
        F.size(toks) > 0, hits.cast("double") / F.size(toks)
    ).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite document-quality heuristic in [0,1].

    0.4·length-band + 0.3·(1 − punct-ratio) + 0.3·stopword-band — a
    deterministic stand-in for model-based quality scoring.
    """
    n = F.length(text).cast("double")
    length_band = F.least(n / F.lit(500.0), F.lit(1.0))
    sw = stopword_ratio(text)
    sw_band = F.least(sw * F.lit(4.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_band
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(text))
        + F.lit(0.3) * sw_band
    )


def shingles_from_tokens(toks: Column, k: int = 3) -> Column:
    """k-word shingles from a token array.

    THE canonical shingle implementation — the oracle-checked dedup
    queries and this library share it, so the tokenization contract
    mirrored by the DuckDB oracle fragments lives in exactly one place.
    `toks` MUST be a materialized column (withColumn first), not an
    inline tokenization expression: Catalyst does not CSE inside
    higher-order-function lambdas, so inlining re-tokenizes per shingle
    (measured ~14×)."""
    n = F.size(toks)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(k)]),
        ),
    ).otherwise(F.array().cast("array<string>"))


def word_shingles(text: Column, k: int = 3) -> Column:
    """k-word shingles straight from text (convenience; see
    shingles_from_tokens for the CSE warning — prefer materializing the
    token column first on large corpora)."""
    return shingles_from_tokens(tokens(F.lower(text)), k)


def char_ngrams(text: Column, n: int = 3) -> Column:
    """Character n-grams of the lowercased text (for SimHash / lang-ID)."""
    t = F.lower(text)
    ln = F.length(t)
    return F.when(
        ln >= n,
        F.transform(
            F.sequence(F.lit(1), ln - F.lit(n - 1)),
            lambda i: t.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array())
