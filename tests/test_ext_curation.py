"""Curation operators: split stability, chunk coverage, sample
determinism — the invariants a training-data pipeline actually relies
on (not just value parity, which the oracle gate already checks)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iotstream.ext.curation import dataset_split, doc_chunks, stratified_sample
from iotstream.schemas import load_table
from tests.conftest import SF_DIR


def _docs(spark):
    return load_table(spark, SF_DIR, "documents")


def test_split_proportions_and_exhaustive(spark):
    out = dataset_split(_docs(spark)).groupBy("split").count()
    by = {r["split"]: r["count"] for r in out.collect()}
    total = sum(by.values())
    assert set(by) == {"train", "validation", "test"}
    # 90/5/5 within a tolerance appropriate for 500 docs
    assert 0.85 <= by["train"] / total <= 0.95
    assert by["validation"] / total <= 0.10
    assert by["test"] / total <= 0.10


def test_split_stable_under_corpus_growth(spark):
    """The property that justifies hash-splitting: restricting the
    corpus must not change any surviving row's assignment."""
    full = dataset_split(_docs(spark))
    subset = dataset_split(_docs(spark).filter(F.col("doc_id") % 3 == 0))
    joined = subset.alias("s").join(full.alias("f"), "doc_id").filter(
        F.col("s.split") != F.col("f.split")
    )
    assert joined.count() == 0


def test_sample_is_subset_of_split_buckets(spark):
    sample = stratified_sample(_docs(spark), per_mille=100)
    assert sample.filter(F.col("bucket") >= 100).count() == 0
    n = sample.count()
    total = _docs(spark).count()
    assert 0.05 <= n / total <= 0.15  # ~10%


def test_chunks_cover_text_exactly(spark):
    """Reassembling each doc from the non-overlapping prefix of every
    chunk (last chunk taken whole) must reproduce the original text."""
    # chunk 0 contributes whole; every later chunk contributes only its
    # chars past the 30-char overlap (substr(31, 90)) — a short final
    # chunk of <=30 chars contributes '' because the previous chunk's
    # tail already covered it.
    chunks = doc_chunks(_docs(spark), chunk_size=120, stride=90)
    pos = (
        chunks.select(
            "doc_id",
            "chunk_id",
            F.when(F.col("chunk_id") == 0, F.col("chunk_text"))
            .otherwise(F.col("chunk_text").substr(F.lit(31), F.lit(90)))
            .alias("piece"),
        )
        .groupBy("doc_id")
        .agg(
            F.concat_ws(
                "",
                F.array_sort(F.collect_list(F.struct("chunk_id", "piece")))
                .getField("piece"),
            ).alias("rebuilt")
        )
    )
    bad = (
        pos.join(_docs(spark), "doc_id")
        .filter(F.col("rebuilt") != F.col("text"))
        .count()
    )
    assert bad == 0


def test_chunk_bounds(spark):
    chunks = doc_chunks(_docs(spark))
    assert chunks.filter(F.col("chunk_len") > 120).count() == 0
    assert chunks.filter(F.col("chunk_len") <= 0).count() == 0
    # chunk count per doc matches the closed-form expectation
    per_doc = chunks.groupBy("doc_id").count()
    expect = _docs(spark).select(
        "doc_id", (F.floor((F.col("n_chars") - 1) / 90) + 1).alias("expected")
    )
    mismatch = per_doc.join(expect, "doc_id").filter(
        F.col("count") != F.col("expected")
    )
    assert mismatch.count() == 0
