"""EXT — corpus curation operators for training-data pipelines.

Deterministic dataset splitting, stratified sampling, and document
chunking — the steps between "scored corpus" and "training shards".
All pure Column expressions (whole-stage codegen, no shuffle except
where noted), and all reproducible across engines: the split hash is a
multiplicative hash over bounded integers, not an engine-private
function, so the same row lands in the same split in any system that
can multiply (the property a multi-engine data platform actually
needs — Spark writes the shards, some other system audits them).

At 100 TB these are narrow per-row maps: no shuffle at all for
split/sample (the filter pushes to the scan), one explode fan-out for
chunking (rows grow ~n_chars/stride ×, size the output partitioning
with `spark.sql.files.maxRecordsPerFile` when writing shards).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Knuth multiplicative constant (2^32 * golden ratio) — public domain.
_MULT = 2654435761
#: modulus keeping doc_id % _PRIME * _MULT < 2^52, exact in int64 and
#: in engines that promote to double.
_PRIME = 1000003


def split_bucket(key: Column) -> Column:
    """Deterministic bucket in [0, 1000) from an integer key.

    ``((key mod 1000003) * 2654435761) mod 1000`` — engine-portable
    (no murmur3/xxhash dependency), overflow-free in int64, and
    uniform enough for split assignment (asserted in pytest).
    """
    return ((key % _PRIME) * F.lit(_MULT)) % 1000


def dataset_split(
    docs: DataFrame,
    key: str = "doc_id",
    train_per_mille: int = 900,
    val_per_mille: int = 950,
) -> DataFrame:
    """Assign every document to train/validation/test by hash bucket.

    The assignment is a pure function of the key: adding or removing
    other rows never reshuffles existing assignments (critical for
    incremental corpus builds — a re-run after appending new shards
    must not leak yesterday's training docs into today's test set).
    """
    b = split_bucket(F.col(key))
    return docs.select(
        key,
        "lang",
        b.alias("bucket"),
        F.when(b < train_per_mille, F.lit("train"))
        .when(b < val_per_mille, F.lit("validation"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def stratified_sample(
    docs: DataFrame, key: str = "doc_id", per_mille: int = 100
) -> DataFrame:
    """Deterministic ~N‰ sample: the bucket filter composes with the
    split (a sample of the train split = two filters on one scan).
    Unlike ``df.sample()``, re-runs and other engines agree exactly."""
    return docs.select(
        key, "lang", "source", "n_chars", split_bucket(F.col(key)).alias("bucket")
    ).filter(F.col("bucket") < per_mille)


def doc_chunks(
    docs: DataFrame, chunk_size: int = 120, stride: int = 90
) -> DataFrame:
    """Split each document into fixed-size character chunks with
    overlap (context-window packing). Chunk *i* covers 1-based char
    positions ``[i*stride + 1, i*stride + chunk_size]``; the last
    chunk may be short; every char is covered (stride <= chunk_size).

    One explode pass, no shuffle; the sequence length is computed
    from ``n_chars`` so the generator never materializes positions
    past the end of the document.
    """
    if stride > chunk_size:
        raise ValueError("stride > chunk_size would drop characters")
    # Guard zero/NULL-length docs: floor((0-1)/stride) is -1 and
    # Spark's sequence(0, -1) COUNTS DOWN, yielding two phantom chunks
    # (ids 0 and -1) per empty doc. A zero-char doc gets exactly ONE
    # empty chunk (id 0 — the doc stays present downstream, matching
    # the oracle's truncating (0-1)//stride + 1 = 1); NULL n_chars
    # propagates NULL and explode drops the doc
    n_chunks_minus1 = F.when(
        F.col("n_chars") > 0, F.floor((F.col("n_chars") - 1) / stride)
    ).otherwise(F.when(F.col("n_chars") == 0, F.lit(0)))
    chunk_id = F.explode(F.sequence(F.lit(0), n_chunks_minus1)).alias("chunk_id")
    out = docs.select("doc_id", F.col("text"), chunk_id)
    chunk = F.col("text").substr(
        (F.col("chunk_id") * stride + 1).cast("int"), F.lit(chunk_size)
    )
    return out.select(
        "doc_id",
        "chunk_id",
        chunk.alias("chunk_text"),
        F.length(chunk).cast("long").alias("chunk_len"),
    )
