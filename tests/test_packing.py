"""Sequence-packing: two-level distributed prefix-sum correctness."""

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iotstream.ext.packing import sequence_pack


def _docs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id bigint, text string"
    )


def test_offsets_match_naive_global_cumsum(spark):
    texts = [" ".join(["w"] * ((7 * i) % 23 + 1)) for i in range(200)]
    docs = _docs(spark, texts)
    # deliberately small blocks so many block prefixes are exercised
    out = sequence_pack(docs, context_len=64, block_size=16)

    naive_w = Window.orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    naive = docs.select(
        "doc_id",
        F.coalesce(
            F.sum(F.size(F.split("text", " ")).cast("long")).over(naive_w),
            F.lit(0),
        ).alias("expect"),
    )
    mismatches = (
        out.join(naive, "doc_id")
        .filter(F.col("token_offset") != F.col("expect"))
        .count()
    )
    assert mismatches == 0


def test_spans_are_contiguous_and_chunks_consistent(spark):
    docs = _docs(spark, ["a b c", "d e", "f", "g h i j"])
    rows = sorted(sequence_pack(docs, context_len=4).collect(),
                  key=lambda r: r.doc_id)
    # contiguous concatenation: next offset = offset + n_tokens
    for prev, nxt in zip(rows, rows[1:]):
        assert nxt.token_offset == prev.token_offset + prev.n_tokens
    # tokens 0-2 → chunk 0; 3-4 → chunks 0-1; 5 → 1; 6-9 → 1-2
    assert [(r.chunk_first, r.chunk_last) for r in rows] == [
        (0, 0), (0, 1), (1, 1), (1, 2),
    ]
