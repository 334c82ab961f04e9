"""E4/E5 — text analysis and multimodal column plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from iotstream.ext.multimodal import attach_media, decode_media, sample_frames
from iotstream.ext.text import quality_score, token_stats, word_counts
from iotstream.schemas import load_table
from tests.conftest import SF_DIR


def test_word_counts_sum_to_total_tokens(spark):
    docs = load_table(spark, SF_DIR, "documents")
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).first()["n"]
    counted = word_counts(docs).agg(F.sum("cnt")).first()[0]
    assert counted == total_tokens


def test_token_stats_consistent_with_n_chars(spark):
    docs = load_table(spark, SF_DIR, "documents")
    bad = token_stats(docs).filter(
        (F.col("n_tokens") <= 0) | (F.col("avg_token_len") <= 0)
    )
    assert bad.count() == 0


def test_quality_score_bounded(spark):
    docs = load_table(spark, SF_DIR, "documents")
    qs = quality_score(docs)
    assert qs.filter((F.col("quality") < 0) | (F.col("quality") > 1)).count() == 0


def test_media_metadata_matches_payload(spark):
    docs = load_table(spark, SF_DIR, "documents")
    media = attach_media(docs)
    # ascii fixture text → byte length equals n_chars
    joined = media.join(docs, "doc_id").filter(
        F.col("n_bytes") != F.col("n_chars")
    )
    assert joined.count() == 0
    assert media.filter(F.length("sha256") != 64).count() == 0


def test_decode_fake_plumbing(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(50)
    decoded = decode_media(attach_media(docs), fake=True)
    rows = decoded.collect()
    assert len(rows) == 50
    assert all(1 <= r.width <= 640 and 1 <= r.height <= 480 for r in rows)
    frames = sample_frames(decoded, every_nth=4)
    nf = {r.doc_id: r.n_frames for r in rows}
    sampled = frames.collect()
    assert sampled
    # exactly every 4th index, within each doc's decoded frame range
    assert all(r.frame_idx % 4 == 0 and 0 <= r.frame_idx < nf[r.doc_id]
               for r in sampled)
    per_doc = {d: 0 for d in nf}
    for r in sampled:
        per_doc[r.doc_id] += 1
    assert all(per_doc[d] == (nf[d] + 3) // 4 for d in nf)


def test_decode_real_path_is_explicit_stub(spark):
    docs = load_table(spark, SF_DIR, "documents").limit(5)
    with pytest.raises(Exception, match="NotImplementedError|not available"):
        decode_media(attach_media(docs), fake=False).collect()


def test_extract_features_matches_numpy_reference(spark):
    import numpy as np

    from iotstream.ext.multimodal import attach_media, extract_features
    from iotstream.schemas import load_table
    from tests.conftest import SF_DIR

    docs = load_table(spark, SF_DIR, "documents").limit(50)
    got = {
        r["doc_id"]: r["features"]
        for r in extract_features(attach_media(docs)).collect()
    }
    for r in docs.select("doc_id", "text").collect():
        arr = np.frombuffer(r["text"].encode(), dtype=np.uint8)
        hist = np.bincount(arr >> 4, minlength=16)[:16]
        # half-up at the 6th decimal, matching the kernel's
        # oracle-portable rounding (see extract_features)
        want = (np.floor(hist / max(len(arr), 1) * 1e6 + 0.5) / 1e6).tolist()
        assert got[r["doc_id"]] == want
    assert all(len(v) == 16 for v in got.values())
    assert all(abs(sum(v) - 1.0) < 1e-4 for v in got.values())


def test_resize_media_never_upscales_and_preserves_aspect(spark):
    from iotstream.ext.multimodal import resize_media

    d = spark.createDataFrame(
        [(1, 640, 480), (2, 100, 50), (3, 448, 112)],
        "doc_id long, width long, height long",
    )
    out = {r["doc_id"]: (r["out_width"], r["out_height"]) for r in resize_media(d).collect()}
    assert out[1] == (224, 168)   # scale 0.35 on both axes
    assert out[2] == (100, 50)    # smaller than target → untouched
    assert out[3] == (224, 56)    # width-bound scale 0.5
