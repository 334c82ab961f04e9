"""E4 — multimodal columns.

Images/audio/video ride through the engine as opaque ``binary`` columns
with a typed metadata struct; per-item decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` passes.
The media codec libraries are NOT in this container, so the decode body
is stubbed (deterministic fake or NotImplementedError) — the Spark-side
plumbing (schema, batch iteration, partitioning) is real and tested.

At 100 TB: binary payloads dominate size → keep them out of shuffles
(derive features first, shuffle the narrow feature columns), size
``spark.sql.files.maxPartitionBytes`` to the payload scale, and store
media in parquet binary columns co-located with their metadata.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("sha256", StringType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("n_frames", LongType()),
    ]
)


def attach_media(docs: DataFrame) -> DataFrame:
    """documents → media rows: utf-8 payload bytes standing in for real
    media blobs, with typed metadata derived IN the engine (byte length,
    content hash, mime by source facet). All native expressions."""
    payload = F.encode(F.col("text"), "utf-8")
    return docs.select(
        "doc_id",
        payload.alias("payload"),
        F.concat(F.lit("application/x-fixture-"), F.col("source")).alias("mime"),
        F.octet_length(F.col("text")).cast("long").alias("n_bytes"),
        F.sha2(F.col("text"), 256).alias("sha256"),
    )


def decode_media(media: DataFrame, fake: bool = False) -> DataFrame:
    """Decode pass over binary payloads via Arrow-batched mapInPandas.

    ``fake=True`` runs a deterministic stand-in decoder (dimensions
    derived from payload length) so the batch plumbing is testable here;
    ``fake=False`` raises NotImplementedError where a real deployment
    would call PIL/ffmpeg on each payload.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media codecs not available in this container; "
                    "plug PIL/ffmpeg here in a real deployment"
                )
            yield _decode_chunk(pdf)

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


def _decode_chunk(pdf: pd.DataFrame) -> pd.DataFrame:
    """The fake-decoder kernel for ONE Arrow chunk — module-level and
    PURE PER ROW (no cross-row state), so the chunk/order-invariance
    property (tests/test_property.py) can drive it directly across
    adversarial chunk splits, the same way the quality monitor's
    kernel is pinned. NULL payloads (a failed upstream fetch/extract —
    routine at corpus scale) decode to NULL metadata, exactly what
    len()/NULL arithmetic yields SQL-side; nullable Int64 keeps pd.NA
    through the % math and Arrow maps it to NULL."""
    n = pdf["payload"].map(len, na_action="ignore").astype("Int64")
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "mime": pdf["mime"],
            "width": (n % 640) + 1,
            "height": (n % 480) + 1,
            "n_frames": (n % 24) + 1,
        }
    )


def sample_frames(decoded: DataFrame, every_nth: int = 4) -> DataFrame:
    """Frame sampling on decoded metadata: expand n_frames into sampled
    frame indices (sequence + filter — no UDF; the heavy per-frame
    pixel work would live in a further mapInPandas pass)."""
    return decoded.select(
        "doc_id",
        F.explode(
            F.filter(
                F.sequence(F.lit(0), F.col("n_frames") - 1),
                lambda i: i % every_nth == 0,
            )
        ).alias("frame_idx"),
    )


def resize_media(decoded: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Resize planning pass: aspect-preserving target dimensions from
    decoded metadata — pure codegen expressions (the pixel resample
    itself belongs in the same mapInPandas slot as the decoder). Scale
    is min(max_w/w, max_h/h) capped at 1 (never upscale); target dims
    round down but never below 1."""
    scale = F.least(
        F.lit(float(max_w)) / F.col("width"),
        F.lit(float(max_h)) / F.col("height"),
        F.lit(1.0),
    )
    return decoded.select(
        "doc_id",
        "width",
        "height",
        F.greatest(F.floor(F.col("width") * scale), F.lit(1))
        .cast("long")
        .alias("out_width"),
        F.greatest(F.floor(F.col("height") * scale), F.lit(1))
        .cast("long")
        .alias("out_height"),
    )


FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_features(media: DataFrame, n_bins: int = 16) -> DataFrame:
    """Per-payload feature extraction that runs FOR REAL in this
    container: a normalized byte-value histogram (n_bins buckets) per
    binary payload via Arrow-batched mapInPandas — the same signature a
    CLIP/encoder embedding pass would have, producing array<double>
    ready for the similarity operators. Vectorized with numpy over the
    whole batch (no per-row Python loop)."""
    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _feats_chunk(pdf, n_bins)

    return media.mapInPandas(feats, schema=FEATURE_SCHEMA)


def _feats_chunk(pdf: pd.DataFrame, n_bins: int) -> pd.DataFrame:
    """The byte-histogram kernel for ONE Arrow chunk — module-level and
    PURE PER ROW so the chunk/order-invariance property can drive it
    directly (see _decode_chunk)."""
    import numpy as np

    rows = []
    for payload in pdf["payload"]:
        if payload is None:
            # failed upstream fetch/extract: no bytes, no
            # histogram — NULL features, same as the SQL twin's
            # NULL arithmetic (not a zero-vector, which would
            # claim "measured all-zero content")
            rows.append(None)
            continue
        arr = np.frombuffer(payload, dtype=np.uint8)
        shift = 8 - (n_bins - 1).bit_length()  # 16 bins → top 4 bits
        hist = np.bincount(arr >> shift, minlength=n_bins)[:n_bins]
        total = max(len(arr), 1)
        # Half-UP rounding (floor(x*1e6 + 0.5)), not np.round's
        # banker's: c/total ties at the 7th decimal exactly when
        # total divides 2·10⁶ oddly (e.g. 128-byte payloads →
        # …0625 fractions), and SQL engines round those half
        # AWAY — half-up keeps the kernel oracle-portable.
        feats_ = np.floor(hist / total * 1e6 + 0.5) / 1e6
        rows.append(feats_.tolist())
    return pd.DataFrame({"doc_id": pdf["doc_id"], "features": rows})
