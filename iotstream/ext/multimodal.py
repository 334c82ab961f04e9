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
    BinaryType,
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
            n = pdf["payload"].map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "width": (n % 640) + 1,
                    "height": (n % 480) + 1,
                    "n_frames": (n % 24) + 1,
                }
            )

    return media.mapInPandas(decode, schema=DECODED_SCHEMA)


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
