"""End-to-end corpus curation — the composed pipeline a training-data
team actually runs, as one declarative plan:

    score (quality) → exact-dedup (keep canonical) → decontaminate
    (eval blocklist) → split (train/val/test)

Each stage is an operator this engine already ships; the composition
stays a single Catalyst plan (no materialization between stages), so
filters from later stages can push into earlier scans where legal.

100 TB shape: one corpus-wide shuffle for the exact-dedup canonical
group-by; the blocklist anti-join is broadcast; quality scoring and
split assignment are narrow maps. Swap `dedup_exact` for the
MinHash/components pair when near-dup policy is required — the
composition shape is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iotstream.ext.curation import split_bucket
from iotstream.ext.text import quality_expr


def curate(
    docs: DataFrame,
    blocklist: DataFrame,
    min_quality: float = 0.1,
) -> DataFrame:
    """Return the curated corpus: one row per surviving doc with its
    split assignment and quality score. Survivors are canonical under
    exact dedup (min doc_id per text), not fingerprint-blocked, and at
    or above the quality floor."""
    from pyspark.sql import Window

    # ONE corpus scan: quality and split bucket are narrow expressions,
    # and "canonical under exact dedup" is a min-over-text window on the
    # same pass (same single shuffle as a groupBy, but no second scan
    # and no join back). At 100 TB the only other read is the blocklist.
    block = blocklist.select(F.col("fingerprint").alias("_fp")).distinct()
    b = split_bucket(F.col("doc_id"))
    canonical = F.min("doc_id").over(Window.partitionBy("text"))
    return (
        docs.select(
            "doc_id",
            "lang",
            "source",
            "text",
            quality_expr().alias("quality"),
            (canonical == F.col("doc_id")).alias("_canon"),
        )
        .filter(F.col("_canon"))
        .join(F.broadcast(block), F.md5("text") == F.col("_fp"), "left_anti")
        .filter(F.col("quality") >= min_quality)
        .select(
            "doc_id",
            "lang",
            "source",
            "quality",
            F.when(b < 900, F.lit("train"))
            .when(b < 950, F.lit("validation"))
            .otherwise(F.lit("test"))
            .alias("split"),
        )
    )
