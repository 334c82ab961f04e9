"""EXT — sequence packing for LLM pre-training shards.

GPT-style packing: the corpus is (logically) concatenated in a
deterministic document order and split into fixed-size context windows;
each document maps to its token-offset span and the chunk range it
lands in (documents may straddle chunk boundaries).

The core primitive is a GLOBAL exclusive prefix-sum of per-document
token counts. The naive formulation — ``sum(n) over (order by doc_id
rows unbounded preceding)`` with no partition key — funnels the whole
corpus through ONE task, which is exactly the plan that dies at 100 TB.
This implements the classic two-level distributed scan instead:

1. block-local exclusive cumsum (window partitioned by ``doc_id //
   block_size`` — parallel across blocks);
2. per-block totals (tiny: one row per block) get their own exclusive
   cumsum in a single-partition window — correct at any corpus size
   because the block table is ~corpus/block_size rows (recurse again if
   that is ever too big);
3. offset = block prefix + local cumsum, a broadcast-joined addition.

Result is bit-identical to the naive global window (the SQL oracle
computes it that way), with the corpus-sized stages fully parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from iotstream.ext.text import tokens


def sequence_pack(
    docs: DataFrame,
    context_len: int = 512,
    block_size: int = 64,
    col: str = "text",
) -> DataFrame:
    """Per document: global token offset (exclusive prefix-sum over
    doc_id order), and the first/last context-window chunk the
    document's tokens occupy. ``block_size`` trades block-table size
    against per-block parallelism; correctness is independent of it."""
    base = docs.select(
        "doc_id",
        F.size(tokens(col)).cast("long").alias("n_tokens"),
        (F.col("doc_id") / block_size).cast("long").alias("_blk"),
    )
    local_w = (
        Window.partitionBy("_blk")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = base.withColumn(
        "_local", F.coalesce(F.sum("n_tokens").over(local_w), F.lit(0))
    )
    totals = base.groupBy("_blk").agg(F.sum("n_tokens").alias("_tot"))
    blk_w = Window.orderBy("_blk").rowsBetween(Window.unboundedPreceding, -1)
    prefixes = totals.withColumn(
        "_prefix", F.coalesce(F.sum("_tot").over(blk_w), F.lit(0))
    ).select("_blk", "_prefix")
    offset = F.col("_prefix") + F.col("_local")
    return (
        local.join(F.broadcast(prefixes), "_blk")
        .select(
            "doc_id",
            "n_tokens",
            offset.alias("token_offset"),
            F.floor(offset / context_len).alias("chunk_first"),
            F.floor((offset + F.col("n_tokens") - 1) / context_len).alias(
                "chunk_last"
            ),
        )
    )
