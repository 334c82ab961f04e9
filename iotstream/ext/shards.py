"""Training-shard writer — the materialization stage of the curation
pipeline: split-partitioned, size-capped, deterministically ordered
parquet shards that a training loader can consume directly.

Scale design: `partitionBy(split)` gives one directory per split;
`repartition(n, key)` sizes the files-per-split independently of the
upstream partitioning; `sortWithinPartitions(key)` makes every shard's
content deterministic (same input → byte-identical shards, so reruns
are diffable and resumable); `maxRecordsPerFile` caps shard size
without an extra shuffle. No collect, no driver-side loop — at 100 TB
this is exactly one shuffle wide.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_training_shards(
    df: DataFrame,
    path: str,
    split_col: str = "split",
    order_col: str = "doc_id",
    files_per_split: int = 4,
    max_records_per_file: int = 100_000,
) -> None:
    """Write ``df`` as ``path/<split_col>=<value>/part-*.parquet``."""
    (
        df.repartition(files_per_split, order_col)
        .sortWithinPartitions(split_col, order_col)
        .write.partitionBy(split_col)
        .option("maxRecordsPerFile", max_records_per_file)
        .mode("overwrite")
        .parquet(path)
    )


def read_training_split(
    spark: SparkSession, path: str, split: str, split_col: str = "split"
) -> DataFrame:
    """Read one split back; the partition filter prunes directories at
    planning time (no scan of the other splits)."""
    return spark.read.parquet(path).filter(f"{split_col} = '{split}'")


def compact_parquet(
    spark: SparkSession, path: str, target_files: int = 8
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ``target_files`` files. The changelog-style sinks (upsert, session
    overwrite) and any long-running streaming job accrete small files;
    this is the OPTIMIZE-style maintenance pass the 100 TB deployment
    schedules on them.

    Safe rewrite: materialize into a sibling temp dir, then swap —
    readers never observe a half-written directory, and the source is
    fully read before anything is deleted (no read-overwrite cycle on
    the same path). Returns the number of rows compacted.
    """
    import os
    import shutil
    import tempfile

    df = spark.read.parquet(path)
    tmp = tempfile.mkdtemp(
        prefix=".compact-", dir=os.path.dirname(os.path.abspath(path))
    )
    out = os.path.join(tmp, "data")
    df.coalesce(target_files).write.mode("overwrite").parquet(out)
    n = spark.read.parquet(out).count()
    old = path.rstrip("/") + ".old"
    os.rename(path, old)
    os.rename(out, path)
    shutil.rmtree(old, ignore_errors=True)
    shutil.rmtree(tmp, ignore_errors=True)
    return n


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str] | None = None,
    n_files: int = 8,
) -> None:
    """Cluster-by-key layout: ``repartitionByRange`` + ``sortWithin
    Partitions`` on the cluster columns before writing parquet.

    Why it matters at 100 TB: parquet stores per-row-group min/max
    statistics; once rows are range-clustered, a key-range predicate
    matches only a handful of files AND row groups, so the reader
    skips almost everything (the poor man's Z-order — exact for
    1-D / prefix predicates). Without clustering every file spans the
    whole key range and nothing can be skipped. One range shuffle
    (sampled boundaries, skew-resistant) — same cost class as any
    write-side repartition."""
    cols = cluster_cols or ["id", "ts"]
    (
        df.repartitionByRange(n_files, *cols)
        .sortWithinPartitions(*cols)
        .write.mode("overwrite")
        .parquet(path)
    )


def clustered_file_ranges(path: str, col: str) -> list[tuple]:
    """Per-file (min, max) of ``col`` from parquet row-group footers —
    the statistics the scan's skipping logic consumes; used by tests
    to prove the clustered layout is actually disjoint."""
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        lo, hi = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    lo = s.min if lo is None else min(lo, s.min)
                    hi = s.max if hi is None else max(hi, s.max)
        out.append((lo, hi))
    return out
