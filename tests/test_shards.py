"""Shard writer: round-trip fidelity, split partitioning, size caps,
and deterministic output across reruns."""

from __future__ import annotations

import glob
import tempfile

from pyspark.sql import functions as F

from iotstream.ext.curation import dataset_split
from iotstream.ext.shards import read_training_split, write_training_shards
from iotstream.schemas import load_table
from tests.conftest import SF_DIR


def _splits(spark):
    docs = load_table(spark, SF_DIR, "documents")
    return dataset_split(docs).join(docs.select("doc_id", "text"), "doc_id")


def test_shards_roundtrip_and_partition_pruning(spark):
    df = _splits(spark)
    out = tempfile.mkdtemp(prefix="iotstream-shards-")
    write_training_shards(df, out, max_records_per_file=100)
    # directory-per-split layout
    dirs = {p.split("split=")[1] for p in glob.glob(f"{out}/split=*")}
    assert dirs == {"train", "validation", "test"}
    # every split reads back with exactly its assigned rows
    for split in dirs:
        expect = df.filter(F.col("split") == split).count()
        got = read_training_split(spark, out, split).count()
        assert got == expect, split
    # size cap respected
    for f in glob.glob(f"{out}/split=train/*.parquet"):
        n = spark.read.parquet(f).count()
        assert n <= 100, (f, n)


def test_shards_deterministic_across_reruns(spark):
    df = _splits(spark)
    a, b = (tempfile.mkdtemp(prefix="iotstream-shards-") for _ in range(2))
    write_training_shards(df, a)
    write_training_shards(df, b)
    fa = sorted(glob.glob(f"{a}/split=*/*.parquet"))
    fb = sorted(glob.glob(f"{b}/split=*/*.parquet"))
    assert len(fa) == len(fb) > 0
    for x, y in zip(fa, fb):
        da = [tuple(r) for r in spark.read.parquet(x).collect()]
        db = [tuple(r) for r in spark.read.parquet(y).collect()]
        assert da == db  # same rows, same order → deterministic shards


def test_compact_parquet_preserves_rows_and_reduces_files(spark):
    import glob as g
    import tempfile

    from iotstream.ext.shards import compact_parquet

    df = _splits(spark)
    out = tempfile.mkdtemp(prefix="iotstream-compact-") + "/t"
    # fragment: many small files
    df.repartition(40).write.parquet(out)
    before_files = len(g.glob(f"{out}/*.parquet"))
    before = [tuple(r) for r in spark.read.parquet(out).collect()]
    n = compact_parquet(spark, out, target_files=4)
    after_files = len(g.glob(f"{out}/*.parquet"))
    after = [tuple(r) for r in spark.read.parquet(out).collect()]
    assert n == len(before)
    assert sorted(before) == sorted(after)  # content identical
    assert after_files <= 4 < before_files
