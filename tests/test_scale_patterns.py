"""Scale patterns: salted skew join equivalence; bucketed co-located
join eliminating the shuffle entirely (the 100 TB join strategy)."""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

from iotstream.ext.skew import key_histogram, salted_join


@pytest.fixture
def skewed(spark):
    # 90% of fact rows share key 0 — the classic straggler shape.
    fact = spark.range(10_000).select(
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 100)
        .alias("k"),
        F.col("id").alias("fact_id"),
    )
    dim = spark.range(100).select(
        F.col("id").alias("k"), F.concat(F.lit("d"), F.col("id")).alias("label")
    )
    return fact, dim


def _counts(df):
    return {
        (r.k, r.label): r.n
        for r in df.groupBy("k", "label").agg(F.count(F.lit(1)).alias("n")).collect()
    }


def test_salted_join_matches_plain_join(skewed):
    fact, dim = skewed
    plain = _counts(fact.join(dim, "k"))
    assert _counts(salted_join(fact, dim, "k", buckets=8)) == plain
    assert _counts(salted_join(fact, dim, "k", buckets=8, hot_keys=[0])) == plain


def test_salted_join_spreads_hot_key(spark, skewed):
    fact, dim = skewed
    f = fact.withColumn("__salt", F.floor(F.rand(seed=42) * 8).cast("int"))
    n_salts = (
        f.filter(F.col("k") == 0).select("__salt").distinct().count()
    )
    assert n_salts == 8  # the hot key now occupies 8 shuffle buckets


def test_key_histogram_flags_hot_key(skewed):
    fact, _ = skewed
    top = key_histogram(fact, "k", top=1).collect()[0]
    assert top.k == 0 and top.share > 0.8


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    """Pre-bucketing both sides on the join key co-locates matching
    rows at WRITE time; the join plan then contains no Exchange — the
    shuffle has been amortized into the layout. This is the strategy
    for repeated 100 TB fact-fact joins."""
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bdemo LOCATION '{tmp_path}/wh'")
    left = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("a")
    )
    right = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("b")
    )
    for name, df in [("lhs", left), ("rhs", right)]:
        df.write.bucketBy(8, "k").sortBy("k").mode("overwrite").saveAsTable(
            f"bdemo.{name}"
        )
    # Disable auto-broadcast: at toy size the planner would broadcast
    # and skip the bucketed scan; at real fact-fact scale broadcast is
    # off the table and bucketing is exactly what kills the shuffle.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bdemo.lhs").join(spark.table("bdemo.rhs"), "k")
        assert joined.count() == 1000

        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    spark.sql("DROP TABLE bdemo.lhs")
    spark.sql("DROP TABLE bdemo.rhs")
