"""Sketch accuracy: approx_count_distinct (HLL++) vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from iotstream.schemas import load_table
from tests.conftest import SF_DIR


def test_percentile_approx_close_to_exact(spark):
    ev = load_table(spark, SF_DIR, "events")
    # Rank-based check: percentile_approx returns an actual element (no
    # interpolation), so on a small group the right assertion is that
    # the approx value sits inside a +-2%-rank band of the exact
    # quantile, not that values agree numerically.
    lo = [0.48, 0.88, 0.97]
    hi = [0.52, 0.92, 1.0]
    rows = (
        ev.groupBy("event_type")
        .agg(
            F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("approx"),
            F.percentile("value", F.array(*[F.lit(p) for p in lo])).alias("lo"),
            F.percentile("value", F.array(*[F.lit(p) for p in hi])).alias("hi"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        for a, l, h in zip(r["approx"], r["lo"], r["hi"]):
            assert l <= a <= h, (r["event_type"], a, l, h)


def test_hll_within_tolerance_of_exact(spark):
    ev = load_table(spark, SF_DIR, "events")
    merged = (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id").alias("approx"),
            F.countDistinct("user_id").alias("exact"),
        )
        .collect()
    )
    assert len(merged) > 0
    for r in merged:
        assert abs(r["approx"] - r["exact"]) <= max(0.05 * r["exact"], 2), (
            r["event_type"],
            r["approx"],
            r["exact"],
        )
