"""Sketch accuracy: approx_count_distinct (HLL++) vs exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from iotstream.schemas import load_table
from tests.conftest import SF_DIR


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
