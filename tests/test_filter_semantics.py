"""F2 validity-filter semantics (reference StreamProcessor.java:61-78)
and the lenient-parse normalization (SURVEY.md §7.4 risk 3)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from iotstream.generator import synthetic_sensor_events
from iotstream.operators.filters import validity_filter
from iotstream.operators.parse import parse_sensor_json


def _mk(spark, rows):
    return spark.createDataFrame(
        [Row(id="s", messageId="m", timestamp="1", metrics=Row(temperature=t, humidity=h)) for t, h in rows]
    )


def test_drops_exactly_the_injected_ten_percent(spark):
    """mqttgen's 1/9/90 mix: every 10th row (incl. every 100th) is
    invalid → the filter keeps exactly 90%."""
    gen = synthetic_sensor_events(spark, 1000)
    assert gen.count() == 1000
    assert validity_filter(gen).count() == 900


def test_boundary_cases(spark):
    cases = {
        (0, 0): False,     # empty reading
        (50, 80): True,    # boundary temp, valid via humidity disjunct
        (50, 100): False,  # both at/over limits
        (60, 80): True,    # the load-bearing OR: only temp out of range
        (49, 130): True,   # only humidity out of range
        (49, 99): True,
        (0, 1): True,      # not both zero
    }
    df = _mk(spark, list(cases))
    kept = {
        (r.metrics.temperature, r.metrics.humidity)
        for r in validity_filter(df).collect()
    }
    for th, expect in cases.items():
        assert (th in kept) == expect, th


def test_missing_metrics_normalizes_to_zero_and_drops(spark):
    """A payload without metrics → Gson gives (0,0) → empty-reading
    branch drops it. from_json gives null; coalesce restores (0,0)."""
    payloads = spark.createDataFrame(
        [
            Row(value='{"id":"a","messageId":"m1","timestamp":"1"}'),
            Row(value='{"id":"b","messageId":"m2","timestamp":"2","metrics":{}}'),
            Row(value='{"id":"c","messageId":"m3","timestamp":"3","metrics":{"temperature":20,"humidity":60}}'),
        ]
    )
    parsed = parse_sensor_json(payloads)
    vals = {r.id: (r.metrics.temperature, r.metrics.humidity) for r in parsed.collect()}
    assert vals == {"a": (0, 0), "b": (0, 0), "c": (20, 60)}
    assert [r.id for r in validity_filter(parsed).collect()] == ["c"]


def test_filter_works_identically_via_sql(spark):
    """VALID_SQL (the oracle-side predicate) equals the Column form."""
    from iotstream.operators.filters import VALID_SQL

    gen = synthetic_sensor_events(spark, 500).select(
        "loop",
        F.col("metrics.temperature").alias("temperature"),
        F.col("metrics.humidity").alias("humidity"),
    )
    via_sql = gen.filter(VALID_SQL).count()
    via_col = validity_filter(
        synthetic_sensor_events(spark, 500)
    ).count()
    assert via_sql == via_col
