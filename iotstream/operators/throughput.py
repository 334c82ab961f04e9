"""A4 — throughput count/rate.

The only metric the reference computes in code is the generator's
messages-per-second print: ``message / (stop - start)`` per thread
(reference iot-sensor/mqttgen.py:25,54-56). Engine equivalent: event
count over observed time span per key — integer arithmetic until the
final division so the result is bit-deterministic across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def throughput(df: DataFrame, key: str, ts_col: str = "ts") -> DataFrame:
    """Per-key event count and msgs/sec over the key's active span."""
    span = F.unix_timestamp(F.max(ts_col)) - F.unix_timestamp(F.min(ts_col))
    return df.groupBy(key).agg(
        F.count(F.lit(1)).alias("n_events"),
        span.alias("span_seconds"),
        F.round(
            F.count(F.lit(1)).cast("double")
            / F.greatest(span, F.lit(1)).cast("double"),
            6,
        ).alias("msgs_per_sec"),
    )
