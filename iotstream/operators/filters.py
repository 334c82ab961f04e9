"""F2 — the validity filter, the reference's core predicate.

Reference semantics (src/main/java/stream/StreamProcessor.java:61-78):
drop iff ``(temperature == 0 AND humidity == 0)``  (empty reading)
      OR ``(temperature >= 50 AND humidity >= 100)``  (out of range);
equivalently KEEP iff ``NOT(t=0 AND h=0) AND (t < 50 OR h < 100)``.

The OR is load-bearing: a row with t=60, h=80 PASSES (only one metric
out of range). The generator's bad rows set both out of range at once
(mqttgen.py:41-42), so on generated data the filter drops exactly the
injected ~10%. Boundary: t=50 with h<=80 passes via the humidity
disjunct (t=50 is the max *valid* temperature per mqttgen.py:44).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Keep the exact boolean structure, SQL-renderable for the oracle too.
VALID_SQL = "NOT (temperature = 0 AND humidity = 0) AND (temperature < 50 OR humidity < 100)"


def is_valid(
    temperature: Column | None = None, humidity: Column | None = None
) -> Column:
    """The KEEP predicate as a Column (defaults to the nested metrics)."""
    t = temperature if temperature is not None else F.col("metrics.temperature")
    h = humidity if humidity is not None else F.col("metrics.humidity")
    return ~((t == 0) & (h == 0)) & ((t < 50) | (h < 100))


def validity_filter(df: DataFrame) -> DataFrame:
    """Apply F2. A plain Catalyst filter → pushed into the parquet scan
    when it sits directly over a file source (verified via .explain:
    PushedFilters on flattened inputs; struct fields prune the scan)."""
    return df.filter(is_valid())
