"""A1-A3 — grouped tumbling-window aggregates (the KSQL analytics layer).

Reference (README.md:87-92):
    CREATE TABLE MAX_TABLE AS
      SELECT ID, MAX(metrics->temperature) AS MAX_TEMPERATURE
      FROM json WINDOW TUMBLING (SIZE 1 MINUTES) GROUP BY ID;
README.md:72 states min and avg are computed the same way.

Time domain: KSQL windows on Kafka ROWTIME; we window on payload event
time (documented deviation, SURVEY.md §2.8 T2) — deterministic and
testable. The aggregation is a stock Catalyst hash aggregate with
map-side partial aggregation; under streaming the same expression runs
incrementally against the state store.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: agg-name → Column factory; avg is left unrounded here — declared
#: queries round explicitly to keep oracle hash parity (§7.4 risk 6).
_AGGS = {
    "max": F.max,
    "min": F.min,
    "avg": F.avg,
}


def tumbling_agg(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value: str | Column,
    width: str = "1 minute",
    aggs: Sequence[str] = ("max", "min", "avg"),
    prefix: str = "",
) -> DataFrame:
    """Per-key tumbling-window aggregate.

    Returns columns: window_start, window_end, *keys, <agg>_<prefix> per
    agg. Works unchanged on batch and streaming frames (add a watermark
    upstream for streaming append/update modes).
    """
    val = F.col(value) if isinstance(value, str) else value
    exprs = [_AGGS[a](val).alias(f"{a}_{prefix}" if prefix else a) for a in aggs]
    w = F.window(F.col(ts_col), width)
    # Explicit event-time contract: F.window already drops NULL
    # timestamps silently; the filter documents it and keeps the
    # DuckDB oracle's `ts IS NOT NULL` clause an exact mirror.
    df = df.filter(F.col(ts_col).isNotNull())
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(*exprs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            *[
                F.col(f"{a}_{prefix}" if prefix else a)
                for a in aggs
            ],
        )
    )


def hopping_agg(
    df: DataFrame,
    ts_col: str,
    keys: Sequence[str],
    value: str | Column,
    width: str = "2 minutes",
    slide: str = "1 minute",
    aggs: Sequence[str] = ("max",),
    prefix: str = "",
) -> DataFrame:
    """Per-key hopping (sliding) window aggregate — KSQL's
    ``WINDOW HOPPING (SIZE w, ADVANCE BY s)``. Each event lands in
    width/slide windows; Spark expands the copies map-side before the
    single aggregate shuffle (same cost shape as tumbling × the overlap
    factor). Batch and streaming alike."""
    val = F.col(value) if isinstance(value, str) else value
    exprs = [_AGGS[a](val).alias(f"{a}_{prefix}" if prefix else a) for a in aggs]
    w = F.window(F.col(ts_col), width, slide)
    df = df.filter(F.col(ts_col).isNotNull())  # same contract as tumbling_agg
    return (
        df.groupBy(w.alias("w"), *keys)
        .agg(*exprs)
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            *keys,
            *[F.col(f"{a}_{prefix}" if prefix else a) for a in aggs],
        )
    )
