"""F1/C1 — JSON serde boundary.

The reference parses raw MQTT payload strings with Gson (reference
src/main/java/stream/StreamProcessor.java:87-92) and serializes back to
JSON with Jackson for the Kafka sink (StreamProcessor.java:120-121).
Gson is lenient: unknown fields are ignored, the numeric ``timestamp``
coerces into the String field, and a missing/empty ``metrics`` object
materializes as Metrics(0, 0) via Java field defaults
(SURVEY.md §1.3). Spark's ``from_json`` is likewise lenient but yields
*nulls* for missing fields — ``normalize_missing_metrics`` restores the
Gson (0, 0) behavior explicitly (SURVEY.md §7.4 risk 3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from iotstream.schemas import SENSOR_EVENT


def parse_sensor_json(df: DataFrame, value_col: str = "value") -> DataFrame:
    """String JSON payload → typed SensorEvent columns (F1).

    Equivalent of the Gson map at StreamProcessor.java:55,87-92 — but as
    one vectorized expression instead of a per-record codec.
    """
    parsed = df.select(
        F.from_json(F.col(value_col).cast("string"), SENSOR_EVENT).alias("e")
    ).select("e.*")
    return normalize_missing_metrics(parsed)


def normalize_missing_metrics(df: DataFrame) -> DataFrame:
    """missing/null metrics → (0, 0), matching Gson's field defaults for
    an empty ``{}`` reading (mqttgen.py:38-39 emits ``{}``; Gson gives
    Metrics(0,0)). Without this the empty-reading branch of the validity
    filter silently diverges (null never equals 0)."""
    return df.withColumn(
        "metrics",
        F.struct(
            F.coalesce(F.col("metrics.temperature"), F.lit(0).cast("long")).alias(
                "temperature"
            ),
            F.coalesce(F.col("metrics.humidity"), F.lit(0).cast("long")).alias(
                "humidity"
            ),
        ),
    )


def to_sensor_json(df: DataFrame, out_col: str = "value") -> DataFrame:
    """Typed SensorEvent columns → single JSON string column (C1/K2).

    Equivalent of Jackson ``valueToTree`` serialization at
    StreamProcessor.java:120-121; field order follows SENSOR_EVENT.
    """
    return df.select(
        F.to_json(
            F.struct(
                F.col("id"), F.col("messageId"), F.col("timestamp"), F.col("metrics")
            )
        ).alias(out_col)
    )
