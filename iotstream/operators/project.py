"""F3/F5 — flatten + rename projections.

The raw-archive document layout flattens the nested event and renames
fields (reference src/main/java/stream/mongodb/MongoDBRawData.java:38-42):
``{_messageId, sensorId, timestamp, temperature, humidity}``. In Spark
this is a projection, not connector logic — the sink just appends.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def raw_archive_projection(df: DataFrame) -> DataFrame:
    """SensorEvent frame → flattened raw-archive document shape (F3).

    Applied PRE-filter: the reference archives every event, valid or not
    (StreamProcessor.java:58 runs the Mongo save before the filter).
    """
    return df.select(
        F.col("messageId").alias("_messageId"),
        F.col("id").alias("sensorId"),
        F.col("timestamp"),
        F.col("metrics.temperature").alias("temperature"),
        F.col("metrics.humidity").alias("humidity"),
    )
