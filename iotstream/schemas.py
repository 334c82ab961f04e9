"""Schemas and fixture IO.

The single core schema of the reference pipeline is the sensor event
produced by the generator (reference iot-sensor/mqttgen.py:32-45),
parsed by Gson (reference src/main/java/stream/StreamProcessor.java:87-92)
and re-declared in KSQL DDL (reference README.md:76-83):

    {id, messageId, timestamp, metrics{temperature, humidity}}

``timestamp`` is epoch *seconds*, emitted as a JSON int and coerced to
String by Gson (reference src/main/java/stream/data/SensorEvent.java:8) —
we keep the string column for fidelity and normalize to a proper
TimestampType column ``ts`` for event-time processing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

# Mirrors SensorEvent.java:6-9 + Metrics.java:5-6 (LongType to match the POJO).
METRICS = StructType(
    [
        StructField("temperature", LongType()),
        StructField("humidity", LongType()),
    ]
)

SENSOR_EVENT = StructType(
    [
        StructField("id", StringType()),
        StructField("messageId", StringType()),
        StructField("timestamp", StringType()),  # epoch seconds as string
        StructField("metrics", METRICS),
    ]
)

#: Fixture tables the driver provides at /root/testdata/sf*/ (TESTDATA.md).
FIXTURE_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir.rstrip('/')}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table. Plain parquet scan → full Catalyst
    pushdown/pruning applies to whatever the caller selects/filters."""
    if name not in FIXTURE_TABLES:
        raise KeyError(f"unknown fixture table {name!r}; one of {FIXTURE_TABLES}")
    if name == "events":
        return normalize_ns_timestamp(load_events_raw(spark, sf_dir))
    return spark.read.parquet(table_path(sf_dir, name))


def load_events_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores TIMESTAMP(NANOS), which Spark's reader
    rejects; read nanos as long (runtime-settable legacy conf) and let
    ``normalize_ns_timestamp`` truncate to microseconds — exactly what
    DuckDB does on the same file, keeping oracle parity."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    return spark.read.parquet(table_path(sf_dir, "events"))


def normalize_ns_timestamp(df: DataFrame, col: str = "ts") -> DataFrame:
    """Normalize the fixture ``ts`` column to TimestampType regardless of
    how the reader surfaced TIMESTAMP(NANOS): as bigint nanos (with
    ``nanosAsLong``) or as TIMESTAMP_NTZ (newer readers ignore the legacy
    conf). Watermarks and ``unix_micros`` require TimestampType; under the
    session-UTC discipline (``use_utc``) the NTZ→TZ cast is a value no-op."""
    dtype = dict(df.dtypes).get(col)
    if dtype in ("bigint", "long"):
        return df.withColumn(col, F.timestamp_micros(F.expr(f"{col} div 1000")))
    if dtype == "timestamp_ntz":
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def normalize_event_time(df: DataFrame, epoch_str_col: str = "timestamp") -> DataFrame:
    """Add TimestampType ``ts`` from the reference's stringly epoch-seconds
    column (SensorEvent.java:8 stores epoch seconds as String)."""
    return df.withColumn(
        "ts", F.to_timestamp(F.from_unixtime(F.col(epoch_str_col).cast("long")))
    )


def event_time_only(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Exclude rows WITHOUT event time from event-time operators.

    Declared semantic (r11 NULL-parity sweep): windowed aggregation,
    sessionization, ordered analytics (lag/lead/LOCF/EWMA), and
    time-bucketed rollups all require an event timestamp; a row with
    NULL event time cannot be placed on any timeline and is excluded —
    exactly what Structured Streaming's watermark/window operators do
    implicitly (Spark's ``F.window`` silently drops NULL timestamps).
    Making the filter explicit keeps batch and streaming twins
    byte-identical and gives the DuckDB oracles a single clause
    (``ts IS NOT NULL``) to mirror, instead of relying on the engines'
    DIVERGENT null-ordering defaults (Spark sorts NULLS FIRST
    ascending, DuckDB NULLS LAST — every lag/LOCF computation over a
    NULL-bearing timeline disagrees otherwise)."""
    return df.filter(F.col(ts_col).isNotNull())


def use_utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone so epoch<->timestamp conversions agree
    with the DuckDB oracle (which treats naive timestamps as UTC)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
