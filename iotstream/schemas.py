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


def finite_measures(df: DataFrame, *cols: str) -> DataFrame:
    """Exclude rows whose measure is non-finite (NaN or ±Inf) from
    exact-decimal aggregation paths.

    Declared semantic (r11 hostile-values sweep): an exact DECIMAL sum
    is only defined over finite inputs — Spark's ``CAST(double AS
    DECIMAL)`` silently maps NaN/±Inf to NULL (the row vanishes from
    the sum with no trace; at corpus scale that is silent revenue
    loss), while DuckDB raises outright. Making the exclusion explicit
    gives both engines one clause (``x IS NULL OR isfinite(x)``) and
    turns silent divergence into a declared, auditable rule. NULL
    measures are NOT excluded — SUM skips them identically on both
    engines (the r11 NULL-parity contract) — and rows quarantined here
    remain visible to data-quality profiling (``dq_report``)."""
    cond = F.lit(True)
    for name in cols:
        c = F.col(name)
        cond = cond & (
            c.isNull() | (~F.isnan(c) & (F.abs(c) != F.lit(float("inf"))))
        )
    return df.filter(cond)


def finite_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lineitem under the TABLE-LEVEL finite-measures contract: rows
    with a non-finite value in ANY of the four float measures are
    excluded (r12). The per-query variant ("guard only the columns this
    query casts") survived the hostile sweep by fixture luck — a NaN
    row that dodges one query's filters still hits another's — so every
    exact-DECIMAL lineitem consumer declares the same uniform rule and
    mirrors it with one oracle clause (``_FINITE_LI`` in
    ``__spark_entry__.oracle_sql``). A lineitem row with any non-finite
    measure is corrupt at the source; dropping it whole is the
    defensible 100 TB semantic, and the conjunction evaluates scan-side
    (inside the scan's WholeStageCodegen stage, before any shuffle)."""
    return finite_measures(
        load_table(spark, sf_dir, "lineitem"),
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
    )


def nonnegative_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """Non-negative event-time domain for WATERMARKED streaming
    operators.

    Declared semantic (r11 hostile-values sweep): Structured Streaming
    initializes every watermark at epoch 0, so a pre-epoch event is
    "late" to the very first micro-batch and is silently dropped no
    matter the configured delay — a Spark limitation, not a choice this
    engine can make. Watermarked streaming queries therefore declare
    ts >= 1970-01-01 explicitly (the DuckDB twins mirror the clause),
    turning the silent drop into a visible contract. Batch operators
    are NOT restricted — the batch twins handle pre-epoch rows exactly
    (see the pmod bucket fix in ext/temporal.py from the same sweep).
    NULL event times pass through untouched: they do not participate
    in lateness at all (the r11 NULL-parity contract — watermarked
    dedup keeps them, windowed aggs drop them downstream on both
    engines), and this filter must not change that.

    The boundary is built timezone-independently (epoch second 0, the
    instant Spark's watermark actually initializes at) — a string
    literal cast to timestamp would be read in the session timezone and
    silently shift the domain by the session offset for any caller that
    has not pinned UTC."""
    c = F.col(ts_col)
    return df.filter(c.isNull() | (c >= F.timestamp_seconds(F.lit(0))))


def positive_event_time(df: DataFrame, ts_col: str = "ts") -> DataFrame:
    """STRICTLY-positive event-time domain for stream-stream JOIN
    sides.

    Measured r14 (generalizing the r13 epoch-eviction class): the
    symmetric-hash join's late-input filter drops rows at EXACTLY
    epoch — an error event at 1970-01-01T00:00:00 loses its pair while
    one at 00:00:01 keeps it — because the input-row predicate tests
    ``ts <= watermark`` against the initial epoch-0 watermark. This
    differs from windowed/session aggregations, where eviction keys on
    the WINDOW END and an epoch-exact row survives (its window ends
    after epoch), hence the separate ``nonnegative_event_time``
    contract there. NULL event times pass through untouched — the join
    condition excludes them on both engines."""
    c = F.col(ts_col)
    return df.filter(c.isNull() | (c > F.timestamp_seconds(F.lit(0))))


def use_utc(spark: SparkSession) -> SparkSession:
    """Pin the session timezone so epoch<->timestamp conversions agree
    with the DuckDB oracle (which treats naive timestamps as UTC)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark
