"""T5 EXT — custom stateful streaming operators.

The reference's only state is the KSQL windowed aggregation
(README.md:87-92). Structured Streaming additionally exposes
arbitrary per-key state via ``applyInPandasWithState`` — used here for
a per-sensor quality monitor that no built-in aggregate expresses:
running totals of valid/invalid readings plus the longest run of
consecutive invalid readings (an alerting primitive). State lives in
the state store, keyed by sensor — at 100 TB of stream history the
state is bounded by key cardinality, not event count.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType(
    [
        StructField("n_total", LongType()),
        StructField("n_invalid", LongType()),
        StructField("cur_run", LongType()),
        StructField("max_run", LongType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("id", StringType()),
        StructField("n_total", LongType()),
        StructField("n_invalid", LongType()),
        StructField("max_invalid_run", LongType()),
    ]
)


def _monitor(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    n_total, n_invalid, cur_run, max_run = (
        state.get if state.exists else (0, 0, 0, 0)
    )
    for pdf in pdfs:
        # Order within the batch by event time so "consecutive" means
        # consecutive in the sensor's own timeline.
        pdf = pdf.sort_values("ts")
        invalid = (
            (pdf["temperature"].eq(0) & pdf["humidity"].eq(0))
            | (pdf["temperature"].ge(50) & pdf["humidity"].ge(100))
        ).to_numpy()
        for bad in invalid:
            n_total += 1
            if bad:
                n_invalid += 1
                cur_run += 1
                max_run = max(max_run, cur_run)
            else:
                cur_run = 0
    state.update((int(n_total), int(n_invalid), int(cur_run), int(max_run)))
    yield pd.DataFrame(
        {
            "id": [key[0]],
            "n_total": [n_total],
            "n_invalid": [n_invalid],
            "max_invalid_run": [max_run],
        }
    )


def quality_monitor(sensor_stream: DataFrame) -> DataFrame:
    """Per-sensor stateful quality totals over a SensorEvent stream.

    Input needs columns id, ts, metrics.{temperature, humidity}; each
    micro-batch emits the updated per-sensor totals (update semantics,
    like the reference's continuously-updated KSQL table).
    """
    from pyspark.sql import functions as F

    flat = sensor_stream.select(
        "id",
        "ts",
        F.col("metrics.temperature").alias("temperature"),
        F.col("metrics.humidity").alias("humidity"),
    )
    return flat.groupBy("id").applyInPandasWithState(
        _monitor,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_quality_monitor_final(
    spark: Any, sensor_stream: DataFrame
) -> DataFrame:
    """Drain the stream (availableNow) through the monitor and return
    the final per-sensor state via keyed upsert."""
    from iotstream.sinks import ParquetUpsertSink
    from iotstream.streaming import run_available_now

    sink = ParquetUpsertSink(key_cols=["id"])
    writer = (
        quality_monitor(sensor_stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink.writer())
    )
    run_available_now(writer)
    return sink.to_df(spark)
