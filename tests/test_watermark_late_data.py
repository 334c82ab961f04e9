"""T3 — a FINITE watermark must drop data later than the bound once
state for its window is evicted (the production late-data policy; the
correctness queries use an unbounded watermark instead, see
iotstream.streaming.UNBOUNDED_WATERMARK)."""

import datetime as dt
import time

from pyspark.sql import functions as F

from iotstream.operators.windows import tumbling_agg
from iotstream.sinks import ParquetUpsertSink
from iotstream.streaming import run_available_now, scoped_shuffle_partitions

SCHEMA = "id string, ts timestamp, value double"


def _rows(spark, rows):
    return spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s), float(v))
         for i, s, v in rows],
        SCHEMA,
    )


def test_late_row_beyond_watermark_is_dropped(spark, tmp_path):
    """A late row is dropped only once it arrives AFTER the batch whose
    watermark evicted its window's state — a row landing in the same
    batch that finalizes the window still merges (Spark's documented
    one-batch-lag watermark semantics; verified empirically)."""
    src = str(tmp_path / "src")
    # Batch 0: window [12:00,12:01) gets value 50; a row an hour later
    # advances the watermark (effective NEXT batch) far past that window.
    _rows(spark, [("x", 43200, 50.0), ("x", 46800, 1.0)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)  # file mtime orders the micro-batches
    # Batch 1: runs with watermark 12:50 → evicts the 12:00 window state.
    _rows(spark, [("x", 47000, 2.0)]).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    # Batch 2: a 99 into the evicted window — truly late, must drop.
    _rows(spark, [("x", 43230, 99.0)]).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "10 minutes")
    )
    agg = tumbling_agg(
        stream, "ts", ["id"], F.col("value"), "1 minute", aggs=("max",), prefix="value"
    )
    sink = ParquetUpsertSink(key_cols=["window_start", "id"])
    with scoped_shuffle_partitions(spark, 4):
        run_available_now(
            agg.writeStream.outputMode("update").foreachBatch(sink.writer())
        )
    out = {
        (r.window_start.isoformat(), r.id): r.max_value
        for r in sink.to_df(spark).collect()
    }
    # the late 99 must NOT have re-opened or raised the 12:00 window
    assert out[("2024-01-01T12:00:00", "x")] == 50.0
    assert len(out) == 3  # 12:00, 13:00, 13:03 windows — no 99 anywhere


def test_same_data_with_unbounded_watermark_keeps_late_row(spark, tmp_path):
    """Control: identical input, unbounded watermark → the late row IS
    aggregated (this is how the correctness gate runs)."""
    src = str(tmp_path / "src")
    _rows(spark, [("x", 43200, 50.0), ("x", 46800, 1.0)]).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    time.sleep(1.1)
    _rows(spark, [("x", 43230, 99.0)]).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .withWatermark("ts", "3650 days")
    )
    agg = tumbling_agg(
        stream, "ts", ["id"], F.col("value"), "1 minute", aggs=("max",), prefix="value"
    )
    sink = ParquetUpsertSink(key_cols=["window_start", "id"])
    with scoped_shuffle_partitions(spark, 4):
        run_available_now(
            agg.writeStream.outputMode("update").foreachBatch(sink.writer())
        )
    out = {
        (r.window_start.isoformat(), r.id): r.max_value
        for r in sink.to_df(spark).collect()
    }
    assert out[("2024-01-01T12:00:00", "x")] == 99.0
