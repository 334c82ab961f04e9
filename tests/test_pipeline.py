"""The assembled reference topology: raw archive sees PRE-filter data,
clean output sees POST-filter data, off one source
(StreamProcessor.java:58 vs :81; SURVEY.md §7.4 risk 2)."""

from __future__ import annotations

from pyspark.sql import functions as F

from iotstream.config import EngineConfig
from iotstream.generator import sensor_payload_json, synthetic_sensor_events
from iotstream.pipeline import run_sensor_pipeline_batch, run_sensor_pipeline_stream


def _payloads(spark, n=1000):
    gen = synthetic_sensor_events(spark, n)
    return gen.select(
        sensor_payload_json(F.col("loop"), 10, F.col("ts")).alias("value")
    )


def test_batch_topology_counts(spark):
    res = run_sensor_pipeline_batch(_payloads(spark))
    assert res.raw_archive.count() == 1000      # every event archived
    assert res.clean.count() == 900             # 10% dropped
    assert res.raw_archive.columns == [
        "_messageId", "sensorId", "timestamp", "temperature", "humidity",
    ]
    aggs = res.aggregates
    assert {"window_start", "window_end", "id"}.issubset(set(aggs.columns))
    # window aggregates only ever see valid temperatures
    mx = aggs.agg(F.max("max_temperature")).first()[0]
    assert mx <= 50


def test_streaming_dual_sink(spark, tmp_path):
    conf = EngineConfig(
        raw_archive_path=str(tmp_path / "raw"),
        clean_path=str(tmp_path / "clean"),
    )
    payload_dir = str(tmp_path / "payloads")
    _payloads(spark).coalesce(1).write.mode("overwrite").parquet(payload_dir)

    from iotstream.sources import FileStreamSource

    stream = FileStreamSource(payload_dir, _payloads(spark).schema).load(spark)
    run_sensor_pipeline_stream(spark, stream, conf, str(tmp_path / "ckpt"))

    raw = spark.read.parquet(conf.raw_archive_path)
    clean = spark.read.parquet(conf.clean_path)
    assert raw.count() == 1000
    assert clean.count() == 900


def test_config_from_properties(tmp_path):
    p = tmp_path / "app.properties"
    p.write_text(
        "# comment\nkafka.bootstrap=broker:9092\nkafka.topic=event1\n"
        "mqtt.port=1883\ncustom.key=x\n"
    )
    conf = EngineConfig.from_properties(str(p))
    assert conf.kafka_bootstrap == "broker:9092"
    assert conf.kafka_topic == "event1"
    assert conf.mqtt_port == 1883
    assert conf.extra == {"custom_key": "x"}


def test_ephemeral_dir_falls_back_without_shm(monkeypatch, tmp_path):
    """Capacity/permission guard: no /dev/shm (or a tiny one) must fall
    back to the normal temp dir instead of ENOSPC-ing drains."""
    import os

    import iotstream.streaming as st

    monkeypatch.setattr(
        os, "statvfs", lambda p: (_ for _ in ()).throw(OSError("nope"))
    )
    monkeypatch.setenv("TMPDIR", str(tmp_path))
    import tempfile

    tempfile.tempdir = None  # re-read TMPDIR
    try:
        d = st.ephemeral_dir("iotstream-test-")
        assert d.startswith(str(tmp_path))
        assert os.path.isdir(d)
    finally:
        tempfile.tempdir = None
