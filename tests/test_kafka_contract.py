"""K2 contract test — the Kafka JSON sink's wire format, without a broker.

The reference publishes each clean event to Kafka as a JSON value with a
NULL key (reference src/main/java/stream/StreamProcessor.java:110-131:
``new ProducerRecord<>(topic, json)`` — the one-arg record constructor,
so partitioning is round-robin). Spark's kafka sink reads the ``key``
and ``value`` columns of its input frame and sends a null key whenever
no ``key`` column exists. No broker runs in this container, so the
contract is asserted on the exact frame the writer would hand to the
connector: column set, null-key semantics, and byte-identical JSON.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from iotstream.config import EngineConfig
from iotstream.operators.parse import parse_sensor_json, to_sensor_json
from iotstream.schemas import SENSOR_EVENT


def _sample_events(spark):
    rows = [
        ("sensor-7-1", "sensor-7-1-0001", "1700000000", (21, 55)),
        ("sensor-3-9", "sensor-3-9-0042", "1700000060", (0, 0)),
        ("sensor-1-2", "sensor-1-2-0007", "1700000120", (63, 117)),
    ]
    return spark.createDataFrame(rows, SENSOR_EVENT)


def test_kafka_value_frame_has_no_key_column(spark):
    """Null-key semantics: the frame handed to the kafka connector must
    expose ONLY ``value`` — Spark then sends key=null, matching the
    reference's one-arg ProducerRecord (round-robin partitioning)."""
    payload = to_sensor_json(_sample_events(spark))
    assert payload.columns == ["value"]


def test_kafka_json_bytes_are_jackson_identical(spark):
    """Byte-identical JSON: same field order (id, messageId, timestamp,
    metrics{temperature, humidity}), no whitespace, numbers unquoted
    only where the POJO field is numeric — exactly what Jackson's
    valueToTree produced at StreamProcessor.java:120-121."""
    got = [
        r["value"]
        for r in to_sensor_json(_sample_events(spark))
        .orderBy("value")
        .collect()
    ]
    want = sorted(
        json.dumps(
            {
                "id": i,
                "messageId": m,
                "timestamp": t,
                "metrics": {"temperature": mt, "humidity": mh},
            },
            separators=(",", ":"),
        )
        for i, m, t, (mt, mh) in [
            ("sensor-7-1", "sensor-7-1-0001", "1700000000", (21, 55)),
            ("sensor-3-9", "sensor-3-9-0042", "1700000060", (0, 0)),
            ("sensor-1-2", "sensor-1-2-0007", "1700000120", (63, 117)),
        ]
    )
    assert got == want


def test_kafka_roundtrip_restores_typed_frame(spark):
    """serialize → parse is the identity on every typed column (the
    consumer sees exactly what the producer's POJO held)."""
    events = _sample_events(spark)
    back = parse_sensor_json(to_sensor_json(events))
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, events.collect())
    )


def test_kafka_writer_builds_unstarted(spark, tmp_path):
    """kafka_json_writer wires format/topic/bootstrap/checkpoint options
    and returns the UNSTARTED writer (config-gated: starting needs a
    broker + the kafka connector jar, neither present here)."""
    conf = EngineConfig(
        kafka_bootstrap="localhost:9092", kafka_topic="clean-stream"
    )
    from iotstream.sinks import kafka_json_writer

    stream = (
        spark.readStream.format("rate").option("rowsPerSecond", "1").load()
        .select(
            F.lit("sensor-1-1").alias("id"),
            F.concat(F.lit("m-"), F.col("value")).alias("messageId"),
            F.col("value").cast("string").alias("timestamp"),
            F.struct(
                F.lit(1).cast("long").alias("temperature"),
                F.lit(2).cast("long").alias("humidity"),
            ).alias("metrics"),
        )
    )
    writer = kafka_json_writer(stream, conf, str(tmp_path / "ckpt"))
    # Unstarted DataStreamWriter — the contract is that building it does
    # not touch a broker; options live in the writer's internal state.
    assert writer is not None
    assert not spark.streams.active


def test_kafka_live_broker_roundtrip(spark, tmp_path):
    """Opt-in LIVE-broker smoke (VERDICT r13 item 6): byte parity of
    the Kafka hop against the in-process serde path. Requires BOTH a
    reachable broker (``KAFKA_BOOTSTRAP`` env) and the
    spark-sql-kafka connector on the session classpath — this sandbox
    has neither (no broker, no connector jar in the PySpark dist, no
    network to fetch one), so here the gate is PERMANENT and the test
    skips cleanly; on a provisioned machine it runs the real hop.
    """
    import os
    import uuid

    bootstrap = os.environ.get("KAFKA_BOOTSTRAP")
    if not bootstrap:
        pytest.skip("KAFKA_BOOTSTRAP not set (no broker in sandbox)")
    try:  # connector presence probe — fails fast without the jar
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", bootstrap
        ).option("subscribe", "__probe__").load()
    except Exception as e:  # noqa: BLE001
        if "Failed to find data source" in str(e):
            pytest.skip("spark-sql-kafka connector jar not on classpath")
        raise

    from iotstream.sinks import kafka_json_writer
    from iotstream.sources import KafkaJsonSource

    topic = f"iotstream-smoke-{uuid.uuid4().hex[:8]}"
    conf = EngineConfig(kafka_bootstrap=bootstrap, kafka_topic=topic)
    events = _sample_events(spark)
    want = sorted(r.value for r in to_sensor_json(events).collect())

    # produce: batch write through the same JSON serde the stream uses
    (
        to_sensor_json(events)
        .write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    # consume: the engine's own source, drained availableNow
    out = str(tmp_path / "out")
    (
        KafkaJsonSource(conf)
        .load(spark)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
        .awaitTermination(120)
    )
    got = sorted(r.value for r in spark.read.parquet(out).collect())
    assert got == want  # byte-identical JSON through the broker hop
