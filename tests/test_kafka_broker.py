"""Real-broker Kafka smoke (CI-optional) — closes the S2/S6 assumption
that sources/kafka.py's readStream/writeStream option plumbing works
against a live broker, not just in graph construction.

Every streaming semantics test runs on file sources (by design — the
builders are source-agnostic); this is the one test that exercises the
actual Kafka options (subscribe list, startingOffsets=earliest,
failOnDataLoss, maxOffsetsPerTrigger, keyed to_json producer) through a
real round trip. It SKIPS unless all three hold:

  1. ``KAFKA_BOOTSTRAP`` is set (e.g. ``localhost:9092`` from a
     docker-compose broker — the reference's topology,
     /root/reference/docker-compose.yml:79-101, runs one on 9092);
  2. the broker answers a TCP connect;
  3. the spark-sql-kafka connector is on the session classpath
     (``--packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark
     version>`` — not bundled in this container).

Run:  KAFKA_BOOTSTRAP=localhost:9092 python -m pytest tests/test_kafka_broker.py
"""

import json
import os
import socket
import uuid

import pytest

BOOTSTRAP = os.environ.get("KAFKA_BOOTSTRAP")


def _broker_reachable(addr: str, timeout: float = 2.0) -> bool:
    host, _, port = addr.partition(":")
    try:
        with socket.create_connection((host, int(port or 9092)), timeout):
            return True
    except OSError:
        return False


pytestmark = pytest.mark.skipif(
    not BOOTSTRAP or not _broker_reachable(BOOTSTRAP),
    reason="no live Kafka broker (set KAFKA_BOOTSTRAP=host:port to run)",
)


def _kafka_connector_available(spark) -> bool:
    try:
        spark.read.format("kafka").option(
            "kafka.bootstrap.servers", BOOTSTRAP
        ).option("subscribe", "__probe__").option(
            "startingOffsets", "earliest"
        ).option("endingOffsets", "earliest").load().schema
        return True
    except Exception as exc:  # connector missing → AnalysisException
        if "Failed to find data source" in str(exc):
            return False
        return True  # broker-side errors mean the connector IS present


def test_producer_and_cdc_source_roundtrip(spark, tmp_path):
    """Write keyed JSON envelopes through the kafka batch producer,
    read them back via cdc_source's exact option set, and compare
    payloads — the envelope schema parity with the file-source twin is
    already pytest-locked; this proves the broker wiring."""
    if not _kafka_connector_available(spark):
        pytest.skip(
            "spark-sql-kafka connector not on classpath "
            "(--packages org.apache.spark:spark-sql-kafka-0-10_2.13:...)"
        )
    from pyspark.sql import functions as F

    from cdc_stream_batch_etl_spark.sources.kafka import cdc_source

    topic = f"dbserver1.public.orders.smoke-{uuid.uuid4().hex[:8]}"
    envelopes = [
        {"op": "c", "ts_ms": 1700000000000 + i, "id": i, "total_amount": i * 1.5}
        for i in range(25)
    ]
    src = spark.createDataFrame(
        [(str(e["id"]), json.dumps(e)) for e in envelopes],
        "key string, value string",
    )
    (
        src.write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )

    stream = cdc_source(
        spark, BOOTSTRAP, topics=(topic,), max_offsets_per_trigger=10
    )
    q = (
        stream.select(
            F.col("key").cast("string"), F.col("value").cast("string")
        )
        .writeStream.format("memory")
        .queryName("kafka_smoke")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        int(r.key): json.loads(r.value)
        for r in spark.sql("SELECT * FROM kafka_smoke").collect()
    }
    assert got == {e["id"]: e for e in envelopes}
