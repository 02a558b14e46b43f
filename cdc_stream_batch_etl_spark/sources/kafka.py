"""Kafka source/sink builders — the production wiring for the CDC and
alert streams (S2/S3/S4/S6).

Reference: KafkaConsumer over 4 Debezium topics with earliest offsets and
a consumer group (utils.py:86-94, cdc_processor.py:255-261), dual
independent groups (S4: cdc vs stream processors), and a JSON keyed
producer for alerts (utils.py:76-100, stream_processor.py:306-308).

Spark mapping: one kafka source subscribed to the topic list (the S3
multi-topic union); "consumer groups" become independent streaming queries
each with their own checkpoint; the producer becomes writeStream.format
("kafka") with to_json(struct(*)).

No Kafka broker exists in the test container — these builders are
config-only and exercised for graph construction, not connectivity (the
transformation graphs they feed are tested through file sources, which is
exactly the point of keeping them source-agnostic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEFAULT_TOPICS = (
    "dbserver1.public.customers",
    "dbserver1.public.orders",
    "dbserver1.public.products",
    "dbserver1.public.order_items",
)


def cdc_source(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: tuple[str, ...] = DEFAULT_TOPICS,
    starting_offsets: str = "earliest",
    max_offsets_per_trigger: int | None = 100_000,
) -> DataFrame:
    """S2/S3: one source over all table topics, earliest offsets.
    maxOffsetsPerTrigger bounds micro-batch size (the reference's
    max_events/batch bound, airflow_etl_utils.py:65-86)."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", ",".join(topics))
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", "false")
    )
    if max_offsets_per_trigger:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    return reader.load()


def alert_sink(
    alerts: DataFrame,
    bootstrap_servers: str,
    topic: str = "realtime-alerts",
    checkpoint: str = "/tmp/checkpoints/alerts",
):
    """S6: keyed JSON producer sink (key = alert type, value = full row
    JSON — mirrors send_alert's message shape, stream_processor.py:292-311)."""
    keyed = alerts.select(
        F.col("alert_type").cast("string").alias("key"),
        F.to_json(F.struct(*alerts.columns)).alias("value"),
    )
    return (
        keyed.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
        .start()
    )
