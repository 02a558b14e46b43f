"""Structured Streaming real-time analytics: watermarked event-time
windows + anomaly alert streams.

Reference: stream_processor.py keeps 1000-event deques and recomputes
metrics every 100 events on processing time (/root/reference/python/
stream_processor.py:26-31,72-75,216-253). Here (SURVEY §2.9):

- W1/W4/W5 windows  → groupBy(window(event_time, ...)) with watermark
- W3 bounded state  → the watermark evicts window state (replaces both
                      deque maxlen and Redis TTL)
- W2 trigger        → micro-batch trigger (documented deviation from the
                      reference's every-100-events trigger)
- W6-W9 anomalies   → filters over rows/windowed aggregates → one union
                      alert stream (S3/S6)

These builders take any streaming (or batch — identical graph) DataFrame
with the events shape (ts timestamp, event_type string, user_id long,
value double, props json string).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..config import DEFAULT_CONFIG
from ..functions.labels import alert_severity

_T = DEFAULT_CONFIG.thresholds

WATERMARK = "10 minutes"


def minute_metrics_stream(events: DataFrame) -> DataFrame:
    """W1: tumbling 1-minute purchase metrics with watermark-bounded state."""
    src = events.withWatermark("ts", WATERMARK) if events.isStreaming else events
    return (
        src.filter(F.col("event_type") == "purchase")
        .groupBy(F.window("ts", "1 minute").alias("w"))
        .agg(
            F.count("*").alias("event_count"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_count", "total_value")
    )


def velocity_stream(events: DataFrame) -> DataFrame:
    """W4: per-product 5-minute velocity (product id = props.k)."""
    src = events.withWatermark("ts", WATERMARK) if events.isStreaming else events
    return (
        src.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.get_json_object("props", "$.k").cast("int").alias("product_k"),
            F.window("ts", "5 minutes").alias("w"),
        )
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"))
        .select("product_k", F.col("w.start").alias("window_start"), "total_value")
    )


def high_value_alerts_stream(events: DataFrame) -> DataFrame:
    """W6: stateless high-value filter — works identically on a stream
    (append mode, no state) and a batch frame."""
    return (
        events.filter(
            (F.col("event_type") == "purchase") & (F.col("value") > _T.high_value_event)
        )
        .withColumn("alert_type", F.lit("high_value_order"))
        .withColumn("severity", alert_severity(F.col("alert_type")))
        .select("event_id", "user_id", "ts", "value", "alert_type", "severity")
    )


def bulk_alerts_stream(events: DataFrame) -> DataFrame:
    """W7: bulk-event windows. On a stream the count filter applies per
    finalized window (append mode emits on watermark expiry)."""
    src = events.withWatermark("ts", WATERMARK) if events.isStreaming else events
    return (
        src.groupBy(F.window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("event_count"))
        .filter(F.col("event_count") > _T.bulk_events_per_window)
        .withColumn("alert_type", F.lit("bulk_orders"))
        .withColumn("severity", alert_severity(F.col("alert_type")))
        .select(F.col("w.start").alias("window_start"), "event_count", "alert_type", "severity")
    )
