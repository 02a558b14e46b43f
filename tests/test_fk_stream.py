"""Streaming FK-orphan monitor: alerts match the batch twin on the same
planted data, with orphans arriving across micro-batch boundaries and a
healthy batch emitting nothing."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_stream_batch_etl_spark.sources.files import parquet_stream
from cdc_stream_batch_etl_spark.streaming.fk_stream import orphan_event_alerts

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
    ]
)


@pytest.fixture()
def planted(spark, tmp_path):
    customers = spark.createDataFrame([(7,), (8,), (9,)], "c_custkey bigint")
    batches = [
        [  # batch 0: one orphan (user 99)
            (1, "2024-01-01 00:00:00", 7, "click"),
            (2, "2024-01-01 00:01:00", 99, "click"),
        ],
        [  # batch 1: all healthy
            (3, "2024-01-01 00:02:00", 8, "purchase"),
        ],
        [  # batch 2: two more orphans, one repeat offender
            (4, "2024-01-01 00:03:00", 99, "purchase"),
            (5, "2024-01-01 00:04:00", 123, "signup"),
            (6, "2024-01-01 00:05:00", 9, "click"),
        ],
    ]
    src = tmp_path / "events"
    src.mkdir()
    for i, batch in enumerate(batches):
        spark.createDataFrame(
            batch, ["event_id", "ts0", "user_id", "event_type"]
        ).select(
            "event_id",
            F.col("ts0").cast("timestamp").alias("ts"),
            "user_id",
            "event_type",
        ).coalesce(1).write.parquet(str(src / f"b{i}.parquet"))
    return customers, str(src) + "/*"


def test_stream_alerts_match_batch_twin(spark, planted):
    customers, path = planted
    q = (
        orphan_event_alerts(parquet_stream(spark, path, SCHEMA), customers)
        .writeStream.format("memory")
        .queryName("fk_alerts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = {
        (r.event_id, r.user_id)
        for r in spark.sql("SELECT * FROM fk_alerts").collect()
    }
    batch_events = spark.read.schema(SCHEMA).parquet(path)
    expected = {
        (r.event_id, r.user_id)
        for r in orphan_event_alerts(batch_events, customers).collect()
    }
    assert got == expected == {(2, 99), (4, 99), (5, 123)}
    # alert label identifies the edge
    assert all(
        r.alert == "fk_orphan:events.user_id->customer.c_custkey"
        for r in spark.sql("SELECT * FROM fk_alerts").collect()
    )


def test_healthy_stream_is_silent(spark, tmp_path):
    customers = spark.createDataFrame([(1,), (2,)], "c_custkey bigint")
    src = tmp_path / "ok"
    src.mkdir()
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "click")],
        ["event_id", "ts0", "user_id", "event_type"],
    ).select(
        "event_id",
        F.col("ts0").cast("timestamp").alias("ts"),
        "user_id",
        "event_type",
    ).coalesce(1).write.parquet(str(src / "b0.parquet"))
    q = (
        orphan_event_alerts(
            parquet_stream(spark, str(src) + "/*", SCHEMA), customers
        )
        .writeStream.format("memory")
        .queryName("fk_ok")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    assert spark.sql("SELECT * FROM fk_ok").count() == 0
