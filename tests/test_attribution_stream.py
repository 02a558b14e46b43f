"""Streaming attribution settles exactly the batch operator's touches:
multiset parity on (user, conv, type, pos, n) plus credits, lookback
state eviction, equal-ts conventions, and checkpoint-restart."""

import datetime as dt
from collections import Counter

from pyspark.sql import Window
from pyspark.sql import functions as F

import cdc_stream_batch_etl_spark.operators.attribution as mta
from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.streaming.attribution_stream import (
    attribution_stream,
    position_weight,
)

T0 = dt.datetime(2024, 1, 1)


def _batch_expected(spark, sf_dir):
    touches = mta.attributed_touches(spark, sf_dir).collect()
    return Counter(
        (
            r.conv_id,
            r.event_type,
            r.pos,
            r.n,
            round(1.0 / r.n, 12),
            round(position_weight(r.pos, r.n), 12),
        )
        for r in touches
    )


def _stream(spark, tmp_path, events, n_batches=4, name="attr_out"):
    src = str(tmp_path / f"src_{name}")
    ordered = events.withColumn(
        "__q", F.ntile(n_batches).over(Window.orderBy("ts", "event_id"))
    )
    for q in range(1, n_batches + 1):
        ordered.filter(F.col("__q") == q).drop("__q").coalesce(1).write.parquet(
            f"{src}/batch_{q}"
        )
    stream_src = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch_*")
    )
    q = (
        attribution_stream(stream_src)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_stream_settles_exactly_the_batch_touches(
    spark, tmp_path, sf_dir, state_provider
):
    events = load_table(spark, sf_dir, "events")
    expected = _batch_expected(spark, sf_dir)
    got = Counter(
        (
            r.conv_id,
            r.event_type,
            r.pos,
            r.n,
            round(r.linear_credit, 12),
            round(r.position_credit, 12),
        )
        for r in _stream(spark, tmp_path, events, name=f"attr_{state_provider}")
    )
    assert got == expected


def test_lookback_eviction_and_equal_ts(spark, tmp_path):
    rows = [
        # user 1: a touch 8 days stale by purchase time -> dropped
        (1, T0, 1, "view"),
        (2, T0 + dt.timedelta(days=8), 1, "purchase"),
        # user 2: touch and purchase at the same instant, purchase has
        # the SMALLER event_id -> still settles the touch (inclusive)
        (4, T0, 2, "purchase"),
        (5, T0, 2, "view"),
    ]
    # rows 4,5 share a timestamp: write the micro-batches explicitly so
    # the same-instant pair arrives together (ntile would split them)
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    src = str(tmp_path / "src_edge")
    spark.createDataFrame(rows[:2], schema).coalesce(1).write.parquet(f"{src}/batch_1")
    spark.createDataFrame(rows[2:], schema).coalesce(1).write.parquet(f"{src}/batch_2")
    stream_src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch_*")
    )
    q = (
        attribution_stream(stream_src)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("attr_edge")
        .option("checkpointLocation", str(tmp_path / "ckpt_edge"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = spark.sql("SELECT * FROM attr_edge").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.user_id, r.conv_id, r.event_type, r.pos, r.n) == (2, 4, "view", 1, 1)
    assert r.linear_credit == 1.0 and r.position_credit == 1.0


def test_restart_settles_each_touch_once(spark, tmp_path, sf_dir):
    import shutil

    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 0)
    staging = str(tmp_path / "staging")
    src = str(tmp_path / "src")
    ordered = events.withColumn("__q", F.ntile(4).over(Window.orderBy("ts", "event_id")))
    for q in range(1, 5):
        ordered.filter(F.col("__q") == q).drop("__q").coalesce(1).write.parquet(
            f"{staging}/batch_{q}"
        )
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def _run():
        stream_src = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/batch_*")
        )
        q = (
            attribution_stream(stream_src)
            .writeStream.foreachBatch(
                lambda df, _: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    for b in (1, 2):
        shutil.copytree(f"{staging}/batch_{b}", f"{src}/batch_{b}")
    _run()
    for b in (3, 4):
        shutil.copytree(f"{staging}/batch_{b}", f"{src}/batch_{b}")
    _run()
    streamed = Counter(
        (r.conv_id, r.event_type, r.pos, r.n)
        for r in spark.read.parquet(out).collect()
    )
    # expected = the batch operator run on the SAME filtered frame
    orig = mta.load_table
    try:
        mta.load_table = lambda s, d, t: events  # noqa: ARG005
        exp = Counter(
            (r.conv_id, r.event_type, r.pos, r.n)
            for r in mta.attributed_touches(spark, "x").collect()
        )
    finally:
        mta.load_table = orig
    assert streamed == exp


def test_position_weights_sum_to_one():
    for n in (1, 2, 3, 4, 10, 100):
        assert abs(sum(position_weight(p, n) for p in range(1, n + 1)) - 1.0) < 1e-12
