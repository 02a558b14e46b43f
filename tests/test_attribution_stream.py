"""Streaming attribution under the r11 watermark-sealed contract:
arrivals may be reordered arbitrarily within the horizon and the
settled-touch multiset must still equal the batch operator exactly —
including the r10 ADVICE case of a same-instant touch delivered a
batch AFTER its purchase. Lookback eviction, both state-store
providers, checkpoint-restart."""

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
FLUSH_USER = -999


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


def _flush_row(spark, events, days_past_max=45):
    max_ts = events.agg(F.max("ts")).first()[0]
    return spark.createDataFrame(
        [(10**9, max_ts + dt.timedelta(days=days_past_max), FLUSH_USER, "flush", 0.0, None)],
        events.schema,
    )


def _stream(spark, tmp_path, events, name, n_batches=4, watermark="40 days"):
    """Shuffled arrival order (hash of event_id) + trailing flush."""
    src = str(tmp_path / f"src_{name}")
    ordered = events.withColumn(
        "__q", F.ntile(n_batches).over(Window.orderBy(F.xxhash64("event_id")))
    )
    for q in range(1, n_batches + 1):
        ordered.filter(F.col("__q") == q).drop("__q").coalesce(1).write.parquet(
            f"{src}/batch_{q}"
        )
    _flush_row(spark, events).coalesce(1).write.parquet(f"{src}/batch_9flush")
    stream_src = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch_*")
    )
    q = (
        attribution_stream(stream_src, watermark=watermark)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return [
        r
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        if r.user_id != FLUSH_USER
    ]


def test_shuffled_stream_settles_exactly_the_batch_touches(
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
    from tests.conftest import assert_state_provider_engaged

    assert_state_provider_engaged(
        str(tmp_path / f"ckpt_attr_{state_provider}"), state_provider
    )
    assert got == expected


def test_lookback_eviction_and_same_instant_purchase_first(spark, tmp_path):
    """The r10 ADVICE case head-on: the same-instant purchase is
    DELIVERED a whole micro-batch before its touch — settlement now
    waits for the watermark, so the touch still earns full credit.
    Also: a touch 8 days stale by purchase time earns nothing."""
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    src = str(tmp_path / "src_edge")
    # batch 1: user 2's purchase (the same-instant pair's LATER-sorted
    # member arrives FIRST) + user 1's stale touch
    spark.createDataFrame(
        [(4, T0, 2, "purchase"), (1, T0, 1, "view")], schema
    ).coalesce(1).write.parquet(f"{src}/batch_1")
    # batch 2: user 2's same-instant touch + user 1's late purchase
    spark.createDataFrame(
        [(5, T0, 2, "view"), (2, T0 + dt.timedelta(days=8), 1, "purchase")], schema
    ).coalesce(1).write.parquet(f"{src}/batch_2")
    spark.createDataFrame(
        [(9, T0 + dt.timedelta(days=60), FLUSH_USER, "flush")], schema
    ).coalesce(1).write.parquet(f"{src}/batch_3")
    stream_src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch_*")
    )
    q = (
        attribution_stream(stream_src, watermark="30 days")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("attr_edge")
        .option("checkpointLocation", str(tmp_path / "ckpt_edge"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    out = [
        r
        for r in spark.sql("SELECT * FROM attr_edge").collect()
        if r.user_id != FLUSH_USER
    ]
    assert len(out) == 1
    r = out[0]
    assert (r.user_id, r.conv_id, r.event_type, r.pos, r.n) == (2, 4, "view", 1, 1)
    assert r.linear_credit == 1.0 and r.position_credit == 1.0


def test_restart_settles_each_touch_once(spark, tmp_path, sf_dir):
    import shutil

    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 5 == 0)
    staging = str(tmp_path / "staging")
    src = str(tmp_path / "src")
    ordered = events.withColumn(
        "__q", F.ntile(4).over(Window.orderBy(F.xxhash64("event_id")))
    )
    for q in range(1, 5):
        ordered.filter(F.col("__q") == q).drop("__q").coalesce(1).write.parquet(
            f"{staging}/batch_{q}"
        )
    _flush_row(spark, events).coalesce(1).write.parquet(f"{staging}/batch_5")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def _run():
        stream_src = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/batch_*")
        )
        q = (
            attribution_stream(stream_src, watermark="40 days")
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
    for b in (3, 4, 5):
        shutil.copytree(f"{staging}/batch_{b}", f"{src}/batch_{b}")
    _run()
    streamed = Counter(
        (r.conv_id, r.event_type, r.pos, r.n)
        for r in spark.read.parquet(out).collect()
        if r.user_id != FLUSH_USER
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


def test_pending_only_key_state_is_eventually_removed(spark, tmp_path):
    """r11 ADVICE: a user whose only events are SEALED touches (never a
    purchase, nothing buffered) used to get no timeout, so their state
    row lingered in the store forever. The pending-only timeout (wake at
    newest-touch + lookback) must let the eviction empty it and
    state.remove() fire — observable as stateOperators.numRowsTotal
    dropping to just the still-live flush key on the final batch."""
    schema = "event_id bigint, ts timestamp, user_id bigint, event_type string"
    src = str(tmp_path / "src_silent")
    # batch 1: user 1's lone touch, then silence forever
    spark.createDataFrame([(1, T0, 1, "view")], schema).coalesce(1).write.parquet(
        f"{src}/batch_1"
    )
    # batch 2: advance the watermark past T0 (seals the touch → pending)
    spark.createDataFrame(
        [(8, T0 + dt.timedelta(days=40), FLUSH_USER, "flush")], schema
    ).coalesce(1).write.parquet(f"{src}/batch_2")
    # batch 3: advance it past T0 + lookback(7d) so the pending-only
    # timeout fires and the eviction empties user 1's pending list
    spark.createDataFrame(
        [(9, T0 + dt.timedelta(days=80), FLUSH_USER, "flush")], schema
    ).coalesce(1).write.parquet(f"{src}/batch_3")
    stream_src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch_*")
    )
    q = (
        attribution_stream(stream_src, watermark="30 days")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("attr_silent")
        .option("checkpointLocation", str(tmp_path / "ckpt_silent"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    last_rows = [
        p["stateOperators"][0]["numRowsTotal"]
        for p in (pr.asDict(recursive=True) if hasattr(pr, "asDict") else pr for pr in q.recentProgress)
        if p.get("stateOperators")
    ]
    assert last_rows, "no state-operator progress recorded"
    # only the flush key (whose newest touch is still inside the
    # lookback at the final watermark) may remain; user 1 must be gone
    assert last_rows[-1] <= 1, (
        f"pending-only key state lingered: numRowsTotal={last_rows[-1]} "
        f"(history {last_rows})"
    )
    assert spark.sql(
        "SELECT count(*) AS n FROM attr_silent WHERE user_id = 1"
    ).first().n == 0  # the touch never settles — no purchase ever


def test_position_weights_sum_to_one():
    for n in (1, 2, 3, 4, 10, 100):
        assert abs(sum(position_weight(p, n) for p in range(1, n + 1)) - 1.0) < 1e-12
