"""Stream/batch parity for transition extraction under the r11
watermark-sealed contract: events may arrive in ANY order within the
watermark horizon and the streamed (prev, next) pair multiset must
still equal the batch lead() window exactly — arbitrary cross-batch
permutation under a covering horizon (both state-store providers),
bounded-displacement jitter under a small horizon (incremental
sealing), and checkpoint-restart without duplicating or dropping
boundary pairs."""

import datetime as dt
from collections import Counter

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.streaming.transitions_stream import (
    user_transitions_stream,
)

#: sentinel key whose single far-future event advances the global
#: watermark past every real event so the trailing no-data batch's
#: timeout seals them all; it forms no pair itself (one event) and is
#: excluded from every comparison
FLUSH_USER = -999


def _batch_pairs(events):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        events.select(
            "user_id",
            F.col("event_type").alias("prev_type"),
            F.lead("event_type").over(w).alias("next_type"),
        )
        .filter(F.col("next_type").isNotNull())
        .collect()
    )


def _flush_row(spark, events, days_past_max=45):
    max_ts = events.agg(F.max("ts")).first()[0]
    return spark.createDataFrame(
        [(10**9, max_ts + dt.timedelta(days=days_past_max), FLUSH_USER, "flush", 0.0, None)],
        events.schema,
    )


def _write_batches(events, src, order_key, n=4):
    """Split into n micro-batch files by order_key arrival order."""
    ordered = events.withColumn("__q", F.ntile(n).over(Window.orderBy(order_key)))
    for q in range(1, n + 1):
        ordered.filter(F.col("__q") == q).drop("__q").coalesce(1).write.parquet(
            f"{src}/batch_{q}"
        )


def _run_stream(spark, events, src, ckpt, name, watermark):
    stream_src = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch_*")
    )
    q = (
        user_transitions_stream(stream_src, watermark=watermark)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return [
        r
        for r in spark.sql(f"SELECT * FROM {name}").collect()
        if r.user_id != FLUSH_USER
    ]


def test_shuffled_arrivals_match_batch_lead(spark, tmp_path, sf_dir, state_provider):
    """Arbitrary cross-batch permutation (hash arrival order) under a
    horizon covering the whole fixture span — the ordered-log contract
    is gone."""
    events = load_table(spark, sf_dir, "events")
    batch = Counter((r.user_id, r.prev_type, r.next_type) for r in _batch_pairs(events))

    src = str(tmp_path / "ev_src")
    _write_batches(events, src, F.xxhash64("event_id"))
    _flush_row(spark, events).coalesce(1).write.parquet(f"{src}/batch_9flush")
    ckpt = str(tmp_path / "ckpt")
    rows = _run_stream(
        spark, events, src, ckpt, f"trans_{state_provider}", watermark="40 days"
    )
    stream = Counter((r.user_id, r.prev_type, r.next_type) for r in rows)
    from tests.conftest import assert_state_provider_engaged

    assert_state_provider_engaged(ckpt, state_provider)
    assert stream == batch


def test_jittered_arrivals_seal_incrementally(spark, tmp_path, sf_dir):
    """Bounded-displacement reorder (≤2 h jitter) under a 6 h horizon:
    the watermark advances batch-by-batch, sealing as it goes — parity
    must hold without waiting for the flush to settle everything."""
    events = load_table(spark, sf_dir, "events")
    batch = Counter((r.user_id, r.prev_type, r.next_type) for r in _batch_pairs(events))

    jitter_us = F.pmod(F.xxhash64("event_id"), F.lit(2 * 3600 * 1_000_000))
    src = str(tmp_path / "ev_src")
    _write_batches(events, src, F.unix_micros("ts") + jitter_us, n=8)
    _flush_row(spark, events).coalesce(1).write.parquet(f"{src}/batch_9flush")
    rows = _run_stream(
        spark, events, src, str(tmp_path / "ckpt"), "trans_jit", watermark="6 hours"
    )
    stream = Counter((r.user_id, r.prev_type, r.next_type) for r in rows)
    assert stream == batch


def test_restart_resumes_without_dup_or_loss(spark, tmp_path, sf_dir):
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    batch = Counter((r.user_id, r.prev_type, r.next_type) for r in _batch_pairs(events))

    src = str(tmp_path / "ev_src")
    staging = str(tmp_path / "staging")
    _write_batches(events, staging, F.xxhash64("event_id"))
    _flush_row(spark, events).coalesce(1).write.parquet(f"{staging}/batch_5")
    ckpt = str(tmp_path / "ckpt")

    import shutil

    out = str(tmp_path / "out")

    def _run():
        stream_src = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/batch_*")
        )
        q = (
            user_transitions_stream(stream_src, watermark="40 days")
            .writeStream.foreachBatch(
                lambda df, _: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # first run sees only the first two (shuffled) files; the restart
    # picks up the rest plus the flush — pairs bridging the stop point
    # must appear exactly once
    for b in (1, 2):
        shutil.copytree(f"{staging}/batch_{b}", f"{src}/batch_{b}")
    _run()
    for b in (3, 4, 5):
        shutil.copytree(f"{staging}/batch_{b}", f"{src}/batch_{b}")
    _run()
    streamed = Counter(
        (r.user_id, r.prev_type, r.next_type)
        for r in spark.read.parquet(out).collect()
        if r.user_id != FLUSH_USER
    )
    assert streamed == batch


def test_boundary_transition_uses_carried_state(spark, tmp_path):
    """The pair bridging two micro-batches — delivered REVERSED (the
    later event arrives first) — still comes out right once sealed."""
    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 5, "view"),
        (2, dt.datetime(2024, 1, 1, 0, 0, 10), 5, "purchase"),
        (9, dt.datetime(2024, 1, 3), FLUSH_USER, "flush"),
    ]
    events = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    src = str(tmp_path / "ev2")
    # REVERSED arrival: the purchase's file lands before the view's
    for i, eid in enumerate((2, 1, 9), 1):
        events.filter(F.col("event_id") == eid).coalesce(1).write.parquet(
            f"{src}/batch_{i}"
        )
    stream_src = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch_*")
    )
    q = (
        user_transitions_stream(stream_src, watermark="1 hour")
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("trans_c")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = [
        r
        for r in spark.sql("SELECT * FROM trans_c").collect()
        if r.user_id != FLUSH_USER
    ]
    assert len(out) == 1
    r = out[0]
    assert (r.prev_type, r.next_type) == ("view", "purchase")
    assert r.next_ts_us - r.prev_ts_us == 10_000_000
