"""Stream/batch parity for transition extraction: the streamed
(prev, next) pair multiset must equal the batch lead() window exactly,
across micro-batch boundaries (the carried-state transition) and under
both state-store providers. Also restart-resumes from the checkpoint
without duplicating or dropping the boundary pair."""

from collections import Counter

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.streaming.transitions_stream import (
    user_transitions_stream,
)


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


def _write_ordered_batches(events, src, n=4):
    ordered = events.withColumn("__q", F.ntile(n).over(Window.orderBy("ts", "event_id")))
    for q in range(1, n + 1):
        ordered.filter(F.col("__q") == q).drop("__q").coalesce(1).write.parquet(
            f"{src}/batch_{q}"
        )


def test_stream_matches_batch_lead(spark, tmp_path, sf_dir, state_provider):
    events = load_table(spark, sf_dir, "events")
    batch = Counter((r.user_id, r.prev_type, r.next_type) for r in _batch_pairs(events))

    src = str(tmp_path / "ev_src")
    _write_ordered_batches(events, src)
    stream_src = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch_*")
    )
    ckpt = str(tmp_path / "ckpt")
    q = (
        user_transitions_stream(stream_src)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("trans_out")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    stream = Counter(
        (r.user_id, r.prev_type, r.next_type)
        for r in spark.sql("SELECT * FROM trans_out").collect()
    )
    from tests.conftest import assert_state_provider_engaged

    assert_state_provider_engaged(ckpt, state_provider)
    assert stream == batch


def test_restart_resumes_without_dup_or_loss(spark, tmp_path, sf_dir):
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") % 7 == 0)
    batch = Counter((r.user_id, r.prev_type, r.next_type) for r in _batch_pairs(events))

    src = str(tmp_path / "ev_src")
    staging = str(tmp_path / "staging")
    _write_ordered_batches(events, staging)
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
            user_transitions_stream(stream_src)
            .writeStream.foreachBatch(
                lambda df, _: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    # first run sees only the first two files; the restart (same
    # checkpoint, same source glob) picks up the files added after the
    # stop — pairs bridging the stop point must appear exactly once
    for b in (1, 2):
        shutil.copytree(f"{staging}/batch_{b}", f"{src}/batch_{b}")
    _run()
    for b in (3, 4):
        shutil.copytree(f"{staging}/batch_{b}", f"{src}/batch_{b}")
    _run()
    streamed = Counter(
        (r.user_id, r.prev_type, r.next_type)
        for r in spark.read.parquet(out).collect()
    )
    assert streamed == batch


def test_boundary_transition_uses_carried_state(spark, tmp_path):
    import datetime as dt

    rows = [
        (1, dt.datetime(2024, 1, 1, 0, 0, 0), 5, "view"),
        (2, dt.datetime(2024, 1, 1, 0, 0, 10), 5, "purchase"),
    ]
    events = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    src = str(tmp_path / "ev2")
    # one event per file: the only pair must bridge the two micro-batches
    for i, eid in enumerate((1, 2), 1):
        events.filter(F.col("event_id") == eid).coalesce(1).write.parquet(
            f"{src}/batch_{i}"
        )
    stream_src = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch_*")
    )
    q = (
        user_transitions_stream(stream_src)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("trans_c")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM trans_c").collect()
    assert len(out) == 1
    r = out[0]
    assert (r.prev_type, r.next_type) == ("view", "purchase")
    assert r.next_ts_us - r.prev_ts_us == 10_000_000
