"""Streaming count-min contracts: final counters equal the batch sketch
exactly (additive monoid + checkpointed offsets), across adversarial
micro-batching and a kill-restart."""

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.operators.sketches import countmin_sketch
from cdc_stream_batch_etl_spark.streaming.cms_stream import cms_stream


def _final_counters(spark, out):
    """Latest emission per (depth, bucket) by micro-batch id — counters
    only grow, but bid is the unambiguous 'latest' key."""
    final = {}
    for r in spark.read.parquet(out).collect():
        k = (r.depth, r.bucket)
        prev = final.get(k)
        if prev is None or r.bid > prev.bid:
            final[k] = r
    return {k: r.counter for k, r in final.items()}


def _run_stream(spark, ev, src, out, ckpt):
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/b*")
    )
    q = (
        cms_stream(stream)
        .writeStream.foreachBatch(
            lambda bdf, bid: bdf.withColumn("bid", F.lit(bid))
            .write.mode("append")
            .parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def test_cms_stream_final_equals_batch(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    n = ev.count()
    # uneven, reverse-ordered files — adversarial batching
    ev.orderBy(F.desc("event_id")).limit(n // 4).coalesce(1).write.parquet(
        str(src / "b0")
    )
    ev.orderBy(F.desc("event_id")).offset(n // 4).coalesce(1).write.parquet(
        str(src / "b1")
    )
    _run_stream(spark, ev, src, out, str(tmp_path / "ckpt"))

    stream_final = _final_counters(spark, out)
    batch = {
        (r.depth, r.bucket): r.counter
        for r in countmin_sketch(spark, sf_dir).collect()
    }
    assert stream_final == batch


def test_cms_stream_restart_resumes_counters(spark, sf_dir, tmp_path, state_provider):
    """Counters are NOT idempotent under replay — this asserts the
    checkpointed offset log prevents double counting across a
    kill-restart."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    n = ev.count()
    ev.limit(n // 3).coalesce(1).write.parquet(str(src / "b0"))
    _run_stream(spark, ev, src, out, ckpt)  # phase 1, then "crash"
    ev.offset(n // 3).coalesce(1).write.parquet(str(src / "b1"))
    _run_stream(spark, ev, src, out, ckpt)  # restart on the same checkpoint

    stream_final = _final_counters(spark, out)
    batch = {
        (r.depth, r.bucket): r.counter
        for r in countmin_sketch(spark, sf_dir).collect()
    }
    assert stream_final == batch
    from tests.conftest import assert_state_provider_engaged

    assert_state_provider_engaged(ckpt, state_provider)
