"""Windowed top-N ("trending products") stream/batch parity: the
chained-aggregation rank (collect → sort → slice, no rank() window)
must produce identical sealed-window rows in append-mode streaming and
in a plain batch run, and the per-window arrays must genuinely be the
top-N (cross-checked against an independent rank() computation on the
batch side)."""

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.streaming.analytics import trending_products_stream


def test_batch_topn_agrees_with_rank_window(spark, sf_dir):
    events = load_table(spark, sf_dir, "events")
    got = {
        (r.window_start, r.rank, r.product_k, r.total_value)
        for r in trending_products_stream(events, n=3).collect()
    }
    assert got, "no purchase windows at all"

    per = (
        events.filter(F.col("event_type") == "purchase")
        .groupBy(
            F.get_json_object("props", "$.k").cast("int").alias("product_k"),
            F.window("ts", "1 hour").alias("w"),
        )
        .agg(
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value")
        )
    )
    rk = F.row_number().over(
        Window.partitionBy("w").orderBy(F.desc("total_value"), F.desc("product_k"))
    )
    want = {
        (r.ws, r.rank, r.product_k, r.total_value)
        for r in per.withColumn("rank", rk.cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select(F.col("w.start").alias("ws"), "rank", "product_k", "total_value")
        .collect()
    }
    assert got == want


def test_trending_stream_matches_batch_on_sealed_windows(spark, tmp_path, sf_dir):
    events = load_table(spark, sf_dir, "events")
    batch = {
        (r.window_start, r.rank, r.product_k, r.total_value)
        for r in trending_products_stream(events).collect()
    }

    # time-ordered micro-batches, as a real feed would deliver
    src = str(tmp_path / "events_src")
    ordered = events.withColumn("__q", F.ntile(4).over(Window.orderBy("ts")))
    for q in range(1, 5):
        ordered.filter(F.col("__q") == q).drop("__q").coalesce(1).write.parquet(
            f"{src}/batch_{q}"
        )
    stream_src = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch_*")
    )
    q = (
        trending_products_stream(stream_src)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("trending_out")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    stream = {
        (r.window_start, r.rank, r.product_k, r.total_value)
        for r in spark.sql("SELECT * FROM trending_out").collect()
    }

    assert stream <= batch, sorted(stream - batch)[:3]
    # every window sealed by the final watermark must have streamed:
    # watermark = max_ts - 10 min; a 1-hour window whose END is older
    # than that has emitted
    max_ts = events.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - dt.timedelta(minutes=10) - dt.timedelta(hours=1)
    missing_sealed = {r for r in (batch - stream) if r[0] < cutoff}
    assert not missing_sealed, sorted(missing_sealed)[:3]
    assert stream, "no sealed windows streamed at all"
