"""Behavior checks for the TWAP and PPS-sampling operators beyond the
oracle hash: the day-stitch must equal the global-lead spelling row for
row, and the systematic draw must actually weight by size."""

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.operators.twap import time_weighted_value
from cdc_stream_batch_etl_spark.text.pps_sample import pps_token_sample


def test_day_stitch_equals_global_lead(spark, sf_dir):
    # The scale-safe (type, day)-partitioned successor must reproduce
    # the naive global-lead TWAP exactly.
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    naive = (
        ev.select(
            "event_type",
            F.col("value").cast("decimal(12,2)").alias("v"),
            (F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts"))
            .cast("decimal(16,0)")
            .alias("dt_us"),
        )
        .filter(F.col("dt_us").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n_intervals"),
            F.sum("dt_us").alias("sd"),
            F.sum(F.col("v") * F.col("dt_us")).alias("sv"),
        )
    )
    got = {r.event_type: r for r in time_weighted_value(spark, sf_dir).collect()}
    for r in naive.collect():
        g = got[r.event_type]
        assert g.n_intervals == r.n_intervals
        assert g.total_seconds == float(r.sd) / 1e6
        assert g.twap_r == round(float(r.sv) / float(r.sd), 6)


def test_pps_draw_favors_heavy_documents(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    picked = pps_token_sample(spark, sf_dir).select("doc_id")
    flagged = docs.join(
        picked.withColumn("hit", F.lit(1)), "doc_id", "left"
    ).withColumn("hit", F.coalesce("hit", F.lit(0)))
    stats = flagged.groupBy("hit").agg(F.avg("n_chars").alias("m")).collect()
    means = {r.hit: r.m for r in stats}
    assert 0 in means and 1 in means, "draw was degenerate (all or nothing)"
    # Probability proportional to size => picked docs are heavier on avg.
    assert means[1] > means[0], means
