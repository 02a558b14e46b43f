"""pipeline_health: degraded inputs actually move the score/banding
(the oracle row checks the healthy path; this checks the unhealthy ones)."""

import os

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.operators.monitoring import pipeline_health


def _degraded_sf_dir(spark, tmp_path, sf_dir, drop_table=None, errors_only=False):
    """A synthetic sf_dir: symlink the real tables, optionally empty one
    out or replace events with an all-error slice. Rewrites go through a
    RAW spark.read so the physical schema (ts stored as int64 nanos)
    survives — catalog.load_table decodes it."""
    d = tmp_path / "sf"
    d.mkdir()
    for t in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        src = f"{sf_dir}/{t}.parquet"
        if t == drop_table:
            spark.read.parquet(src).limit(0).write.parquet(f"{d}/{t}.parquet")
        elif t == "events" and errors_only:
            spark.read.parquet(src).withColumn(
                "event_type", F.lit("error")
            ).write.parquet(f"{d}/{t}.parquet")
        else:
            os.symlink(src, d / f"{t}.parquet")
    return str(d)


def test_healthy_corpus_scores_excellent(spark, sf_dir):
    row = pipeline_health(spark, sf_dir).first()
    assert row.sources_available == 5
    assert row.connector_points == 20.0
    assert row.health_score >= 90
    assert row.health_status == "excellent"


def test_empty_source_drops_connector_and_topic_points(spark, sf_dir, tmp_path):
    deg = _degraded_sf_dir(spark, tmp_path, sf_dir, drop_table="part")
    row = pipeline_health(spark, deg).first()
    assert row.sources_available == 4
    assert row.connector_points == 0.0
    assert row.topic_points == 16.0
    assert row.health_status in ("good", "warning")


def test_all_error_events_drop_success_points(spark, sf_dir, tmp_path):
    deg = _degraded_sf_dir(spark, tmp_path, sf_dir, errors_only=True)
    row = pipeline_health(spark, deg).first()
    assert row.success_points == 0.0
    assert row.health_score == 80.0


def test_single_row_broadcast_plan(spark, sf_dir):
    from cdc_stream_batch_etl_spark.plans.inspect import profile

    df = pipeline_health(spark, sf_dir)
    p = profile(df)
    assert p.scans == 7  # five counts + events agg + orders FK agg
    assert p.n_sortmerge_joins == 0  # 1-row sides must never sort-merge
    assert df.count() == 1
