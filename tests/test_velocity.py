"""Trailing-window RANGE-frame boundaries, hand-checked: the frame is
inclusive at exactly -1h, excludes 1h+1s, and ts-ties see each other
(value-based frame semantics)."""

import datetime as dt

from pyspark.sql import functions as F

import cdc_stream_batch_etl_spark.operators.velocity as vel
from cdc_stream_batch_etl_spark.operators.velocity import trailing_window_rate


def test_range_frame_boundaries_and_ties(spark):
    t0 = dt.datetime(2024, 7, 1, 12, 0, 0)
    rows = [
        (1, t0, 1, 10.0),
        (2, t0 + dt.timedelta(seconds=3600), 1, 20.0),   # exactly 1h: IN
        (3, t0 + dt.timedelta(seconds=7201), 1, 30.0),   # 1h+1s after #2: OUT
        (4, t0 + dt.timedelta(seconds=7201), 1, 40.0),   # tie with #3: sees it
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    orig = vel.load_table
    vel.load_table = lambda spark, sf_dir, name: ev
    try:
        out = {r.event_id: r for r in trailing_window_rate(spark, "x").collect()}
    finally:
        vel.load_table = orig
    assert out[1].n_trailing == 1
    assert (out[2].n_trailing, out[2].trailing_value) == (2, 30.0)  # 1h inclusive
    # ts ties: both rows at +7201s count each other, #2 already aged out
    assert out[3].n_trailing == 2 and out[4].n_trailing == 2
    assert out[3].trailing_value == 70.0 == out[4].trailing_value
    assert all(r.is_burst == 0 for r in out.values())


def test_burst_flag_fires(spark, sf_dir):
    out = trailing_window_rate(spark, sf_dir)
    n_burst = out.filter(F.col("is_burst") == 1).count()
    # consistency: burst rows are exactly those at/over the threshold
    assert n_burst == out.filter(F.col("n_trailing") >= vel.BURST_N).count()
