"""Gap-fill resample behavior on a PLANTED sparse series — the driver
testdata is dense at small SF, so the forward-fill / staleness branches
need a fixture with real holes: leading inactivity, an interior 3-day
gap, and a key whose first activity starts late."""

import datetime as dt

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.operators.resample import resample_daily


def _ev(spark, rows):
    return spark.createDataFrame(
        [(t, dt.datetime(2024, 3, d, 12, 0, 0), float(v)) for (t, d, v) in rows],
        "event_type string, ts timestamp, value double",
    )


def test_gap_runs_carry_and_staleness(spark):
    # Key "a": active day 1 (10.0), gap days 2-4, active day 5 (20.0).
    # Key "b": first active day 3 (7.5) — days 1-2 precede any activity.
    ev = _ev(
        spark,
        [("a", 1, 4.0), ("a", 1, 6.0), ("a", 5, 20.0), ("b", 3, 7.5)],
    )
    out = {
        (r.event_type, r.day.day): r
        for r in resample_daily(ev).collect()
    }
    # Dense grid: both keys get all 5 days of the global span.
    assert len(out) == 10

    a = [out[("a", d)] for d in range(1, 6)]
    assert [r.active for r in a] == [1, 0, 0, 0, 1]
    assert [r.revenue for r in a] == [10.0, 0.0, 0.0, 0.0, 20.0]
    # Carry holds day 1's revenue through the gap, then jumps on day 5.
    assert [r.carried_revenue for r in a] == [10.0, 10.0, 10.0, 10.0, 20.0]
    assert [r.days_since_active for r in a] == [0, 1, 2, 3, 0]

    b = [out[("b", d)] for d in range(1, 6)]
    # Before first activity: zero carry, -1 staleness sentinel.
    assert [r.active for r in b] == [0, 0, 1, 0, 0]
    assert [r.carried_revenue for r in b] == [0.0, 0.0, 7.5, 7.5, 7.5]
    assert [r.days_since_active for r in b] == [-1, -1, 0, 1, 2]


def test_grid_is_calendar_sized_and_dense(spark, sf_dir):
    from cdc_stream_batch_etl_spark.operators.resample import (
        gap_filled_daily_revenue,
    )

    out = gap_filled_daily_revenue(spark, sf_dir)
    counts = (
        out.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.countDistinct("day").alias("nd"))
        .collect()
    )
    # Every key carries the same dense span, one row per day.
    ns = {r.n for r in counts}
    assert len(ns) == 1
    assert all(r.n == r.nd for r in counts)
