"""revenue_decomposition invariants: additive reconstruction, centered
seasonality, full-window trimming, and a planted constant series."""

import datetime as dt

import cdc_stream_batch_etl_spark.operators.decompose as dc


def test_reconstruction_and_centering(spark, sf_dir):
    rows = dc.revenue_decomposition(spark, sf_dir).collect()
    assert rows, "full-window days must exist"
    for r in rows:
        assert abs(r.trend + r.seasonal + r.residual - r.revenue) < 1e-6
        assert r.weekday == (r.epoch_day + 3) % 7
    # re-centered weekday effects: the weighted seasonal mean is ~0
    assert abs(sum(r.seasonal for r in rows)) / len(rows) < 1e-6
    # consecutive epoch days (full windows only — edges trimmed)
    days = sorted(r.epoch_day for r in rows)
    assert days[0] > 0 and len(set(days)) == len(days)


def test_constant_series_has_zero_seasonal_and_residual(spark):
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, 1, "O", 700.0, base + dt.timedelta(days=i), "1-URGENT")
        for i in range(21)
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    orig = dc.load_table
    try:
        dc.load_table = lambda s, d, t: df  # noqa: ARG005
        out = dc.revenue_decomposition(spark, "x").collect()
    finally:
        dc.load_table = orig
    # 21 days minus 3 trimmed on each edge
    assert len(out) == 15
    for r in out:
        assert r.revenue == 700.0
        assert abs(r.trend - 700.0) < 1e-9
        assert abs(r.seasonal) < 1e-9 and abs(r.residual) < 1e-9


def test_calendar_gap_days_are_trimmed(spark):
    base = dt.datetime(2024, 1, 1)
    # a hole at day 10: days 8..12 lose their full 7-day window
    rows = [
        (i, 1, "O", 100.0, base + dt.timedelta(days=i), "1-URGENT")
        for i in range(21)
        if i != 10
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    orig = dc.load_table
    try:
        dc.load_table = lambda s, d, t: df  # noqa: ARG005
        out = {r.epoch_day - 19723 for r in dc.revenue_decomposition(spark, "x").collect()}
    finally:
        dc.load_table = orig
    # epoch_day of 2024-01-01 is 19723; full windows exclude edges and
    # every day within 3 of the hole
    assert out == {3, 4, 5, 6, 14, 15, 16, 17}
