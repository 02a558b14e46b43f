"""Linear-interpolation behavior on a PLANTED sparse series — the
driver testdata is dense at small SF, so the 'interp' and 'edge'
branches need real holes: an interior 3-day gap (non-trivial slope)
and a key active only mid-span (edges on both sides)."""

import datetime as dt

from cdc_stream_batch_etl_spark.operators.interpolate import interpolate_daily


def _ev(spark, rows):
    return spark.createDataFrame(
        [(t, dt.datetime(2024, 3, d, 12, 0, 0), float(v)) for (t, d, v) in rows],
        "event_type string, ts timestamp, value double",
    )


def test_interior_gap_is_linear_and_edges_are_null(spark):
    # Key "a": 10.00 on day 1, 22.00 on day 5 — gap days 2-4 must land
    # exactly on the line (13.0, 16.0, 19.0).
    # Key "b": active only day 3 — days 1-2 and 4-5 are edges (NULL).
    ev = _ev(
        spark,
        [("a", 1, 4.0), ("a", 1, 6.0), ("a", 5, 22.0), ("b", 3, 7.5)],
    )
    out = {(r.event_type, r.day.day): r for r in interpolate_daily(ev).collect()}
    assert len(out) == 10  # dense 5-day grid x 2 keys

    a = [out[("a", d)] for d in range(1, 6)]
    assert [r.method for r in a] == [
        "observed", "interp", "interp", "interp", "observed",
    ]
    assert [r.value_r for r in a] == [10.0, 13.0, 16.0, 19.0, 22.0]
    assert [r.active for r in a] == [1, 0, 0, 0, 1]

    b = [out[("b", d)] for d in range(1, 6)]
    assert [r.method for r in b] == ["edge", "edge", "observed", "edge", "edge"]
    assert [r.value_r for r in b] == [None, None, 7.5, None, None]


def test_fractional_slope_rounds_to_six(spark):
    # 1.00 on day 1, 2.00 on day 4: gap values 1+1/3, 1+2/3 — exercises
    # the single-division rounding contract (round 6).
    ev = _ev(spark, [("a", 1, 1.0), ("a", 4, 2.0)])
    vals = [
        r.value_r
        for r in interpolate_daily(ev).orderBy("day").collect()
    ]
    assert vals == [1.0, 1.333333, 1.666667, 2.0]
