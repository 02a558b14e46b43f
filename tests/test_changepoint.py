"""CUSUM detector on a planted level shift: a series flat at 10 for 10
days then flat at 50 must locate the change at the last low day, with
direction 'up'; a constant series must report magnitude 0."""

import datetime as dt
from decimal import Decimal

from cdc_stream_batch_etl_spark.operators.changepoint import cusum_changepoint


def _daily(spark, rows):
    return spark.createDataFrame(
        [(t, dt.date(2024, 5, d), Decimal(v).quantize(Decimal("0.01"))) for t, d, v in rows],
        "event_type string, day date, x decimal(18,2)",
    )


def test_planted_step_located(spark):
    rows = [("a", d, 10) for d in range(1, 11)] + [
        ("a", d, 50) for d in range(11, 21)
    ]
    out = cusum_changepoint(_daily(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    # CUSUM is most negative at the end of the low regime.
    assert r.changepoint_day == dt.date(2024, 5, 10)
    assert r.shift_direction == "up"
    # |CUSUM|/n at day 10: mean=30, ten days of (10-30) => 200/..., the
    # n-rescaled spelling divides back by n: 10*|10-30| = 200.
    assert r.cusum_magnitude_r == 200.0


def test_constant_series_zero_magnitude(spark):
    rows = [("b", d, 7) for d in range(1, 15)]
    r = cusum_changepoint(_daily(spark, rows)).collect()[0]
    assert r.cusum_magnitude_r == 0.0
    # argmax ties on |0| everywhere -> earliest day wins, deterministic
    assert r.changepoint_day == dt.date(2024, 5, 1)
