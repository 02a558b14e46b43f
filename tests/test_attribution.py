"""Multi-touch attribution: planted-path semantics (next-purchase
assignment, lookback cutoff, tie handling) and the conservation
invariant — each attributed conversion distributes exactly 1.0 credit
under both models."""

import datetime as dt

import cdc_stream_batch_etl_spark.operators.attribution as mta


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )


def _run(spark, rows):
    df = _events(spark, rows)
    orig = mta.load_table
    try:
        mta.load_table = lambda s, d, t: df  # noqa: ARG005
        report = mta.multi_touch_attribution(spark, "x").collect()
        touches = mta.attributed_touches(spark, "x").collect()
    finally:
        mta.load_table = orig
    return report, touches


T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _s(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_planted_u_shape_and_lookback(spark):
    rows = [
        # user 1: three touches then a purchase -> 0.4 / 0.2 / 0.4
        (1, _s(0), 1, "view"),
        (2, _s(10), 1, "click"),
        (3, _s(20), 1, "signup"),
        (4, _s(30), 1, "purchase"),
        # user 2: one touch then a purchase -> 1.0 'only'
        (5, _s(0), 2, "view"),
        (6, _s(5), 2, "purchase"),
        # user 3: touch 8 days before its purchase -> outside lookback
        (7, _s(0), 3, "click"),
        (8, _s(8 * 86400), 3, "purchase"),
        # user 4: touch with no purchase at all -> unattributed
        (9, _s(0), 4, "view"),
    ]
    report, touches = _run(spark, rows)
    by_type = {r.event_type: r for r in report}
    assert set(by_type) == {"view", "click", "signup"}
    # user-3 click and user-4 view dropped
    assert by_type["click"].n_touches == 1
    assert by_type["view"].n_touches == 2  # users 1 and 2
    # position credit: view = 0.4 (first of 3) + 1.0 (only) = 1.4
    assert by_type["view"].position_credit == 1.4
    assert by_type["click"].position_credit == 0.2
    assert by_type["signup"].position_credit == 0.4
    # linear credit: view = 1/3 + 1, click = 1/3, signup = 1/3
    assert abs(by_type["view"].linear_credit - (1 / 3 + 1)) < 1e-9
    # first/last: 'only' counts as both
    assert by_type["view"].first_touches == 2
    assert by_type["view"].last_touches == 1
    assert by_type["signup"].last_touches == 1
    assert len(touches) == 4


def test_equal_ts_purchase_is_inclusive_and_min_id_wins(spark):
    rows = [
        (1, _s(0), 1, "view"),  # same instant as both purchases
        (2, _s(0), 1, "purchase"),
        (3, _s(0), 1, "purchase"),
    ]
    _, touches = _run(spark, rows)
    assert len(touches) == 1
    assert touches[0].conv_id == 2  # smallest event_id among simultaneous


def test_two_touch_split_is_half_half(spark):
    rows = [
        (1, _s(0), 1, "view"),
        (2, _s(1), 1, "click"),
        (3, _s(2), 1, "purchase"),
    ]
    report, _ = _run(spark, rows)
    by_type = {r.event_type: r for r in report}
    assert by_type["view"].position_credit == 0.5
    assert by_type["click"].position_credit == 0.5


def test_credit_conservation_on_driver_data(spark, sf_dir):
    touches = mta.attributed_touches(spark, sf_dir)
    n_convs = touches.select("conv_id").distinct().count()
    report = mta.multi_touch_attribution(spark, sf_dir).collect()
    assert abs(sum(r.linear_credit for r in report) - n_convs) < 1e-6
    assert abs(sum(r.position_credit for r in report) - n_convs) < 1e-6
