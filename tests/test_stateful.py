"""applyInPandasWithState operator: running per-customer activity with
TTL state (A21/W3).

Two contracts: (1) state accumulates across micro-batches — within one
TTL horizon the final emission per key equals the batch aggregate;
(2) a key idle past the TTL is evicted and restarts from zero (the
reference's 86400 s Redis TTL, stream_processor.py:111-125)."""

import datetime as dt

import pytest

from cdc_stream_batch_etl_spark.streaming.stateful import customer_activity_stateful

T0 = dt.datetime(2026, 1, 5, 12, 0, 0)


def _ev(user, minutes_offset, value, etype="purchase"):
    return (
        f"u{user}-{minutes_offset}",
        T0 + dt.timedelta(minutes=minutes_offset),
        etype,
        user,
        float(value),
    )


SCHEMA = "event_id string, ts timestamp, event_type string, user_id long, value double"


@pytest.fixture()
def staged_src(spark, tmp_path):
    """Three micro-batch files, timestamps non-decreasing across batches:
    batch 0+1 inside one day (accumulation), batch 2 three days later
    (forces TTL eviction of user 1, who is absent; user 2 reappears)."""
    src = tmp_path / "src"
    src.mkdir()
    batches = [
        [_ev(1, 0, 10.0), _ev(1, 1, 20.0), _ev(2, 2, 5.0), _ev(3, 3, 7.5), _ev(1, 4, 1.0, "view")],
        [_ev(1, 60, 30.0), _ev(2, 61, 15.0)],
        # +3 days: watermark (1 day lag) passes day-0 TTLs -> users 1,2,3
        # evicted; user 2's count restarts at 1
        [_ev(2, 3 * 24 * 60 + 60, 40.0), _ev(4, 3 * 24 * 60 + 61, 2.0)],
    ]
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
            str(src / f"batch_{i}")
        )
    return str(src)


def _run(spark, src, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch_*")
    )
    q = (
        customer_activity_stateful(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_state_accumulates_and_ttl_evicts(spark, staged_src):
    rows = _run(spark, staged_src, "activity_out")
    ms = lambda minutes: int((T0 + dt.timedelta(minutes=minutes)).timestamp() * 1000)

    by_key = {}
    for r in rows:  # keep the newest emission per user
        cur = by_key.get(r.user_id)
        if cur is None or r.last_order_ts_ms >= cur.last_order_ts_ms:
            by_key[r.user_id] = r

    # user 1: 2 purchases batch 0 (view excluded) + 1 in batch 1, no TTL hit yet
    u1 = by_key[1]
    assert (u1.order_count_today, u1.total_value_today) == (3, 60.0)
    assert u1.last_order_ts_ms == ms(60)
    assert u1.last_order_amount == 30.0

    # user 2: accumulated to 2 by batch 1, then EVICTED (idle > 24h) and
    # restarted — final state is count 1 from batch 2 only
    u2 = by_key[2]
    assert (u2.order_count_today, u2.total_value_today) == (1, 40.0)
    assert u2.last_order_ts_ms == ms(3 * 24 * 60 + 60)

    # the pre-eviction emission for user 2 must ALSO have been produced
    u2_all = sorted(
        ((r.order_count_today, r.total_value_today) for r in rows if r.user_id == 2)
    )
    assert (2, 20.0) in u2_all, f"missing pre-eviction state: {u2_all}"

    assert (by_key[3].order_count_today, by_key[3].total_value_today) == (1, 7.5)
    assert (by_key[4].order_count_today, by_key[4].total_value_today) == (1, 2.0)


def test_in_batch_ttl_gap_resets_even_out_of_order(spark, tmp_path):
    """A >TTL gap BETWEEN events inside ONE batch must reset the running
    counters, and the decision must use the batch-wide event-time order —
    not per-Arrow-chunk arrival order (the events arrive out of order
    here). Reference semantics: Redis access-time expiry."""
    src = tmp_path / "src"
    src.mkdir()
    # one batch, arrival order scrambled: day-3 event first, then day-0
    # events. Event-time order is day-0 (two events), >24h gap, day-3.
    rows = [
        _ev(9, 3 * 24 * 60, 40.0),
        _ev(9, 0, 10.0),
        _ev(9, 1, 20.0),
    ]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(str(src / "batch_0"))
    out = _run(spark, str(src), "activity_gap_out")
    final = max(out, key=lambda r: r.last_order_ts_ms)
    # only the post-gap event survives in the running counters
    assert (final.order_count_today, final.total_value_today) == (1, 40.0)
    assert final.last_order_amount == 40.0


def test_batch_frame_same_epoch_logic(spark):
    """The batch path (applyInPandas — applyInPandasWithState is
    stream-only) must apply the identical in-batch TTL-gap epoch logic:
    pre-gap purchases drop out of the running counters."""
    rows = [
        _ev(9, 3 * 24 * 60, 40.0),
        _ev(9, 0, 10.0),
        _ev(9, 1, 20.0),
        _ev(7, 5, 12.5),
        _ev(7, 6, 2.5),
        _ev(7, 7, 99.0, "view"),  # non-purchase excluded
    ]
    out = {r.user_id: r for r in customer_activity_stateful(
        spark.createDataFrame(rows, SCHEMA)
    ).collect()}
    assert (out[9].order_count_today, out[9].total_value_today) == (1, 40.0)
    assert (out[7].order_count_today, out[7].total_value_today) == (2, 15.0)
    assert out[7].last_order_amount == 2.5
