"""Streaming CUSUM (streaming/cusum_stream.py): the phased
calibrate-then-chart state machine carries across micro-batches, the
fold is event-time-deterministic, alarms fire exactly when Page's
recurrence says so, and kill-restart resumes the chart exactly once."""

import datetime as dt
import math

import pytest

from cdc_stream_batch_etl_spark.streaming.cusum_stream import (
    CAL_N,
    H_SIGMA,
    K_SIGMA,
    cusum_stateful,
)

T0 = dt.datetime(2026, 1, 5, 12, 0, 0)
SCHEMA = "event_id string, ts timestamp, event_type string, user_id long, value double"


def _ev(i, minutes, value, etype="purchase"):
    return (f"e{i:04d}", T0 + dt.timedelta(minutes=minutes), etype, 1, float(value))


def _expected(values):
    """Plain-python phased fold — the module contract, re-derived."""
    n = 0
    s = ss = mu0 = k = h = sp = sn = 0.0
    a_up = a_dn = 0
    for v in values:
        v = float(v)
        if n < CAL_N:
            s += v
            ss += v * v
            n += 1
            if n == CAL_N:
                mu0 = s / CAL_N
                var = ss / CAL_N - mu0 * mu0
                sigma = math.sqrt(var) if var > 0 else 0.0
                k, h = K_SIGMA * sigma, H_SIGMA * sigma
            continue
        sp = max(0.0, sp + (v - mu0 - k))
        sn = max(0.0, sn - (v - mu0 + k))
        n += 1
        if sp > h:
            a_up += 1
        if sn > h:
            a_dn += 1
    return n, mu0, k, h, sp, sn, a_up, a_dn


@pytest.fixture()
def staged_src(spark, tmp_path):
    """Batch 0: 20 stable values ~100 (calibrates at 16, charts 4).
    Batch 1: 6 values ~130 — a sustained upward shift far past h."""
    src = tmp_path / "src"
    src.mkdir()
    stable = [_ev(i, i, 100.0 + (i % 4)) for i in range(20)]
    shifted = [_ev(100 + i, 100 + i, 130.0 + i) for i in range(6)]
    for b, rows in enumerate([stable, shifted]):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(str(src / f"batch_{b}"))
    return str(src), stable, shifted


def _run(spark, src, name, ckpt=None):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch_*")
    )
    w = (
        cusum_stateful(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
    )
    if ckpt:
        w = w.option("checkpointLocation", ckpt)
    q = w.start()
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name} ORDER BY n_events").collect()


def test_phased_state_carries_and_alarm_fires(spark, staged_src):
    src, stable, shifted = staged_src
    rows = _run(spark, src, "cusum_out")
    assert len(rows) == 2  # one emission per micro-batch

    vals0 = [r[4] for r in stable]
    n0, mu0, k0, h0, sp0, sn0, au0, ad0 = _expected(vals0)
    first, second = rows
    assert first.n_events == n0 == 20 and first.calibrated
    assert first.mu0 == pytest.approx(mu0, abs=0.0)  # same IEEE fold
    assert (first.k, first.h) == (pytest.approx(k0, abs=0.0), pytest.approx(h0, abs=0.0))
    assert first.s_up == pytest.approx(sp0, abs=0.0)
    assert (first.n_alarms_up, first.n_alarms_down) == (au0, ad0)
    assert not first.alarm_in_batch  # stable history: no crossing

    vals1 = vals0 + [r[4] for r in shifted]
    n1, _, _, _, sp1, sn1, au1, ad1 = _expected(vals1)
    assert second.n_events == n1 == 26
    assert second.s_up == pytest.approx(sp1, abs=0.0)
    assert (second.n_alarms_up, second.n_alarms_down) == (au1, ad1)
    assert au1 > au0  # the shift must actually alarm
    assert second.alarm_in_batch


def test_batch_twin_matches_stream_final_state(spark, staged_src):
    src, stable, shifted = staged_src
    stream_rows = _run(spark, src, "cusum_twin_stream")
    final = stream_rows[-1]
    batch_df = spark.createDataFrame(stable + shifted, SCHEMA)
    batch = cusum_stateful(batch_df).collect()[0]
    for f in (
        "n_events",
        "calibrated",
        "mu0",
        "k",
        "h",
        "s_up",
        "s_down",
        "n_alarms_up",
        "n_alarms_down",
    ):
        assert getattr(batch, f) == getattr(final, f), f


def test_scrambled_arrival_order_same_fold(spark, tmp_path):
    """Within a micro-batch the (ts, event_id) sort erases arrival
    order: writing the same events scrambled gives an identical fold."""
    vals = [100.0 + ((7 * i) % 11) for i in range(CAL_N + 8)]
    rows = [_ev(i, i, v) for i, v in enumerate(vals)]
    a, b = tmp_path / "a", tmp_path / "b"
    for d, data in ((a, rows), (b, list(reversed(rows)))):
        d.mkdir()
        spark.createDataFrame(data, SCHEMA).coalesce(1).write.parquet(
            str(d / "batch_0")
        )
    ra = _run(spark, str(a), "cusum_ord_a")
    rb = _run(spark, str(b), "cusum_ord_b")
    assert ra[-1].asDict() == rb[-1].asDict()


def _run_ckpt(spark, src, out, ckpt):
    """foreachBatch parquet sink — the memory sink cannot recover from a
    checkpoint (the mg_stream restart-test device)."""
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch_*")
    )
    q = (
        cusum_stateful(stream)
        .writeStream.foreachBatch(
            lambda bdf, bid: bdf.write.mode("append").parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return sorted(
        spark.read.parquet(out).collect(), key=lambda r: r.n_events
    )


def test_restart_resumes_chart_exactly_once(spark, tmp_path, state_provider):
    """Kill after batch 0, resume on the same checkpoint: batch 1 folds
    on the carried state without re-folding batch 0."""
    src = tmp_path / "src"
    src.mkdir()
    stable = [_ev(i, i, 100.0 + (i % 4)) for i in range(CAL_N + 4)]
    shifted = [_ev(100 + i, 100 + i, 140.0) for i in range(4)]
    spark.createDataFrame(stable, SCHEMA).coalesce(1).write.parquet(
        str(src / "batch_0")
    )
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    first = _run_ckpt(spark, str(src), out, ckpt)
    assert first[-1].n_events == CAL_N + 4

    spark.createDataFrame(shifted, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(str(src / "batch_1"))
    second = _run_ckpt(spark, str(src), out, ckpt)
    n, _, _, _, sp, _, au, ad = _expected(
        [r[4] for r in stable] + [r[4] for r in shifted]
    )
    assert second[-1].n_events == n  # no double fold
    assert second[-1].s_up == pytest.approx(sp, abs=0.0)
    assert (second[-1].n_alarms_up, second[-1].n_alarms_down) == (au, ad)
    from tests.conftest import assert_state_provider_engaged

    assert_state_provider_engaged(ckpt, state_provider)
