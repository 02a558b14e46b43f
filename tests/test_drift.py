"""EWMA drift detector (streaming/drift.py): state carries across
micro-batches, the fold is event-time-deterministic, and a shifted batch
trips the control band exactly when the math says it should."""

import datetime as dt

import numpy as np
import pytest

from cdc_stream_batch_etl_spark.streaming.drift import (
    ALPHA,
    K_SIGMA,
    MIN_HISTORY,
    value_drift_stateful,
)

T0 = dt.datetime(2026, 1, 5, 12, 0, 0)
SCHEMA = "event_id string, ts timestamp, event_type string, user_id long, value double"


def _ev(i, minutes, value, etype="purchase"):
    return (f"e{i}", T0 + dt.timedelta(minutes=minutes), etype, 1, float(value))


def _expected_fold(values):
    n, ewma, ewvar = 0, 0.0, 0.0
    for v in values:
        if n == 0:
            ewma, ewvar = float(v), 0.0
        else:
            d = float(v) - ewma
            ewma += ALPHA * d
            ewvar = (1.0 - ALPHA) * (ewvar + ALPHA * d * d)
        n += 1
    return n, ewma, ewvar


@pytest.fixture()
def staged_src(spark, tmp_path):
    """Batch 0: 12 stable values ~100 (arms the band). Batch 1: mean 200
    — far outside 3 sigma of the tight history — must flag drift."""
    src = tmp_path / "src"
    src.mkdir()
    stable = [_ev(i, i, 100.0 + (i % 3)) for i in range(12)]
    shifted = [_ev(100 + i, 100 + i, 200.0 + i) for i in range(4)]
    for b, rows in enumerate([stable, shifted]):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode("append").parquet(
            str(src / f"batch_{b}")
        )
    return str(src), stable, shifted


def _run(spark, src, name):
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch_*")
    )
    q = (
        value_drift_stateful(stream)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    return spark.sql(f"SELECT * FROM {name} ORDER BY n_events").collect()


def test_state_carries_and_drift_fires(spark, staged_src):
    src, stable, shifted = staged_src
    rows = _run(spark, src, "drift_out")
    assert len(rows) == 2  # one emission per micro-batch

    first, second = rows
    vals0 = [r[4] for r in stable]
    n0, m0, v0 = _expected_fold(vals0)
    assert first.n_events == n0 == 12
    assert first.ewma == pytest.approx(m0, abs=0.0)  # same IEEE fold
    assert first.drift is False  # band not armed before batch 0

    # batch 1 judged against batch-0 model: mean 201.5 vs ewma~101 ± 3σ
    vals1 = [r[4] for r in shifted]
    assert second.batch_mean == pytest.approx(float(np.mean(vals1)))
    assert second.n_events == 16
    assert abs(second.batch_mean - m0) > K_SIGMA * float(np.sqrt(v0))
    assert second.drift is True
    n1, m1, v1 = _expected_fold(vals0 + vals1)
    assert second.ewma == pytest.approx(m1, abs=0.0)
    assert second.ewvar == pytest.approx(v1, abs=0.0)


def test_batch_twin_matches_stream_final_state(spark, staged_src):
    """The same operator over a BATCH frame must equal the stream's final
    fold (single pass, drift unarmed-or-false semantics aside)."""
    src, stable, shifted = staged_src
    batch_df = spark.createDataFrame(stable + shifted, SCHEMA)
    out = {r.event_type: r for r in value_drift_stateful(batch_df).collect()}
    n, m, v = _expected_fold([r[4] for r in stable] + [r[4] for r in shifted])
    got = out["purchase"]
    assert got.n_events == n
    assert got.ewma == pytest.approx(m, abs=0.0)
    assert got.ewvar == pytest.approx(v, abs=0.0)


def test_scrambled_arrival_order_same_fold(spark, tmp_path):
    """Arrival order must not matter: one batch delivered in reverse
    event-time order folds identically to sorted order."""
    rows = [_ev(i, i, 50.0 + 7 * (i % 5)) for i in range(MIN_HISTORY + 2)]
    src = tmp_path / "src"
    src.mkdir()
    spark.createDataFrame(list(reversed(rows)), SCHEMA).coalesce(1).write.parquet(
        str(src / "batch_0")
    )
    got = _run(spark, str(src), "drift_scrambled")[0]
    n, m, v = _expected_fold([r[4] for r in rows])
    assert got.n_events == n
    assert got.ewma == pytest.approx(m, abs=0.0)
    assert got.ewvar == pytest.approx(v, abs=0.0)


def test_restart_resumes_model_exactly_once(spark, tmp_path):
    """Checkpoint-kill-restart (W12 analog for the drift operator): the
    order-dependent fold is exactly where replay bugs hide. Stop after the
    arming batch, restart on the same checkpoint with a shifted batch: the
    restored model must (a) not re-fold batch 0 (n_events continues at 16,
    not 28), (b) flag drift against the phase-1 band, (c) land on the same
    IEEE state as an uninterrupted run. An idle restart must emit nothing."""
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    stable = [_ev(i, i, 100.0 + (i % 3)) for i in range(12)]
    shifted = [_ev(100 + i, 100 + i, 200.0 + i) for i in range(4)]
    spark.createDataFrame(stable, SCHEMA).coalesce(1).write.parquet(str(src / "batch_0"))

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src) + "/batch_*")
        )
        q = (
            value_drift_stateful(stream)
            .writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    run()  # phase 1: arms the model, then the query is gone ("crash")
    phase1 = spark.read.parquet(out).collect()
    assert [r.n_events for r in phase1] == [12]

    # phase 2: shifted data arrives while down; restart on the checkpoint
    spark.createDataFrame(shifted, SCHEMA).coalesce(1).write.parquet(str(src / "batch_1"))
    run()
    rows = {r.n_events: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {12, 16}, f"replayed or lost a batch: {sorted(rows)}"
    resumed = rows[16]
    assert resumed.drift is True  # judged against the RESTORED phase-1 band
    n, m, v = _expected_fold([r[4] for r in stable] + [r[4] for r in shifted])
    assert resumed.ewma == pytest.approx(m, abs=0.0)  # identical IEEE fold
    assert resumed.ewvar == pytest.approx(v, abs=0.0)

    run()  # phase 3: idle restart — nothing to replay, nothing emitted
    assert len(spark.read.parquet(out).collect()) == 2


def test_psi_drift_planted_shift_and_python_reference(spark):
    """A hard mean shift between eras must band 'shifted'; PSI matches a
    pure-Python computation with the same Laplace smoothing."""
    import datetime as dt
    import math

    import cdc_stream_batch_etl_spark.operators.drift as dr

    early = [(i, dt.datetime(2024, 1, 10), 1, "t", 10.0) for i in range(100)]
    late = [(1000 + i, dt.datetime(2024, 1, 20), 1, "t", 200.0) for i in range(100)]
    df = spark.createDataFrame(
        early + late,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double",
    )
    orig = dr.load_table
    try:
        dr.load_table = lambda s, d, t: df  # noqa: ARG005
        r = dr.psi_drift(spark, "x").collect()[0]
    finally:
        dr.load_table = orig
    # two buckets (10/32 -> 0, 200/32 -> 6), fully era-separated
    assert r.n_buckets == 2
    cells = {0: (100, 0), 6: (0, 100)}
    psi = 0.0
    for ne, nl in cells.values():
        p = (ne + 1) / (100 + 2)
        q = (nl + 1) / (100 + 2)
        psi += (p - q) * math.log(p / q)
    assert abs(r.psi - psi) < 1e-9
    assert r.band == "shifted" and r.psi > 0.25


def test_psi_drift_driver_data_is_stable(spark, sf_dir):
    from cdc_stream_batch_etl_spark.operators.drift import psi_drift

    for r in psi_drift(spark, sf_dir).collect():
        assert r.psi >= 0.0  # PSI is a symmetrized KL: nonnegative
        assert r.band == "stable"  # the synthetic stream has no drift
