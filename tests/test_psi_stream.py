"""Streaming PSI monitor: final read-out equals the pure-Python fold of
the same counts, a planted shift bands 'shifted', no-drift feeds band
'stable', and a kill-restart run converges to the uninterrupted PSI
under both state store providers."""

import datetime as dt

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.operators.drift import BUCKET_WIDTH
from cdc_stream_batch_etl_spark.streaming.psi_stream import (
    N_PSI_BINS,
    psi_from_counts,
    psi_stream,
    reference_profile,
)

SCHEMA = "event_id bigint, ts timestamp, user_id bigint, event_type string, value double"
T0 = dt.datetime(2024, 1, 1)


def _counts(values):
    out = [0] * N_PSI_BINS
    for v in values:
        out[min(max(int(v // BUCKET_WIDTH), 0), N_PSI_BINS - 1)] += 1
    return out


def _run_stream(spark, tmp_path, rows, reference, n_batches=3, name="psi_out"):
    events = spark.createDataFrame(rows, SCHEMA)
    src = str(tmp_path / f"src_{name}")
    ordered = events.withColumn("__q", F.ntile(n_batches).over(Window.orderBy("ts", "event_id")))
    for q in range(1, n_batches + 1):
        ordered.filter(F.col("__q") == q).drop("__q").coalesce(1).write.parquet(
            f"{src}/batch_{q}"
        )
    stream_src = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src + "/batch_*")
    )
    q = (
        psi_stream(stream_src, reference)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # update mode: the LAST row per type is the final read-out
    rows_out = spark.sql(f"SELECT * FROM {name}").collect()
    final = {}
    for r in rows_out:
        if r.event_type not in final or r.n_rows >= final[r.event_type].n_rows:
            final[r.event_type] = r
    return final


def test_shifted_feed_matches_python_and_bands(spark, tmp_path, state_provider):
    ref_vals = [10.0] * 100
    cur_vals = [200.0] * 60 + [10.0] * 10
    reference = {"t": _counts(ref_vals)}
    rows = [
        (i, T0 + dt.timedelta(seconds=i), 1, "t", v) for i, v in enumerate(cur_vals)
    ]
    final = _run_stream(spark, tmp_path, rows, reference, name="psi_shift")
    r = final["t"]
    expected = psi_from_counts(_counts(ref_vals), _counts(cur_vals))
    assert r.n_rows == len(cur_vals)
    assert abs(r.psi - expected) < 1e-12
    assert r.band == "shifted" and r.psi > 0.25


def test_no_drift_is_stable_and_unknown_type_maxes(spark, tmp_path):
    vals = [float(7 * i % 300) for i in range(200)]
    reference = {"t": _counts(vals)}
    rows = [(i, T0 + dt.timedelta(seconds=i), 1, "t", v) for i, v in enumerate(vals)]
    # plus a type the reference never saw — spanning TWO buckets (a
    # single-bucket feed is PSI-blind by construction: both smoothed
    # distributions collapse to {1.0}, same as the batch operator)
    new_vals = [50.0] * 29 + [200.0]
    rows += [
        (10_000 + i, T0 + dt.timedelta(seconds=i), 2, "new", v)
        for i, v in enumerate(new_vals)
    ]
    final = _run_stream(spark, tmp_path, rows, reference, name="psi_stable")
    assert final["t"].band == "stable"
    assert abs(final["t"].psi - psi_from_counts(_counts(vals), _counts(vals))) < 1e-12
    r = final["new"]
    assert abs(r.psi - psi_from_counts([0] * N_PSI_BINS, _counts(new_vals))) < 1e-12
    assert r.band == "shifted"  # empty reference = all drift


def test_restart_converges_to_uninterrupted_psi(spark, tmp_path):
    import shutil

    vals = [float((13 * i) % 500) for i in range(120)]
    reference = {"t": _counts([float(v + 16) for v in vals])}
    rows = [(i, T0 + dt.timedelta(seconds=i), 1, "t", v) for i, v in enumerate(vals)]
    events = spark.createDataFrame(rows, SCHEMA)
    staging = str(tmp_path / "staging")
    src = str(tmp_path / "src")
    ordered = events.withColumn("__q", F.ntile(4).over(Window.orderBy("ts", "event_id")))
    for q in range(1, 5):
        ordered.filter(F.col("__q") == q).drop("__q").coalesce(1).write.parquet(
            f"{staging}/batch_{q}"
        )
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def _run():
        stream_src = (
            spark.readStream.schema(events.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/batch_*")
        )
        q = (
            psi_stream(stream_src, reference)
            .writeStream.foreachBatch(
                lambda df, _: df.write.mode("append").parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    for b in (1, 2):
        shutil.copytree(f"{staging}/batch_{b}", f"{src}/batch_{b}")
    _run()
    for b in (3, 4):
        shutil.copytree(f"{staging}/batch_{b}", f"{src}/batch_{b}")
    _run()
    rows_out = spark.read.parquet(out).collect()
    last = max(rows_out, key=lambda r: r.n_rows)
    assert last.n_rows == len(vals)
    assert abs(last.psi - psi_from_counts(reference["t"], _counts(vals))) < 1e-12


def test_reference_profile_helper_matches_counts(spark, sf_dir):
    from cdc_stream_batch_etl_spark.catalog import load_table

    ev = load_table(spark, sf_dir, "events")
    prof = reference_profile(ev)
    rows = ev.filter(F.col("value").isNotNull()).collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.value)
    assert set(prof) == set(by_type)
    for t, vals in by_type.items():
        assert prof[t] == _counts(vals)
