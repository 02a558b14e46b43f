"""Streaming Misra-Gries contracts: the stream summary equals the
plain-Python fold over the identically-ordered replay, survives a
kill-restart without double-folding, and honors the deterministic
heavy-hitter guarantee against exact counts."""

from collections import Counter

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.streaming.mg_stream import MG_K, mg_fold, mg_stream


def _write_files(ev, src, cuts):
    """Split events into len(cuts)+1 files by event_id rank, each file
    internally scrambled (the operator must re-sort)."""
    n = ev.count()
    bounds = [0, *[int(n * c) for c in cuts], n]
    for i in range(len(bounds) - 1):
        (
            ev.orderBy("event_id")
            .offset(bounds[i])
            .limit(bounds[i + 1] - bounds[i])
            .orderBy(F.desc("user_id"))  # scramble within the file
            .coalesce(1)
            .write.parquet(str(src / f"b{i}"))
        )
    return [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)]


def _run(spark, ev, src, out, ckpt):
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/b*")
    )
    q = (
        mg_stream(stream)
        .writeStream.foreachBatch(
            lambda bdf, bid: bdf.withColumn("bid", F.lit(bid))
            .write.mode("append")
            .parquet(out)
        )
        .option("checkpointLocation", ckpt)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)


def _final_snapshot(spark, out):
    """Latest micro-batch's rows per event_type."""
    rows = spark.read.parquet(out).collect()
    last_bid = {}
    for r in rows:
        last_bid[r.event_type] = max(last_bid.get(r.event_type, -1), r.bid)
    snap = {}
    for r in rows:
        if r.bid == last_bid[r.event_type]:
            snap.setdefault(r.event_type, {})[r.user_id] = r
    return snap


def _python_twin(ev_rows, spans):
    """Fold the same replay: files in order, (tu, event_id) within."""
    ordered = sorted(ev_rows, key=lambda r: r.event_id)
    summaries: dict[str, dict[int, int]] = {}
    ledger: dict[str, list[int]] = {}
    for lo, hi in spans:
        chunk = sorted(ordered[lo:hi], key=lambda r: (r.tu, r.event_id))
        for r in chunk:
            s = summaries.setdefault(r.event_type, {})
            _, dec = mg_fold(s, [r.user_id])
            led = ledger.setdefault(r.event_type, [0, 0])
            led[0] += 1
            led[1] += dec
    return {t: (s, *ledger[t]) for t, s in summaries.items()}


def test_mg_stream_matches_ordered_python_fold(spark, sf_dir, tmp_path):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    spans = _write_files(ev, src, [0.37, 0.61])
    _run(spark, ev, src, out, str(tmp_path / "ckpt"))

    raw = ev.select(
        "event_type",
        F.unix_micros("ts").alias("tu"),
        "event_id",
        "user_id",
    ).collect()
    twin = _python_twin(raw, spans)
    snap = _final_snapshot(spark, out)
    assert set(snap) == set(twin)
    for t, (summary, n_proc, n_dec) in twin.items():
        got = snap[t]
        assert {u: r.counter for u, r in got.items()} == summary
        any_row = next(iter(got.values()))
        assert (any_row.n_processed, any_row.n_decrements) == (n_proc, n_dec)


def test_mg_stream_restart_no_double_fold(spark, sf_dir, tmp_path, state_provider):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    n = ev.count()
    ev.orderBy("event_id").limit(n // 2).coalesce(1).write.parquet(str(src / "b0"))
    _run(spark, ev, src, out, ckpt)  # phase 1, then "crash"
    ev.orderBy("event_id").offset(n // 2).coalesce(1).write.parquet(str(src / "b1"))
    _run(spark, ev, src, out, ckpt)  # resume on the same checkpoint

    raw = ev.select(
        "event_type", F.unix_micros("ts").alias("tu"), "event_id", "user_id"
    ).collect()
    twin = _python_twin(raw, [(0, n // 2), (n // 2, n)])
    snap = _final_snapshot(spark, out)
    for t, (summary, n_proc, n_dec) in twin.items():
        assert {u: r.counter for u, r in snap[t].items()} == summary
        any_row = next(iter(snap[t].values()))
        assert any_row.n_processed == n_proc  # no double count after restart
    from tests.conftest import assert_state_provider_engaged

    assert_state_provider_engaged(ckpt, state_provider)


def test_mg_guarantee_vs_exact_counts(spark, sf_dir, tmp_path):
    """The deterministic Misra-Gries bounds against exact frequencies:
    c(v) <= true(v) <= c(v) + D, D <= N/(k+1), and every value with
    true(v) > D is retained."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    _write_files(ev, src, [0.5])
    _run(spark, ev, src, out, str(tmp_path / "ckpt"))

    exact = Counter(
        (r.event_type, r.user_id)
        for r in ev.select("event_type", "user_id").collect()
    )
    by_type = {}
    for (t, u), c in exact.items():
        by_type.setdefault(t, {})[u] = c
    snap = _final_snapshot(spark, out)
    for t, rows in snap.items():
        any_row = next(iter(rows.values()))
        n, d = any_row.n_processed, any_row.n_decrements
        assert n == sum(by_type[t].values())
        assert d <= n / (MG_K + 1)
        for u, r in rows.items():
            assert r.counter <= by_type[t][u] <= r.counter + d
        retained = set(rows)
        for u, c in by_type[t].items():
            if c > d:
                assert u in retained
