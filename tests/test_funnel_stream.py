"""Batch/stream funnel parity: the stateful streaming funnel's final
per-user levels equal the brute-force chain enumeration (and hence the
batch DP, which test_windowfunnel pins to the same truth), with chains
deliberately SPLIT ACROSS micro-batches so the state handoff is what's
being tested."""

import datetime as dt

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.streaming.funnel_stream import funnel_stream

BASE = dt.datetime(2024, 3, 1)
US = 1_000_000
W_US = 24 * 3600 * US  # the module's FUNNEL_W_US


def _ts(sec):
    return BASE + dt.timedelta(seconds=sec)


# (user, event_id, sec, type) — chronological; chains cross batch cuts
EVENTS = [
    (1, 1, 0, "view"),
    (2, 2, 5, "view"),
    (3, 3, 10, "click"),        # click before any view → never level 2
    (1, 4, 100, "click"),       # b1: completes 1's 2-chain
    (2, 5, 110, "click"),
    (3, 6, 120, "view"),
    (1, 7, 200, "purchase"),    # b2: completes 1's 3-chain
    (3, 8, 210, "purchase"),    # 3 has view but no click-after-view
    (2, 9, 90000, "purchase"),  # within W of 2's view → level 3
    (4, 10, 90100, "purchase"), # purchase only → level 0
]
CUTS = [3, 6, 10]  # file boundaries (prefix lengths)


def test_stream_levels_match_brute_force(spark, tmp_path):
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id bigint, event_id bigint, ts timestamp, event_type string"
    prev = 0
    for i, cut in enumerate(CUTS):
        rows = [
            (u, e, _ts(s), ty) for (u, e, s, ty) in EVENTS[prev:cut]
        ]
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
        prev = cut
    stream = (
        spark.readStream.schema(
            spark.read.parquet(str(src / "b0")).schema
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/b*")
    )
    q = (
        funnel_stream(stream)
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
    q.awaitTermination(120)

    final = {}
    for r in spark.read.parquet(out).collect():
        if r.user_id not in final or r.bid > final[r.user_id][1]:
            final[r.user_id] = (r.funnel_level, r.bid)
    got = {u: lvl for u, (lvl, _) in final.items()}

    per_user = {}
    for u, e, s, ty in EVENTS:
        per_user.setdefault(u, []).append((s * US, e, ty))
    want = {u: _brute_level_w(evs) for u, evs in per_user.items()}
    assert got == want, (got, want)


def _brute_level_w(events):
    """brute force with the module's real 24h window (test_windowfunnel's
    uses a tiny W for its own plants)."""
    import itertools

    order = sorted(events, key=lambda e: (e[0], e[1]))
    views = [e for e in order if e[2] == "view"]
    clicks = [e for e in order if e[2] == "click"]
    purch = [e for e in order if e[2] == "purchase"]
    before = lambda a, b: (a[0], a[1]) < (b[0], b[1])
    lvl = 1 if views else 0
    for v, c in itertools.product(views, clicks):
        if before(v, c) and c[0] - v[0] <= W_US:
            lvl = max(lvl, 2)
    for v, c, p in itertools.product(views, clicks, purch):
        if before(v, c) and before(c, p) and p[0] - v[0] <= W_US:
            lvl = max(lvl, 3)
    return lvl


def test_step_sorts_across_arrow_chunks():
    """Regression (r9): applyInPandasWithState delivers one group's
    micro-batch as MULTIPLE Arrow chunks in arbitrary order. Sorting
    each chunk independently would replay a later chunk's click before
    an earlier chunk's view, missing the 2-chain. Feed _step the chunks
    REVERSED — the whole-group concat+sort must still find level 2."""
    import pandas as pd

    from cdc_stream_batch_etl_spark.streaming.funnel_stream import _step

    class FakeState:
        exists = False
        get = None

        def update(self, v):
            self.got = v

    # chunk A holds the LATER click, chunk B the EARLIER view;
    # per-chunk sort processes click-then-view → level 1 (wrong)
    chunk_a = pd.DataFrame(
        {"tu": [100 * US], "event_id": [2], "event_type": ["click"]}
    )
    chunk_b = pd.DataFrame(
        {"tu": [0], "event_id": [1], "event_type": ["view"]}
    )
    st = FakeState()
    out = list(_step((7,), iter([chunk_a, chunk_b]), st))
    assert out[0]["funnel_level"].iloc[0] == 2, (
        "cross-chunk (tu, event_id) ordering not enforced"
    )


def test_funnel_stream_restart_resumes_state(spark, tmp_path, state_provider):
    """Checkpoint-kill-restart: stop after the first two files, restart
    on the same checkpoint with the third — chains whose final step
    arrives AFTER the restart must still complete (state survives), and
    per-user levels equal the brute force."""
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id bigint, event_id bigint, ts timestamp, event_type string"
    prev = 0
    for i, cut in enumerate(CUTS):
        rows = [(u, e, _ts(s), ty) for (u, e, s, ty) in EVENTS[prev:cut]]
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / f"b{i}")
        )
        prev = cut

    def run(glob):
        stream = (
            spark.readStream.schema(
                spark.read.parquet(str(src / "b0")).schema
            )
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src) + glob)
        )
        q = (
            funnel_stream(stream)
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
        q.awaitTermination(120)

    run("/b[01]")  # phase 1: user 1's purchase (b2) not yet arrived
    run("/b*")     # "restart": b2 discovered on the same checkpoint

    final = {}
    for r in spark.read.parquet(out).collect():
        if r.user_id not in final or r.bid > final[r.user_id][1]:
            final[r.user_id] = (r.funnel_level, r.bid)
    got = {u: lvl for u, (lvl, _) in final.items()}

    per_user = {}
    for u, e, s, ty in EVENTS:
        per_user.setdefault(u, []).append((s * US, e, ty))
    want = {u: _brute_level_w(evs) for u, evs in per_user.items()}
    assert got == want, (got, want)
    from tests.conftest import assert_state_provider_engaged

    assert_state_provider_engaged(ckpt, state_provider)


def test_multichunk_group_delivery_end_to_end(spark, tmp_path):
    """Integration twin of test_step_sorts_across_arrow_chunks: force
    applyInPandasWithState to deliver one user's micro-batch as MULTIPLE
    Arrow chunks (maxRecordsPerBatch=2) with file row order REVERSED, so
    a per-chunk sort would replay clicks before views and under-level
    the funnel. The whole-group concat+sort must still yield level 3."""
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    schema = "user_id bigint, event_id bigint, ts timestamp, event_type string"
    # one user, one micro-batch, 9 events: chronological order is
    # view(1) click(2) purchase(3) ... ; file order is REVERSED so chunk
    # boundaries (2 rows each) deliver later events first
    chrono = [
        (1, i + 1, _ts(10 * i), ty)
        for i, ty in enumerate(
            ["view", "click", "purchase"] * 3
        )
    ]
    rows = list(reversed(chrono))
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
        str(src / "b0")
    )
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        stream = (
            spark.readStream.schema(
                spark.read.parquet(str(src / "b0")).schema
            ).parquet(str(src) + "/b*")
        )
        q = (
            funnel_stream(stream)
            .writeStream.foreachBatch(
                lambda bdf, bid: bdf.write.mode("append").parquet(out)
            )
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    finally:
        spark.conf.set(
            "spark.sql.execution.arrow.maxRecordsPerBatch", old
        )
    got = {r.user_id: r.funnel_level for r in spark.read.parquet(out).collect()}
    assert got == {1: 3}, got
