"""Dead-letter routing: malformed CDC payloads land in the dead-letter
stream with the raw payload and a reason; valid events are unaffected —
and the two outputs partition the input exactly (nothing dropped,
nothing duplicated)."""

import json

from cdc_stream_batch_etl_spark.sources.files import text_stream
from cdc_stream_batch_etl_spark.streaming.cdc_stream import split_envelope


def _env(op, table, ts_ms, after):
    return json.dumps(
        {"op": op, "ts_ms": ts_ms, "source": {"table": table}, "before": None, "after": after}
    )


def _run(spark, df, name):
    q = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}").collect()


def test_deadletter_partition(spark, tmp_path):
    lines = [
        _env("c", "customers", 1000, {"id": 1, "first_name": "a", "last_name": "b", "email": "e"}),
        "{{{ not json at all",
        "",  # empty line (mid-file, so the text source can't drop it)
        _env("u", "customers", 2000, {"id": 1, "first_name": "a2", "last_name": "b", "email": "e"}),
        json.dumps({"ts_ms": 3000, "source": {"table": "customers"}}),  # no op
    ]
    src = tmp_path / "src"
    src.mkdir()
    (src / "b0.txt").write_text("\n".join(lines))

    changes, dead = split_envelope(text_stream(spark, str(src)), "customers")
    good_rows = _run(spark, changes, "dl_good")
    dead_rows = _run(spark, dead, "dl_dead")

    assert len(good_rows) == 2
    assert {r["op"] for r in good_rows} == {"c", "u"}
    assert len(good_rows) + len(dead_rows) == 5
    reasons = sorted(r["reason"] for r in dead_rows)
    assert "missing_op" in reasons
    assert "unparseable_json" in reasons
    # the raw payload survives for forensics
    assert any("not json" in r["raw_value"] for r in dead_rows)
