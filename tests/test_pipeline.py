"""End-to-end streaming deployment: all five query families run
concurrently from file sources and land their output tables."""

import json

from pyspark.sql import Window
from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.sources.files import text_stream
from cdc_stream_batch_etl_spark.streaming.cdc_stream import read_latest_state
from cdc_stream_batch_etl_spark.streaming.pipeline import start_pipelines


def _env(op, ts_ms, cid, name):
    return json.dumps(
        {
            "op": op,
            "ts_ms": ts_ms,
            "source": {"table": "customers"},
            "before": None,
            "after": {"id": cid, "first_name": name, "last_name": "L", "email": "e"},
        }
    )


def test_full_streaming_pipeline(spark, tmp_path, sf_dir):
    cdc_src = tmp_path / "cdc"
    cdc_src.mkdir()
    (cdc_src / "a.txt").write_text(
        "\n".join(_env("c", 1000 + i, i, f"u{i}") for i in range(5)) + "\n"
    )

    events = load_table(spark, sf_dir, "events")
    ev_src = str(tmp_path / "ev")
    ordered = events.withColumn("__q", F.ntile(3).over(Window.orderBy("ts")))
    for q in range(1, 4):
        ordered.filter(F.col("__q") == q).drop("__q").coalesce(1).write.parquet(
            f"{ev_src}/b{q}"
        )
    ev_stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(ev_src + "/b*")
    )

    out = str(tmp_path / "out")
    p = start_pipelines(
        text_stream(spark, str(cdc_src)),
        ev_stream,
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
        out,
    )
    p.await_all(300)

    stats = {(r.table, r.op): r.event_count for r in spark.read.parquet(f"{out}/cdc_stats").collect()}
    assert stats == {("customers", "c"): 5}

    state = read_latest_state(spark, f"{out}/latest_state")
    assert state.count() == 5

    mm = spark.read.parquet(f"{out}/minute_metrics")
    assert mm.count() > 0
    vel = spark.read.parquet(f"{out}/velocity")
    assert vel.count() > 0
    alerts = spark.read.parquet(f"{out}/alerts")
    # at smoke SF only the stateless family reliably fires inside the
    # sealed-window horizon; per-family coverage is in test_alert_streams
    assert alerts.count() > 0
    assert set(alerts.select("severity").distinct().toPandas()["severity"]) <= {
        "LOW",
        "MEDIUM",
        "HIGH",
    }
