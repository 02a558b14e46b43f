"""Planted-fixture behavior for the rolling median and the incremental
refresh: hand-checkable medians + warmup exclusion, and the partial-
merge invariant on a delta that overlaps the cutoff day MID-DAY (the
day-level merge path the driver corpus only exercises implicitly)."""

import datetime as dt

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.operators.increment import _partials
from cdc_stream_batch_etl_spark.operators.rolling import WINDOW_N


def test_rolling_median_hand_checked(spark):
    # One user, values 1..7 in ts order: medians of [1..5]=3, [2..6]=4,
    # [3..7]=5; first WINDOW_N-1 rows are warmup and must not appear.
    rows = [
        (i, dt.datetime(2024, 3, 1, 0, 0, i), 7, float(i))
        for i in range(1, 8)
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )
    from pyspark.sql import Window

    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(WINDOW_N - 1), Window.currentRow)
    )
    out = (
        ev.select(
            "event_id",
            F.collect_list("value").over(frame).alias("win"),
        )
        .filter(F.size("win") == WINDOW_N)
        .select(
            "event_id",
            F.element_at(F.array_sort("win"), (WINDOW_N + 1) // 2).alias("m"),
        )
        .collect()
    )
    got = {r.event_id: r.m for r in out}
    assert got == {5: 3.0, 6: 4.0, 7: 5.0}


def test_incremental_merge_handles_midday_cutoff_overlap(spark):
    # Day 25 has events on BOTH sides of a midday split: the state
    # partial and the delta partial for (user, day-25) must fold into
    # one row before the entity rollup, or n/active_days double-count.
    rows = [
        (1, dt.datetime(2024, 1, 24, 9, 0, 0), 10.0),
        (1, dt.datetime(2024, 1, 25, 9, 0, 0), 20.0),   # state side of day 25
        (1, dt.datetime(2024, 1, 25, 15, 0, 0), 30.0),  # delta side of day 25
        (1, dt.datetime(2024, 1, 26, 9, 0, 0), 40.0),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    cut = dt.datetime(2024, 1, 25, 12, 0, 0)
    state = _partials(ev.filter(F.col("ts") < F.lit(cut)))
    delta = _partials(ev.filter(F.col("ts") >= F.lit(cut)))
    merged = (
        state.unionByName(delta)
        .groupBy("user_id", "day")
        .agg(F.sum("n").alias("n"), F.sum("tot").alias("tot"), F.max("mx").alias("mx"))
    )
    refreshed = merged.groupBy("user_id").agg(
        F.sum("n").alias("n_events"),
        F.sum("tot").cast("double").alias("total_value"),
        F.max("mx").alias("max_value"),
        F.count("*").alias("active_days"),
    ).collect()[0]
    assert refreshed.n_events == 4
    assert refreshed.total_value == 100.0
    assert refreshed.max_value == 40.0
    assert refreshed.active_days == 3  # 24th, 25th, 26th — not 4


def test_cutoff_predicates_reach_the_scan(spark, sf_dir):
    from cdc_stream_batch_etl_spark.operators.increment import (
        incremental_agg_refresh,
    )
    from cdc_stream_batch_etl_spark.plans.inspect import profile

    p = profile(incremental_agg_refresh(spark, sf_dir))
    # Both sides must push their date cut into the parquet scan — the
    # O(|delta|) refresh claim depends on it at the stored-state scale.
    assert any("ts" in f for f in p.pushed_filters), p.pushed_filters
