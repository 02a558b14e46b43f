"""Sweep-line backlog invariants: flow conservation against the
interval frame, non-negativity, and a hand-checkable planted overlap."""

import datetime as dt

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.operators.sweepline import order_backlog_timeline


def test_flow_conservation_and_nonnegativity(spark, sf_dir):
    tl = order_backlog_timeline(spark, sf_dir).persist()
    agg = tl.agg(
        F.sum("started").alias("st"),
        F.sum("completed").alias("co"),
        F.min("open_orders").alias("mn"),
    ).first()
    # Every interval starts exactly once and completes exactly once
    # inside the grid (the grid spans min(s)..max(e) by construction).
    assert agg.st == agg.co
    assert agg.mn >= 0
    # The last grid day still carries the orders completing that day.
    last = tl.orderBy(F.desc("day")).first()
    assert last.open_orders >= last.completed > 0
    tl.unpersist()
    spark.catalog.clearCache()


def test_planted_overlap_counts(spark):
    # Three intervals: [1,3], [2,2] (clamped from inverted), [5,5].
    orders = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 6, 1)),
            (2, dt.datetime(2024, 6, 2)),
            (3, dt.datetime(2024, 6, 5)),
        ],
        "o_orderkey long, o_orderdate timestamp",
    )
    li = spark.createDataFrame(
        [
            (1, dt.datetime(2024, 6, 3)),
            (2, dt.datetime(2024, 6, 1)),  # ship BEFORE order -> clamp to s
            (3, dt.datetime(2024, 6, 5)),
        ],
        "l_orderkey long, l_shipdate timestamp",
    )
    import cdc_stream_batch_etl_spark.operators.sweepline as sl

    orig = sl.load_table
    frames = {"orders": orders, "lineitem": li}
    sl.load_table = lambda spark, sf_dir, name: frames[name]
    try:
        rows = {r.day.day: r for r in order_backlog_timeline(spark, "x").collect()}
    finally:
        sl.load_table = orig
    # day: open/started/completed
    expect = {
        1: (1, 1, 0),
        2: (2, 1, 1),   # [1,3] open; [2,2] starts AND completes
        3: (1, 0, 1),
        4: (0, 0, 0),   # gap day: dense grid, zero backlog
        5: (1, 1, 1),
    }
    assert len(rows) == 5
    for d, (o, s, c) in expect.items():
        r = rows[d]
        assert (r.open_orders, r.started, r.completed) == (o, s, c), (d, r)
