"""Skyline behavior on PLANTED points — dominated, tied-on-one-dim and
tied-on-both-dims cases, which real data's frontier doesn't isolate."""

import datetime as dt

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.operators.pareto import skyline


def _pts(spark, rows):
    return spark.createDataFrame(
        [(k, c, dt.date(2024, 3, d)) for (k, c, d) in rows],
        "o_orderkey bigint, price_cents bigint, o_orderdate date",
    )


def test_domination_and_ties(spark):
    pts = _pts(
        spark,
        [
            (1, 500, 10),  # frontier: max price
            (2, 400, 12),  # frontier: lower price but later date
            (3, 400, 11),  # dominated by 2 (equal price, earlier date)
            (4, 300, 12),  # dominated by 2 (lower price, equal date)
            (5, 200, 31),  # frontier: latest date
            (6, 100, 1),   # dominated by everything
            (7, 200, 31),  # exact tie with 5 on BOTH dims — both survive
        ],
    )
    keys = sorted(r.o_orderkey for r in skyline(pts).collect())
    assert keys == [1, 2, 5, 7]


def test_frontier_is_staircase(spark, sf_dir):
    from cdc_stream_batch_etl_spark.operators.pareto import (
        pareto_frontier_orders,
    )

    out = pareto_frontier_orders(spark, sf_dir).collect()
    assert len(out) > 0
    # Walking price DESC, the date envelope must be non-decreasing (each
    # cheaper frontier order must buy strictly-later recency), allowing
    # equality only at exact both-dim ties.
    for a, b in zip(out, out[1:]):
        assert a.price_cents >= b.price_cents
        assert b.o_orderdate >= a.o_orderdate
