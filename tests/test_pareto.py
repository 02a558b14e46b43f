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


def test_local_preprune_is_exact(spark):
    """pre_prune=True must return the identical frontier: the planted
    set is repartitioned to scatter dominators away from their victims
    (the case where a too-aggressive local rule would miss a global
    domination — which is fine — or drop a frontier point — which is
    the bug this pins)."""
    import random

    rnd = random.Random(8)
    rows = [(k, rnd.randrange(100, 2000), 1 + rnd.randrange(28)) for k in range(500)]
    # both-dim tie mid-staircase (NOT a global dominator — a (2000, 28)
    # plant would dominate every random point and shrink the frontier
    # to the tie alone)
    rows += [(1000, 2500, 5), (1001, 2500, 5)]
    pts = _pts(spark, rows).repartition(16)
    plain = sorted(
        (r.o_orderkey, r.price_cents, r.o_orderdate)
        for r in skyline(pts, pre_prune=False).collect()
    )
    pruned = sorted(
        (r.o_orderkey, r.price_cents, r.o_orderdate)
        for r in skyline(pts, pre_prune=True).collect()
    )
    assert plain == pruned and len(plain) >= 3
