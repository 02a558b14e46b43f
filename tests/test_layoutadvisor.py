"""Layout-advisor verdicts on planted skew/granularity, and the Bloom
sizing arithmetic against the closed form."""

import math

from cdc_stream_batch_etl_spark.operators.layoutadvisor import (
    BITS_PER_KEY,
    BLOOM_FPP,
    MAX_SKEW,
    MIN_AVG_ROWS,
    bloom_sizing_plan,
    partition_layout_advisor,
)


def test_driver_data_layout_verdicts(spark, sf_dir):
    rows = {r.layout: r for r in partition_layout_advisor(spark, sf_dir).collect()}
    for r in rows.values():
        assert r.avg_rows == r.total_rows / r.n_partitions
        assert r.skew == r.max_rows / r.avg_rows
        assert r.too_granular == (r.avg_rows < MIN_AVG_ROWS)
        assert r.skewed == (r.skew > MAX_SKEW)
        assert 0.0 <= r.sliver_share <= 1.0
    # per-day date partitions are slivers at this sf; low-cardinality
    # enum partitions are not
    assert rows["orders/o_orderdate"].too_granular
    assert not rows["lineitem/l_returnflag"].too_granular
    assert not rows["lineitem/l_returnflag"].skewed


def test_planted_skewed_layout(spark):
    import cdc_stream_batch_etl_spark.operators.layoutadvisor as la

    # one hot partition of 1500 rows (above the sliver threshold) + 99
    # singletons: avg = 15.99, skew ~ 93.8, slivers = 99 of 100
    rows = [(i, "hot") for i in range(1500)] + [
        (10_000 + i, f"p{i}") for i in range(99)
    ]
    df = spark.createDataFrame(rows, "k bigint, p string")
    orig_cand, orig_load = la.CANDIDATES, la.load_table
    try:
        la.CANDIDATES = (("t", "p", "t/p"),)
        la.load_table = lambda s, d, t: df  # noqa: ARG005
        r = la.partition_layout_advisor(spark, "x").collect()[0]
    finally:
        la.CANDIDATES, la.load_table = orig_cand, orig_load
    assert r.n_partitions == 100 and r.max_rows == 1500
    assert r.skew == 1500 / (1599 / 100)
    assert r.skewed and r.too_granular
    assert r.sliver_share == 0.99  # everything but the hot partition


def test_bloom_sizing_matches_closed_form(spark, sf_dir):
    assert abs(BITS_PER_KEY - (-math.log(BLOOM_FPP) / math.log(2) ** 2)) < 1e-12
    for r in bloom_sizing_plan(spark, sf_dir).collect():
        assert r.filter_bits == math.ceil(r.build_ndv * BITS_PER_KEY)
        assert r.filter_mb == r.filter_bits / 8 / 1048576
        assert r.n_hashes == round(BITS_PER_KEY * math.log(2))
        assert r.bits_per_fact_row == r.filter_bits / r.fact_rows
        assert r.fact_ndv <= r.fact_rows
