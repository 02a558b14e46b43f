"""transition_entropy: planted deterministic and skewed chains vs a
pure-Python entropy computation, and driver-data bounds."""

import datetime as dt
import math

import cdc_stream_batch_etl_spark.operators.markov as mk


def _run(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    orig = mk.load_table
    try:
        mk.load_table = lambda s, d, t: df  # noqa: ARG005
        return {r.prev_type: r for r in mk.transition_entropy(spark, "x").collect()}
    finally:
        mk.load_table = orig


T0 = dt.datetime(2024, 1, 1)


def _s(sec):
    return T0 + dt.timedelta(seconds=sec)


def test_deterministic_edge_has_zero_entropy(spark):
    # a -> b always, across three users
    rows = []
    eid = 0
    for u in (1, 2, 3):
        rows += [(eid := eid + 1, _s(eid), u, "a"), (eid := eid + 1, _s(eid), u, "b")]
    out = _run(spark, rows)
    r = out["a"]
    assert r.n_next_types == 1 and r.top_next_type == "b"
    assert r.top_share == 1.0
    assert r.entropy_bits == 0.0 and r.perplexity == 1.0


def test_skewed_distribution_matches_python(spark):
    # from 'a': 3x to b, 1x to c  ->  H = -(0.75 ln 0.75 + 0.25 ln 0.25)
    rows, eid = [], 0
    for u, nxt in ((1, "b"), (2, "b"), (3, "b"), (4, "c")):
        rows += [(eid := eid + 1, _s(eid), u, "a"), (eid := eid + 1, _s(eid), u, nxt)]
    out = _run(spark, rows)
    r = out["a"]
    h_nats = -(0.75 * math.log(0.75) + 0.25 * math.log(0.25))
    assert r.n_transitions == 4 and r.n_next_types == 2
    assert r.top_next_type == "b" and r.top_share == 0.75
    assert abs(r.entropy_bits - h_nats / math.log(2)) < 1e-9
    assert abs(r.perplexity - math.exp(h_nats)) < 1e-9


def test_uniform_two_way_is_one_bit(spark):
    rows, eid = [], 0
    for u, nxt in ((1, "b"), (2, "c")):
        rows += [(eid := eid + 1, _s(eid), u, "a"), (eid := eid + 1, _s(eid), u, nxt)]
    r = _run(spark, rows)["a"]
    assert r.entropy_bits == 1.0 and r.perplexity == 2.0
    # tie on counts: the lexicographically first next type wins rank 1
    assert r.top_next_type == "b"


def test_driver_data_bounds(spark, sf_dir):
    for r in mk.transition_entropy(spark, sf_dir).collect():
        assert 0.0 <= r.entropy_bits <= math.log2(r.n_next_types) + 1e-9
        assert 1.0 - 1e-9 <= r.perplexity <= r.n_next_types + 1e-9
        assert 0.0 < r.top_share <= 1.0
