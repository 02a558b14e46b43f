"""Independent-reference properties for the r10 second-batch arithmetic
— checks the shared-arithmetic DuckDB oracle cannot provide: the
ordered-fold OLS against numpy's closed form on random point sets, the
attribution window against a naive pure-Python next-purchase scan on
random event streams, and the PSI smoothing identities."""

import datetime as dt
import random

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from cdc_stream_batch_etl_spark.streaming.psi_stream import psi_from_counts


def test_ols_fold_matches_numpy(spark):
    from cdc_stream_batch_etl_spark.text.laws import _ols_spark
    from pyspark.sql import functions as F

    rng = random.Random(7)
    rows = []
    for g in range(5):
        n = rng.randint(3, 12)
        for j in range(n):
            x = rng.uniform(0.1, 10.0)
            rows.append((f"g{g}", j, x, 1.7 * x - 0.4 + rng.uniform(-2, 2)))
    df = spark.createDataFrame(rows, "source string, j int, x double, y double")
    out = {r.source: r for r in _ols_spark(df, ["source"], "j", F.count("*")).collect()}
    by_g = {}
    for s, j, x, y in rows:
        by_g.setdefault(s, []).append((x, y))
    for s, pts in by_g.items():
        xs = np.array([p[0] for p in pts])
        ys = np.array([p[1] for p in pts])
        slope, icpt = np.polyfit(xs, ys, 1)
        r = np.corrcoef(xs, ys)[0, 1]
        assert out[s].n_points == len(pts)
        assert abs(out[s].slope - slope) < 1e-9
        assert abs(out[s].intercept - icpt) < 1e-9
        assert abs(out[s].r2 - r * r) < 1e-9


def _naive_attribution(events, lookback_us):
    """events: (event_id, ts_us, user_id, event_type). Reference scan:
    each touch -> the purchase with smallest (ts, event_id) at-or-after
    it for the same user, within the lookback."""
    out = []
    purchases = [(e[1], e[0], e[2]) for e in events if e[3] == "purchase"]
    for eid, ts, uid, etype in events:
        if etype == "purchase":
            continue
        cands = [
            (pts, pid)
            for pts, pid, puid in purchases
            if puid == uid and pts >= ts and pts - ts <= lookback_us
        ]
        if cands:
            out.append((eid, min(cands)[1]))
    return dict(out)


@given(st.data())
@settings(max_examples=12, deadline=None)
def test_attribution_matches_naive_scan(spark, data):
    import cdc_stream_batch_etl_spark.operators.attribution as mta

    rng = random.Random(data.draw(st.integers(0, 10**6)))
    t0 = dt.datetime(2024, 1, 1)
    events = []
    eid = 0
    for uid in range(1, 4):
        t = 0
        for _ in range(rng.randint(2, 12)):
            t += rng.choice([1, 60, 3600, 86_400 * 3, 86_400 * 8])
            eid += 1
            etype = rng.choice(["view", "click", "purchase"])
            events.append((eid, t * 1_000_000, uid, etype))
    expected = _naive_attribution(events, mta._LOOKBACK_US)

    df = spark.createDataFrame(
        [
            (e, t0 + dt.timedelta(microseconds=ts), u, ty)
            for e, ts, u, ty in events
        ],
        "event_id bigint, ts timestamp, user_id bigint, event_type string",
    )
    orig = mta.load_table
    try:
        mta.load_table = lambda s, d, t: df  # noqa: ARG005
        got = {
            r.event_id: r.conv_id
            for r in mta.attributed_touches(spark, "x").collect()
        }
    finally:
        mta.load_table = orig
    assert got == expected


@given(
    st.lists(st.integers(0, 50), min_size=4, max_size=12),
    st.lists(st.integers(0, 50), min_size=4, max_size=12),
)
@settings(max_examples=200, deadline=None)
def test_psi_identities(a, b):
    n = max(len(a), len(b))
    a = a + [0] * (n - len(a))
    b = b + [0] * (n - len(b))
    # PSI is a symmetrized KL of the smoothed cells: nonnegative,
    # symmetric, and zero iff the smoothed distributions coincide
    assert psi_from_counts(a, a) == 0.0
    pab, pba = psi_from_counts(a, b), psi_from_counts(b, a)
    assert pab >= 0.0 and abs(pab - pba) < 1e-12


def test_ndcg_ideal_prefixes_are_the_sorted_optimum():
    import itertools
    import math

    from cdc_stream_batch_etl_spark.similarity.releval import _DISC, _IDCG, REL_DEPTH

    # at small depth, brute-force over permutations of the top grades:
    # no ordering beats the sorted-descending prefix the literal encodes
    grades = [REL_DEPTH + 1 - i for i in range(1, 5)]
    for d in range(1, 5):
        best = max(
            sum(g * _DISC[i] for i, g in enumerate(perm[:d]))
            for perm in itertools.permutations(grades)
        )
        assert math.isclose(_IDCG[d - 1], best, rel_tol=1e-12)
