"""Windowed-DP funnel vs brute-force chain enumeration on planted
paths — the cases the real event stream doesn't isolate: spans landing
exactly ON the window bound, steps present but out of order, anchor
choice mattering (early view valid for level 2 but only a later view
leaves slack for level 3), and same-timestamp ties."""

import itertools

from cdc_stream_batch_etl_spark.operators.windowfunnel import funnel_levels

W = 100  # small integer window; tu is epoch-µs-like but any unit works


def _brute_level(events):
    """events: [(tu, event_id, type)] for ONE user → max funnel depth."""
    order = sorted(events, key=lambda e: (e[0], e[1]))
    views = [e for e in order if e[2] == "view"]
    clicks = [e for e in order if e[2] == "click"]
    purch = [e for e in order if e[2] == "purchase"]
    before = lambda a, b: (a[0], a[1]) < (b[0], b[1])
    lvl = 1 if views else 0
    for v, c in itertools.product(views, clicks):
        if before(v, c) and c[0] - v[0] <= W:
            lvl = max(lvl, 2)
    for v, c, p in itertools.product(views, clicks, purch):
        if before(v, c) and before(c, p) and p[0] - v[0] <= W:
            lvl = max(lvl, 3)
    return lvl


PLANTS = {
    # (user_id): [(tu, event_id, type)]
    1: [(0, 1, "view"), (10, 2, "click"), (20, 3, "purchase")],  # clean 3
    2: [(0, 1, "view"), (50, 2, "click"), (100, 3, "purchase")],  # span == W
    3: [(0, 1, "view"), (50, 2, "click"), (101, 3, "purchase")],  # span == W+1
    4: [(0, 1, "purchase"), (10, 2, "click"), (20, 3, "view")],  # reversed
    5: [(0, 1, "view"), (200, 2, "click"), (210, 3, "purchase")],  # v→c gap > W
    # anchor choice: early view's window can't cover the purchase, the
    # later view's can — greedy must re-anchor
    6: [(0, 1, "view"), (90, 2, "view"), (95, 3, "click"), (150, 4, "purchase")],
    # tie on ts: view and click share tu; event_id order decides
    7: [(10, 1, "view"), (10, 2, "click"), (20, 3, "purchase")],
    8: [(10, 2, "view"), (10, 1, "click"), (30, 3, "purchase")],  # click first
    9: [(0, 1, "click"), (5, 2, "purchase")],  # no view at all → level 0
    10: [(0, 1, "view")],  # view only → level 1
}


def test_dp_matches_brute_force_on_planted_chains(spark):
    rows = [
        (uid, eid, tu, ty)
        for uid, evs in PLANTS.items()
        for (tu, eid, ty) in evs
    ]
    ev = spark.createDataFrame(
        rows, "user_id bigint, event_id bigint, tu bigint, event_type string"
    )
    got = {}
    out = funnel_levels(ev, window_us=W)
    # reconstruct per-user levels by running per-user frames
    per_user = {
        uid: _brute_level(evs) for uid, evs in PLANTS.items()
    }
    want_counts = {}
    for lvl in per_user.values():
        want_counts[lvl] = want_counts.get(lvl, 0) + 1
    got_counts = {r.funnel_level: r.n_users for r in out.collect()}
    assert got_counts == want_counts, (got_counts, want_counts, per_user)


def test_expected_levels_of_key_plants(spark):
    """Pin the intent of the adversarial plants directly (so a bug in
    the brute force can't hide one in the DP)."""
    # 7: the (ts-tie, event_id) order makes view(10,1) < click(10,2) a
    #    valid chain start → purchase@20 completes level 3.
    # 8: click(10,1) precedes view(10,2) in tie order → no valid chain,
    #    view only → level 1.
    expected = {1: 3, 2: 3, 3: 2, 4: 1, 5: 1, 6: 3, 7: 3, 8: 1, 9: 0, 10: 1}
    for uid, evs in PLANTS.items():
        assert _brute_level(evs) == expected[uid], (uid, evs)
