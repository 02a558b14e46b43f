"""Plan-budget regression lock: EVERY registered query carries a ceiling
on its scale-critical plan counters (parquet scans, Exchange nodes).
A refactor that silently adds a scan or a shuffle is a 100 TB
regression even while results stay correct — this test makes it a
local failure instead of a next-round bench surprise.

Budgets are the CURRENT counts snapshotted by
scripts/gen_plan_budgets.py into plan_budgets.json — i.e. the plan we
shipped and probed (PLANS.md is the human-readable rendering), not an
aspiration. Raising a budget is allowed but must be a conscious,
reviewable diff of the JSON; the curated OVERRIDES below document the
cases whose counts deserve an explanation.
"""

import json
import os

import pytest

from cdc_stream_batch_etl_spark import registry
from cdc_stream_batch_etl_spark.plans.inspect import scan_exchange_counts

with open(os.path.join(os.path.dirname(__file__), "plan_budgets.json")) as f:
    BUDGETS: dict[str, list[int]] = json.load(f)

#: documented exceptions — budgets whose size has a story worth keeping
#: next to the number (values must still match the JSON snapshot)
OVERRIDES = {
    # +1 exchange r7: spread_for_codec hash-spreads the ~600 KB document
    # projection before the Arrow codec pass (169 s -> 10 s class fix for
    # the serial-single-split pathology; no-op at real scan widths)
    "image_phash_dedup": (1, 2),
    # r12: tri and deg are localCheckpoint'd (the 3-leg member union
    # re-ran the wedge join per leg before), so the counter sees only
    # the post-checkpoint tail — the upstream scans/exchanges run once
    # behind the checkpoint (runtime reuse asserted in
    # test_plans.py::test_triangles_reuse_cached_graph_frames)
    "copurchase_triangles": (0, 1),
    # lineage-counting quirk: the persisted shingle frame (toks)
    # is referenced 4 ways, so the counter sees 12 lineage scans while
    # the RUNTIME reads documents once (persist measured faster at
    # sf0.1 AND collapses 6 table scans to 1 at 100 TB)
    "prefix_filter_jaccard_pairs": (12, 9),
    # r12: the broadcast-chained grid (3 nested broadcast exchanges +
    # a quantile re-entry join over a persisted daily frame; budget was
    # 8 scans / 15 exchanges) is now one linear pipeline — the grid is
    # two explodes and the quantile a second window over the same
    # (tau, slope) partitioning, so ONE orders scan and two exchanges
    "time_series_quantile_trend": (1, 2),
}


def test_every_registered_query_has_a_budget():
    """A new operator must land with a snapshot row (re-run
    scripts/gen_plan_budgets.py) — no unbudgeted plans."""
    registry.load_all()
    missing = sorted(set(registry.QUERIES) - set(BUDGETS))
    assert not missing, f"queries without a plan budget: {missing}"


def test_no_orphaned_budgets():
    """The reverse direction: a budget row whose query was removed must
    not linger (test_plan_within_budget skips unknown names, so stale
    rows would otherwise accumulate silently — r11 ADVICE). Removing a
    query means consciously regenerating the snapshot."""
    registry.load_all()
    orphaned = sorted(set(BUDGETS) - set(registry.QUERIES))
    assert not orphaned, (
        f"plan_budgets.json rows for unregistered queries: {orphaned} — "
        f"re-run scripts/gen_plan_budgets.py after removing a query"
    )


def test_overrides_match_snapshot():
    for name, (scans, exchanges) in OVERRIDES.items():
        assert BUDGETS[name] == [scans, exchanges], (
            f"{name}: OVERRIDES comment says {scans, exchanges} but the "
            f"snapshot records {BUDGETS[name]} — reconcile the story"
        )


@pytest.mark.parametrize("name", sorted(BUDGETS))
def test_plan_within_budget(spark, sf_dir, name):
    registry.load_all()
    if name not in registry.QUERIES:
        pytest.skip(f"{name} no longer registered")
    scans, exchanges = scan_exchange_counts(registry.QUERIES[name](spark, sf_dir))
    max_scans, max_exchanges = BUDGETS[name]
    assert scans <= max_scans, (
        f"{name}: {scans} scans > budget {max_scans} — a new scan of the "
        f"fact table appeared; fix the plan or consciously raise the budget"
    )
    assert exchanges <= max_exchanges, (
        f"{name}: {exchanges} exchanges > budget {max_exchanges} — a new "
        f"shuffle appeared; fix the plan or consciously raise the budget"
    )
    spark.catalog.clearCache()
