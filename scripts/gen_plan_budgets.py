#!/usr/bin/env python
"""Snapshot the registry-wide plan budgets: for every registered query,
record its CURRENT (scans, exchanges) plan counters into
tests/plan_budgets.json. tests/test_plan_budgets.py asserts every
query stays within its snapshot — a refactor that silently adds a scan
or a shuffle fails CI instead of surfacing as a next-round bench mover
(the r10 verdict's #8 ask).

Re-run after a CONSCIOUS plan change to re-baseline; the diff of the
JSON is the reviewable record of what moved.

Usage: python scripts/gen_plan_budgets.py [sf_dir]
       (default /root/testdata/sf0.01 — budgets are plan-shape
       properties, invariant to SF)
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from cdc_stream_batch_etl_spark import registry
from cdc_stream_batch_etl_spark.plans.inspect import scan_exchange_counts
from cdc_stream_batch_etl_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-budgets")
    registry.load_all()
    out: dict[str, list[int]] = {}
    for name in sorted(registry.QUERIES):
        df = registry.QUERIES[name](spark, sf_dir)
        scans, exchanges = scan_exchange_counts(df)
        out[name] = [scans, exchanges]
        # cross-query independence: a persisted subtree from one query
        # must not turn another query's FileScan into a cache scan
        spark.catalog.clearCache()
    path = Path(__file__).resolve().parent.parent / "tests" / "plan_budgets.json"
    path.write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    print(f"wrote {path} ({len(out)} queries)")


if __name__ == "__main__":
    main()
