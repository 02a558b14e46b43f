"""Physical-plan inspection utilities — the engine's scale feedback loop.

`.explain()` output is the contract at 100 TB: filters must reach the
parquet scan, reads must prune to referenced columns, dimension joins
must broadcast, aggregates must run partial+final inside whole-stage
codegen. tests/test_plans.py asserts these per headline query;
scripts/explain_all.py renders the full report (PLANS.md).
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout
from dataclasses import dataclass

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@dataclass
class PlanProfile:
    """Coarse scale-relevant properties of one physical plan."""

    n_exchanges: int
    n_broadcast_joins: int
    n_sortmerge_joins: int
    n_hash_aggregates: int
    has_codegen: bool
    pushed_filters: list[str]
    read_schemas: list[str]
    scans: int

    @property
    def shuffle_bound(self) -> bool:
        return self.n_exchanges > 0


def scan_exchange_counts(df: DataFrame) -> tuple[int, int]:
    """The two scale-critical plan counters — (parquet/cache scans,
    Exchange nodes) — from ONE simple-mode explain. The light form of
    ``profile`` for registry-wide budget sweeps, where the codegen
    explain would triple the cost of profiling 264 plans."""
    simple = plan_string(df, "simple")
    return (
        len(re.findall(r"FileScan|InMemoryTableScan", simple)),
        simple.count("Exchange"),
    )


def profile(df: DataFrame) -> PlanProfile:
    formatted = plan_string(df, "formatted")
    simple = plan_string(df, "simple")
    codegen_ok = "WholeStageCodegen" in plan_string(df, "codegen")

    pushed = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", formatted):
        if m.group(1).strip():
            pushed.append(m.group(1).strip())
    schemas = [m.group(1) for m in re.finditer(r"ReadSchema: (\S+)", formatted)]

    return PlanProfile(
        n_exchanges=simple.count("Exchange"),
        n_broadcast_joins=simple.count("BroadcastHashJoin"),
        n_sortmerge_joins=simple.count("SortMergeJoin"),
        n_hash_aggregates=simple.count("HashAggregate"),
        has_codegen=codegen_ok,
        pushed_filters=pushed,
        read_schemas=schemas,
        scans=len(re.findall(r"FileScan|InMemoryTableScan", simple)),
    )
