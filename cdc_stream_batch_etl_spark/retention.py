"""Retention: the reference's Redis TTLs re-expressed as partition drops.

Every `expiry=` in the reference (change-log 1 h, entity caches 1-2 h,
alerts 30 min, velocity 5 min — SURVEY §1.3) is a retention policy, not
query semantics. On a table laid out as `<out_dir>/<name>/run_ts=<ts>/`
(runner.py) the policy becomes: drop run_ts partitions beyond a count or
age horizon. At 100 TB this is a metadata operation per partition —
O(partitions), never O(rows) — where key-level TTL would be a full scan.

`latest` is never a drop candidate.
"""

from __future__ import annotations

import re
import shutil
from pathlib import Path

_RUN_RE = re.compile(r"^run_ts=(?P<ts>\d{8}_\d{6})$")


def list_runs(out_dir: str, name: str) -> list[str]:
    """run_ts values present for one output table, oldest first."""
    base = Path(out_dir) / name
    if not base.is_dir():
        return []
    runs = sorted(
        m.group("ts") for p in base.iterdir() if (m := _RUN_RE.match(p.name))
    )
    return runs


def drop_expired_runs(
    out_dir: str, name: str, keep_last: int | None = None, older_than_ts: str | None = None
) -> list[str]:
    """Drop run_ts partitions, keeping the newest `keep_last` and/or
    everything >= `older_than_ts` (yyyymmdd_HHMMSS, lexicographically
    comparable). Returns the dropped run_ts values."""
    if keep_last is None and older_than_ts is None:
        raise ValueError("need keep_last and/or older_than_ts")
    runs = list_runs(out_dir, name)
    to_drop = set()
    if keep_last is not None and keep_last >= 0:
        to_drop.update(runs[: max(0, len(runs) - keep_last)])
    if older_than_ts is not None:
        to_drop.update(r for r in runs if r < older_than_ts)
    dropped = []
    for ts in sorted(to_drop):
        shutil.rmtree(Path(out_dir) / name / f"run_ts={ts}")
        dropped.append(ts)
    return dropped
