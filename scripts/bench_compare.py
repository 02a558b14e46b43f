#!/usr/bin/env python
"""Diff two bench ledgers — the regression detector the r10 ledger
artifact exists for.

Usage: python scripts/bench_compare.py OLD.json NEW.json [ratio] [floor]

Accepts either artifact shape: a ``bench_ledger.json`` (queries ->
{sec, cohort}) or a raw bench stdout / BENCH_r{N}.json with a parsed
``queries`` map of name -> seconds. Prints three lists: regressions
(new/old >= ratio AND delta >= floor seconds — both gates, so micro
-query jitter and big-query noise don't flag), improvements (the
inverse), and membership changes. Exit code 1 when regressions exist,
so a round script can gate on it.

Defaults ratio=1.5, floor=0.75 s — the noise band measured across the
r8/r9 image-codec reruns (±0.3 s on 1.3-2.1 s queries).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    with open(path) as f:
        doc = json.load(f)
    q = doc.get("queries", doc)
    out = {}
    for name, v in q.items():
        if isinstance(v, dict):
            v = v.get("sec")
        if isinstance(v, (int, float)):
            out[name] = float(v)
    return out


def main() -> None:
    if len(sys.argv) < 3:
        raise SystemExit(__doc__)
    old, new = load(sys.argv[1]), load(sys.argv[2])
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.75

    both = sorted(set(old) & set(new))
    regressions, improvements = [], []
    for n in both:
        if new[n] >= old[n] * ratio and new[n] - old[n] >= floor:
            regressions.append(n)
        elif old[n] >= new[n] * ratio and old[n] - new[n] >= floor:
            improvements.append(n)

    def show(title, names, sign):
        print(f"{title} ({len(names)}):")
        for n in sorted(names, key=lambda n: -abs(new[n] - old[n])):
            print(f"  {n}: {old[n]:.2f}s -> {new[n]:.2f}s ({sign}{abs(new[n]-old[n]):.2f}s)")

    show("REGRESSIONS", regressions, "+")
    show("improvements", improvements, "-")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    t_old = sum(old[n] for n in both)
    t_new = sum(new[n] for n in both)
    if t_old > 0:
        print(f"shared-set total: {t_old:.1f}s -> {t_new:.1f}s "
              f"({(t_new / t_old - 1) * 100:+.1f}%)")
    else:
        # disjoint ledgers (e.g. a smoke artifact vs the full record):
        # nothing shared to compare — still a clean exit, not a traceback
        print("shared-set total: no overlapping queries")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
