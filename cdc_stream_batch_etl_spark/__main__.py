"""CLI: drive the engine end-to-end.

  python -m cdc_stream_batch_etl_spark list
  python -m cdc_stream_batch_etl_spark run <query> [--sf-dir DIR] [--limit N]
  python -m cdc_stream_batch_etl_spark explain <query> [--sf-dir DIR]
  python -m cdc_stream_batch_etl_spark batch --out-dir DIR [--sf-dir DIR]

Replaces the reference's per-process entry points (python/cdc_processor.py,
stream_processor.py, batch_processor.py mains) with one binary over the
registry.
"""

from __future__ import annotations

import argparse
import sys

DEFAULT_SF_DIR = "/root/testdata/sf0.01"


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="cdc_stream_batch_etl_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    sub.add_parser("list", help="list registered queries (oracle-checked marked *)")

    run = sub.add_parser("run", help="run one query and show the result")
    run.add_argument("query")
    run.add_argument("--sf-dir", default=DEFAULT_SF_DIR)
    run.add_argument("--limit", type=int, default=20)

    exp = sub.add_parser("explain", help="formatted physical plan + profile")
    exp.add_argument("query")
    exp.add_argument("--sf-dir", default=DEFAULT_SF_DIR)

    batch = sub.add_parser("batch", help="one batch E-T-L cycle (runner)")
    batch.add_argument("--out-dir", required=True)
    batch.add_argument("--sf-dir", default=DEFAULT_SF_DIR)

    args = p.parse_args(argv)

    from . import registry
    from .session import get_spark

    registry.load_all()

    if args.cmd == "list":
        for name in sorted(registry.QUERIES):
            mark = "*" if name in registry.ORACLES else " "
            print(f"{mark} {name}")
        return 0

    spark = get_spark(app=f"cli-{args.cmd}")
    try:
        if args.cmd == "run":
            if args.query not in registry.QUERIES:
                print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
                return 2
            df = registry.QUERIES[args.query](spark, args.sf_dir)
            df.show(args.limit, truncate=False)
            print(f"({df.count()} rows total)")
        elif args.cmd == "explain":
            if args.query not in registry.QUERIES:
                print(f"unknown query {args.query!r}; see `list`", file=sys.stderr)
                return 2
            from .plans.inspect import plan_string, profile

            df = registry.QUERIES[args.query](spark, args.sf_dir)
            print(plan_string(df, "formatted"))
            print(profile(df))
        elif args.cmd == "batch":
            from .runner import run_batch_pipeline

            res = run_batch_pipeline(spark, args.sf_dir, args.out_dir)
            print(
                f"run_ts={res.run_ts} rows={res.row_counts} "
                f"quality_passed={res.quality_passed} "
                f"failures={res.quality_failures} duration={res.duration_sec}s"
            )
            return 0 if res.quality_passed else 1
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
