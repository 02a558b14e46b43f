"""Simulate the round driver's verify: entry() smoke + every queries()
entry vs oracle_sql() through DuckDB at sf0.01, on a deliberately
non-UTC plain SparkSession. Used by /verify before each commit.

Usage: python scripts/driver_sim.py [sf_dir] [--window N | --queries a,b,c]
       --window N  — check only the FIRST N queries() entries (the
                     driver's 50-slot window order), e.g. for the
                     rotating sf1 spot-check (r11 verdict #4)
       --queries   — explicit comma-separated subset
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
from pyspark.sql import SparkSession

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


def main() -> int:
    sf = (
        sys.argv[1]
        if len(sys.argv) > 1 and not sys.argv[1].startswith("--")
        else "/root/testdata/sf0.01"
    )
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        # default 1g JVM suffices at the driver's sf0.01; the sf1 spot-
        # check (10x data, bigger broadcast builds) needs headroom
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
        )
        .appName("driver-sim")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e

    rows = e.entry(spark).collect()
    print(f"entry rows: {len(rows)}")
    assert len(rows) > 0

    qs, osql = e.queries(), e.oracle_sql()
    print(f"{len(qs)} queries, {len(osql)} oracles")

    con = duckdb.connect()
    # Spill, don't die: at sf1 a single memory-hungry oracle (r12 case:
    # min_cost_supplier's min(struct_pack) argmin, >125 GB resident)
    # otherwise OOM-kills the WHOLE sweep — two sf1 sweeps were lost to
    # the kernel OOM killer before this cap was added.
    con.execute(
        f"SET memory_limit='{os.environ.get('SPARK_GRAFT_DUCK_MEM', '24GB')}'"
    )
    con.execute("SET temp_directory='/tmp/duck_spill'")
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

    names = sorted(qs)
    if "--window" in sys.argv:
        n = int(sys.argv[sys.argv.index("--window") + 1])
        names = list(qs)[:n]  # dict order IS the driver window order
    elif "--queries" in sys.argv:
        names = sys.argv[sys.argv.index("--queries") + 1].split(",")

    bad = []
    for name in names:
        try:
            sdf = qs[name](spark, sf).toPandas()
        except Exception as exc:  # noqa: BLE001 — mirror the driver: an
            # erroring query is a per-row ERR, never an aborted sweep
            bad.append(name)
            print(f"{name:32s} ERROR {type(exc).__name__}: {str(exc)[:160]}")
            continue
        if name not in osql:
            print(f"{name:32s} rows={len(sdf):6d} (rows-only)")
            continue
        odf = con.execute(osql[name]).df()
        cols = sorted(sdf.columns)
        ok = set(sdf.columns) == set(odf.columns) and len(sdf) == len(odf)
        if ok:
            # tuple-ize any list-valued cells so sort_values can order them
            # (defensive only — oracled outputs should stay scalar, see
            # customer_order_sets; a list column here deserves a MISMATCH
            # investigation, not a crash that hides every later query)
            for df in (sdf, odf):
                for c in cols:
                    if df[c].dtype == object and df[c].map(
                        lambda v: isinstance(v, (list, np.ndarray))
                    ).any():
                        df[c] = df[c].map(
                            lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v
                        )
            a = sdf[cols].sort_values(cols).reset_index(drop=True)
            b = odf[cols].sort_values(cols).reset_index(drop=True)
            for c in cols:
                if pd.api.types.is_datetime64_any_dtype(a[c]) or pd.api.types.is_datetime64_any_dtype(b[c]):
                    av = pd.to_datetime(a[c]).astype("datetime64[us]")
                    bv = pd.to_datetime(b[c]).astype("datetime64[us]")
                    ok = ok and bool(((av.isna() & bv.isna()) | (av == bv)).all())
                elif a[c].dtype.kind == "f" or b[c].dtype.kind == "f":
                    # the real driver's value-hash is TYPE-sensitive: an
                    # int64 Spark column vs a float64 oracle column (the
                    # DuckDB sum(BIGINT)→HUGEINT→float64 trap) hash-
                    # mismatches even when every value is equal. Mirror
                    # that here: int-kind vs float-kind is a MISMATCH.
                    if (a[c].dtype.kind in "iu") != (b[c].dtype.kind in "iu"):
                        ok = False
                    # Same trap for DecimalType exports (the r11
                    # time_series_cv_folds lesson): Spark decimal(p,s)
                    # arrives as object-dtype decimal.Decimal cells while
                    # DuckDB decimals arrive as float64 — value-equal but
                    # hash-different in the real driver. Object-kind vs
                    # float-kind is a MISMATCH too.
                    if a[c].dtype.kind == "O" or b[c].dtype.kind == "O":
                        ok = False
                    ok = ok and np.allclose(
                        a[c].astype(float), b[c].astype(float), rtol=0, atol=0, equal_nan=True
                    )
                else:
                    ok = ok and bool(((a[c].isna() & b[c].isna()) | (a[c] == b[c])).all())
        status = "MATCH" if ok else "MISMATCH"
        if not ok:
            bad.append(name)
        print(f"{name:32s} rows={len(sdf):6d} {status}")
    print("ALL MATCH" if not bad else f"BAD: {bad}")
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
