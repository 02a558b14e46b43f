"""Driver-contract verification: simulate the correctness gate.

Plain SparkSession (non-UTC tz to probe the pin), entry() smoke, then every
queries() entry vs its oracle_sql() via DuckDB at sf0.01 — columns sorted by
name, rows sorted, exact compare.
"""

import sys
import time

import duckdb
import pandas as pd
from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")
import __spark_entry__ as e  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def main():
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.session.timeZone", "America/New_York")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    rows = e.entry(spark).collect()
    print(f"entry(): {len(rows)} rows OK")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    queries = e.queries()
    oracles = e.oracle_sql()
    print(f"{len(queries)} queries, {len(oracles)} oracles")
    failed = []
    for name, fn in queries.items():
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR).toPandas()
        except Exception as ex:
            failed.append((name, f"spark error: {ex}"))
            print(f"FAIL {name}: spark error: {ex}")
            continue
        if name not in oracles:
            print(f"  rows-only {name}: {len(sdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as ex:
            failed.append((name, f"oracle error: {ex}"))
            print(f"FAIL {name}: oracle error: {ex}")
            continue
        s = sdf.reindex(sorted(sdf.columns), axis=1)
        o = odf.reindex(sorted(odf.columns), axis=1)
        err = None
        if list(s.columns) != list(o.columns):
            err = f"schema {list(s.columns)} vs {list(o.columns)}"
        elif len(s) != len(o):
            err = f"rows {len(s)} vs {len(o)}"
        else:
            s = s.sort_values(list(s.columns)).reset_index(drop=True)
            o = o.sort_values(list(o.columns)).reset_index(drop=True)
            for c in s.columns:
                sv, ov = s[c], o[c]
                try:
                    pd.testing.assert_series_equal(
                        sv.astype(ov.dtype), ov, check_names=False, atol=0, rtol=0
                    )
                except Exception:
                    try:
                        pd.testing.assert_series_equal(
                            sv, ov.astype(sv.dtype), check_names=False, atol=0, rtol=0
                        )
                    except Exception as ex2:
                        err = f"col {c}: {ex2}"
                        break
        if err:
            failed.append((name, err))
            print(f"FAIL {name}: {err[:300]}")
        else:
            print(f"  ok {name}: {len(s)} rows ({time.time()-t0:.1f}s)")

    print(f"\n{len(queries) - len(failed)}/{len(queries)} pass")
    if failed:
        for n, msg in failed:
            print(f"FAILED: {n}: {msg[:200]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
