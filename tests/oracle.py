"""DuckDB-oracle comparison helper, mirroring the driver's check:
row-count + schema(column names) + order-insensitive value comparison with
columns sorted by name. Float comparison is EXACT (atol=0) — determinism is
a design goal (decimal-exact sums, pinned UTC, frozen now), not a tolerance.
"""

from __future__ import annotations

import duckdb
import numpy as np
import pandas as pd

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def run_oracle(sql: str, sf_dir: str) -> pd.DataFrame:
    con = duckdb.connect()
    try:
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
            )
        return con.execute(sql).df()
    finally:
        con.close()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        s = out[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif s.dtype == object and len(s) and isinstance(s.dropna().iloc[0] if s.dropna().size else None, (list, np.ndarray)):
            out[c] = s.map(lambda v: tuple(v) if v is not None else None)
    return out.sort_values(cols, kind="mergesort").reset_index(drop=True)


def assert_df_matches(spark_df, oracle_df: pd.DataFrame, float_atol: float = 0.0) -> None:
    # The driver's value-hash is type-KIND-sensitive: Spark DecimalType
    # exports as object-dtype decimal.Decimal cells while DuckDB decimals
    # export as float64, so value-equal frames still hash-differently
    # (the r11 time_series_cv_folds failure). Repo convention: decimal
    # arithmetic inside the plan, double (or string) at export.
    decimal_cols = [
        f.name for f in spark_df.schema.fields if f.dataType.typeName().startswith("decimal")
    ]
    assert not decimal_cols, (
        f"DecimalType in exported schema {decimal_cols}: the driver hash "
        f"treats Decimal objects != DuckDB float64 — cast to double at export"
    )
    pdf = spark_df.toPandas()
    assert set(pdf.columns) == set(oracle_df.columns), (
        f"column mismatch: spark={sorted(pdf.columns)} oracle={sorted(oracle_df.columns)}"
    )
    assert len(pdf) == len(oracle_df), f"row count: spark={len(pdf)} oracle={len(oracle_df)}"
    a = _normalize(pdf)
    b = _normalize(oracle_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            aa = av.astype(float).to_numpy()
            bb = bv.astype(float).to_numpy()
            if not np.allclose(aa, bb, rtol=0.0, atol=float_atol, equal_nan=True):
                bad = np.where(~np.isclose(aa, bb, rtol=0.0, atol=float_atol, equal_nan=True))[0][:5]
                raise AssertionError(
                    f"float column {c!r} mismatch at rows {bad}: spark={aa[bad]} oracle={bb[bad]}"
                )
        else:
            eq = (av.isna() & bv.isna()) | (av == bv)
            if not bool(eq.all()):
                bad = np.where(~eq.to_numpy())[0][:5]
                raise AssertionError(
                    f"column {c!r} mismatch at rows {bad}: "
                    f"spark={av.iloc[bad].tolist()} oracle={bv.iloc[bad].tolist()}"
                )
