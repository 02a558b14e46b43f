"""Independent-implementation checks for the exact-sufficient-statistics
operators: the DuckDB oracle proves cross-engine determinism; these
prove the FORMULA — numpy computes the same quantity its own way on the
same fixture, and the closed forms must agree to float tolerance
(they are algebraically identical; the tolerance absorbs numpy's
different accumulation order)."""

import numpy as np
import pandas as pd
import pytest

from cdc_stream_batch_etl_spark.catalog import load_table


@pytest.fixture(scope="module")
def events_pd(spark, sf_dir):
    return load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "ts", "value"
    ).toPandas()


def test_autocorr_matches_numpy_corrcoef(spark, sf_dir, events_pd):
    from cdc_stream_batch_etl_spark.operators.autocorr import event_autocorr

    got = {
        r["event_type"]: r["lag1_autocorr"]
        for r in event_autocorr(spark, sf_dir).collect()
    }
    daily = (
        events_pd.assign(d=events_pd["ts"].dt.date)
        .groupby(["event_type", "d"])
        .size()
        .reset_index(name="c")
        .sort_values(["event_type", "d"])
    )
    for etype, grp in daily.groupby("event_type"):
        c = grp["c"].to_numpy(dtype=float)
        if len(c) < 3:
            continue
        expected = np.corrcoef(c[:-1], c[1:])[0, 1]
        assert got[etype] == pytest.approx(expected, rel=1e-9), etype


def test_trend_matches_numpy_polyfit(spark, sf_dir):
    from cdc_stream_batch_etl_spark.operators.trend import EPOCH, revenue_trend

    rows = {r["nation"]: r for r in revenue_trend(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders").toPandas()
    cust = load_table(spark, sf_dir, "customer").toPandas()
    nation = load_table(spark, sf_dir, "nation").toPandas()
    df = orders.merge(cust, left_on="o_custkey", right_on="c_custkey").merge(
        nation, left_on="c_nationkey", right_on="n_nationkey"
    )
    df["x"] = (
        pd.to_datetime(df["o_orderdate"]).dt.normalize()
        - pd.Timestamp(EPOCH)
    ).dt.days
    daily = (
        df.groupby(["n_name", "x"])["o_totalprice"].sum().reset_index(name="y")
    )
    for nat, grp in daily.groupby("n_name"):
        if len(grp) < 2:
            continue
        slope, intercept = np.polyfit(
            grp["x"].to_numpy(dtype=float), grp["y"].to_numpy(dtype=float), 1
        )
        assert rows[nat]["slope"] == pytest.approx(slope, rel=1e-6), nat
        assert rows[nat]["intercept"] == pytest.approx(intercept, rel=1e-6), nat


def test_robust_anomalies_matches_numpy_mad(spark, sf_dir, events_pd):
    from cdc_stream_batch_etl_spark.operators.mad import (
        MAD_SCALE,
        Z_CUT,
        robust_anomalies,
    )

    got = {r["event_id"] for r in robust_anomalies(spark, sf_dir).collect()}
    expected = set()
    for etype, grp in events_pd.groupby("event_type"):
        v = grp["value"].to_numpy(dtype=float)
        med = float(np.median(v))
        mad = float(np.median(np.abs(v - med)))
        if mad <= 0:
            continue
        z = MAD_SCALE * (v - med) / mad
        expected |= set(grp.loc[np.abs(z) > Z_CUT, "event_id"])
    assert got == expected
