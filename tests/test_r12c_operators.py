"""Round-12 third batch: independent re-derivations the DuckDB oracle
sweep (test_queries.py) can't express — plain-Python/pandas
cross-checks of the Theil-Sen median slope, the tie-corrected Spearman
rho, and the diff-in-differences cell algebra."""

import math

import pandas as pd
import pyspark.sql.functions as F

from cdc_stream_batch_etl_spark import registry
from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.operators.did import did_promo_effect
from cdc_stream_batch_etl_spark.operators.spearman import (
    _PAIRS,
    _VARS,
    spearman_corr_matrix,
)
from cdc_stream_batch_etl_spark.operators.theilsen import theil_sen_trend

registry.load_all()


# ------------------------------------------------------------------ theil-sen


def test_theil_sen_matches_direct_median_of_slopes(spark, sf_dir):
    """One year's slope re-derived in plain Python: build the daily
    cents series, enumerate all ordered day pairs, take the exact
    two-point order-statistic median."""
    out = {r.order_year: r for r in theil_sen_trend(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.year("o_orderdate").alias("yr"), F.to_date("o_orderdate").alias("day"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .collect()
    )
    probe = sorted(out)[0]
    series = sorted((r.day, r.cents) for r in daily if r.yr == probe)
    slopes = []
    for i in range(len(series)):
        for j in range(i + 1, len(series)):
            (da, ca), (db, cb) = series[i], series[j]
            slopes.append(float(cb - ca) / float((db - da).days))
    slopes.sort()
    n = len(slopes)
    lo, hi = (n + 1) // 2 - 1, (n + 2) // 2 - 1  # 0-indexed order stats
    med = (slopes[lo] + slopes[hi]) / 2
    r = out[probe]
    assert r.n_days == len(series)
    assert r.n_pairs == n == len(series) * (len(series) - 1) // 2
    assert abs(r.slope_cents_per_day - med) < 1e-9


def test_theil_sen_covers_every_order_year(spark, sf_dir):
    out = theil_sen_trend(spark, sf_dir).collect()
    years = {
        r.yr
        for r in load_table(spark, sf_dir, "orders")
        .select(F.year("o_orderdate").alias("yr"))
        .distinct()
        .collect()
    }
    assert {r.order_year for r in out} == years
    # slope of a monotone re-sort sanity: median slope is finite
    assert all(math.isfinite(r.slope_cents_per_day) for r in out)


# ------------------------------------------------------------------- spearman


def test_spearman_matches_pandas(spark, sf_dir):
    """Every pair's rho vs pandas' spearman (midrank + Pearson), on the
    same integer grids."""
    li = load_table(spark, sf_dir, "lineitem")
    grids = li.select(
        *[F.expr(e).alias(n) for n, e in _VARS.items()]
    ).toPandas()
    out = {(r.x_col, r.y_col): r for r in spearman_corr_matrix(spark, sf_dir).collect()}
    assert set(out) == set(_PAIRS)
    import numpy as np

    for x, y in _PAIRS:
        # midranks + Pearson in pure pandas/numpy (pandas' spearman mode
        # imports scipy, which this image doesn't carry)
        rx = grids[x].rank(method="average").to_numpy()
        ry = grids[y].rank(method="average").to_numpy()
        expected = float(np.corrcoef(rx, ry)[0, 1])
        r = out[(x, y)]
        assert r.n == len(grids)
        assert abs(r.rho - expected) < 1e-9, (x, y, r.rho, expected)


def test_spearman_doubled_midranks_sum_identity(spark, sf_dir):
    """Internal invariant: the doubled midranks of any column sum to
    n(n+1) over rows — pins the 2*cumlt + t + 1 construction."""
    from cdc_stream_batch_etl_spark.operators.spearman import _rank_map

    li = load_table(spark, sf_dir, "lineitem")
    # r13: _rank_map runs on the melted all-pairs joint — the pair id
    # column is part of its contract (windows partition by it)
    joint = (
        li.select(
            F.lit(0).alias("p"),
            F.expr(_VARS["quantity"]).alias("gx"),
            F.expr(_VARS["discount"]).alias("gy"),
        )
        .groupBy("p", "gx", "gy")
        .agg(F.count("*").alias("c"))
    )
    m = _rank_map(joint, "gx").agg(
        F.sum("t").alias("n"), F.sum(F.col("t") * F.col("r2")).alias("s")
    ).first()
    assert m.s == m.n * (m.n + 1)


# ------------------------------------------------------------------------ did


def test_did_matches_pandas_cell_algebra(spark, sf_dir):
    """Cells re-derived with pandas: join lineitem to part, split at the
    integer-us midpoint, average exact decimal revenues per cell."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.unix_micros(F.col("l_shipdate").cast("timestamp")).alias("us"),
        "l_extendedprice",
        "l_discount",
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    pdf = (
        li.join(part, li["l_partkey"] == part["p_partkey"]).toPandas()
    )
    mid = pdf.us.min() + pdf.us.max()
    pdf["post"] = (2 * pdf.us > mid).astype(int)
    pdf["promo"] = (pdf.p_type == "PROMO").astype(int)
    # decimal(18,6) grid: the double product rounded to 6 fractional digits
    pdf["rev"] = (pdf.l_extendedprice * (1 - pdf.l_discount)).map(
        lambda v: float(
            pd.Series([v]).round(6).iloc[0]
        )
    )
    cells = pdf.groupby(["promo", "post"]).rev.agg(["count", "mean"])
    r = did_promo_effect(spark, sf_dir).first()
    assert r.n_pre_promo == cells.loc[(1, 0), "count"]
    assert r.n_post_other == cells.loc[(0, 1), "count"]
    for col, key in (
        ("pre_promo_avg", (1, 0)),
        ("post_promo_avg", (1, 1)),
        ("pre_other_avg", (0, 0)),
        ("post_other_avg", (0, 1)),
    ):
        assert abs(getattr(r, col) - cells.loc[key, "mean"]) < 1e-6
    assert abs(
        r.did
        - (
            (r.post_promo_avg - r.pre_promo_avg)
            - (r.post_other_avg - r.pre_other_avg)
        )
    ) < 1e-12


def test_did_counts_cover_all_lines(spark, sf_dir):
    r = did_promo_effect(spark, sf_dir).first()
    total = load_table(spark, sf_dir, "lineitem").count()
    assert (
        r.n_pre_promo + r.n_post_promo + r.n_pre_other + r.n_post_other == total
    )
