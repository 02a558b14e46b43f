"""Independent-reference properties for the r10 layout/statistics ops:
the Morton spread against a pure-Python bit interleave, the Poisson
bootstrap weights against the analytic pmf, and quantile-alignment
monotonicity — checks the DuckDB oracle cannot provide because both
engines share the arithmetic under test."""

import math

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.operators.bootstrap import (
    _THRESHOLDS,
    _W_CAP,
    N_REPLICATES,
    bootstrap_revenue_means,
)
from cdc_stream_batch_etl_spark.operators.zorder import Z_CELLS, _spread_sql, zorder_file_skipping
from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.text.quantalign import source_quantile_align


def _py_spread(x: int) -> int:
    """Reference bit-interleave: bit i of x lands at position 2i."""
    out = 0
    for i in range(16):
        out |= ((x >> i) & 1) << (2 * i)
    return out


def test_spread_expression_matches_python_reference(spark):
    vals = [0, 1, 2, 3, 255, 256, 4095, 21845, 43690, 65534, 65535]
    df = spark.createDataFrame([(v,) for v in vals], "x bigint").select(
        "x", F.expr(_spread_sql("x")).alias("s")
    )
    got = {r["x"]: r["s"] for r in df.collect()}
    for v in vals:
        assert got[v] == _py_spread(v), v


def test_zorder_cells_partition_the_table(spark, sf_dir):
    rep = zorder_file_skipping(spark, sf_dir).collect()
    n = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r["n_rows"] for r in rep) == n
    assert all(0 <= r["cell_id"] < Z_CELLS for r in rep)
    # the probe rectangle is ~1% of the area; a z-ordered layout must
    # prune the large majority of cells (sqrt(selectivity) scaling)
    hit_frac = sum(r["probe_hit"] for r in rep) / len(rep)
    assert hit_frac <= 0.25, hit_frac


def test_poisson_thresholds_match_analytic_cdf():
    lam_cdf = [
        math.exp(-1) * sum(1 / math.factorial(i) for i in range(k + 1))
        for k in range(_W_CAP)
    ]
    for t, p in zip(_THRESHOLDS, lam_cdf):
        assert t == math.floor(p * (1 << 40))
    assert _THRESHOLDS == sorted(_THRESHOLDS)
    # every draw >= T_{cap-1} lands ON the cap value, so the truncation
    # error is only the mass strictly above it: P(X > cap) < 1e-4
    tail = 1 - math.exp(-1) * sum(1 / math.factorial(i) for i in range(_W_CAP + 1))
    assert tail < 1e-4, tail


def test_bootstrap_replicates_center_on_true_mean(spark, sf_dir):
    rows = bootstrap_revenue_means(spark, sf_dir).collect()
    assert len(rows) == N_REPLICATES
    orders = load_table(spark, sf_dir, "orders")
    n = orders.count()
    true_mean = orders.agg(F.avg("o_totalprice")).first()[0]
    boot_means = [r["boot_mean"] for r in rows]
    est = sum(boot_means) / len(boot_means)
    # Poisson(1) resample of n rows: SE of one replicate mean ~ sd/sqrt(n),
    # replicates draw independent weights, so the mean of R replicates
    # sits within 5 * sd/sqrt(n)/sqrt(R) of the sample mean
    sd = orders.agg(F.stddev("o_totalprice")).first()[0]
    assert abs(est - true_mean) < 5 * sd / math.sqrt(n) / math.sqrt(len(boot_means))
    # each replicate draws ~n rows (Poisson(1) weight sum concentrates)
    for r in rows:
        assert abs(r["n_sampled"] - n) < 6 * math.sqrt(n)


def test_quantile_align_deciles_monotone(spark, sf_dir):
    rows = source_quantile_align(spark, sf_dir).collect()
    by_src: dict[str, list] = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append((r["decile"], r["source_value"]))
    for vals in by_src.values():
        ordered = [v for _, v in sorted(vals)]
        assert len(ordered) == 9
        assert ordered == sorted(ordered)
