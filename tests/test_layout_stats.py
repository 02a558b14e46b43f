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


def test_spread_random_parity_three_engines(spark):
    """Randomized sweep: the Morton spread expression evaluates
    identically in Spark, DuckDB, and the pure-Python reference over
    random 16-bit inputs — one batch per engine, not per-example."""
    import random

    import duckdb

    rng = random.Random(4099)
    vals = sorted({rng.randrange(0, 1 << 16) for _ in range(200)})
    sdf = spark.createDataFrame([(v,) for v in vals], "x bigint").select(
        "x", F.expr(_spread_sql("x")).alias("s")
    )
    got_spark = {r["x"]: r["s"] for r in sdf.collect()}
    con = duckdb.connect()
    got_duck = dict(
        con.execute(
            f"SELECT x, {_spread_sql('x')} FROM (SELECT unnest({vals}) AS x)"
        ).fetchall()
    )
    for v in vals:
        want = _py_spread(v)
        assert got_spark[v] == want, v
        assert got_duck[v] == want, v


def test_bootstrap_weights_random_parity_three_engines(spark):
    """Randomized sweep: the hash-seeded Poisson weight is identical in
    Spark, DuckDB, and a hashlib-based pure-Python reference for random
    (orderkey, replicate) pairs — the draw is pure integer compares, so
    any divergence is a hashing/threshold spelling bug."""
    import hashlib
    import random

    import duckdb

    from cdc_stream_batch_etl_spark.operators.bootstrap import (
        _H40_SPARK,
        _H40_SQL,
        _w_cases,
    )

    rng = random.Random(271828)
    pairs = sorted({(rng.randrange(1, 10**9), rng.randrange(0, 32)) for _ in range(150)})

    def py_w(k: int, r: int) -> int:
        h = int(hashlib.md5(f"{k}:{r}".encode()).hexdigest()[:10], 16)
        return sum(h >= t for t in _THRESHOLDS)

    sdf = spark.createDataFrame(pairs, "o_orderkey bigint, replicate int").select(
        "o_orderkey",
        "replicate",
        F.expr(_w_cases(_H40_SPARK)).alias("w"),
    )
    got_spark = {(r["o_orderkey"], r["replicate"]): r["w"] for r in sdf.collect()}
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE p AS SELECT * FROM (SELECT "
        "unnest(?) AS o_orderkey, unnest(?) AS replicate)",
        [[k for k, _ in pairs], [r for _, r in pairs]],
    )
    got_duck = {
        (k, r): w
        for k, r, w in con.execute(
            f"SELECT o_orderkey, replicate, {_w_cases(_H40_SQL)} FROM p"
        ).fetchall()
    }
    for k, r in pairs:
        want = py_w(k, r)
        assert got_spark[(k, r)] == want, (k, r)
        assert got_duck[(k, r)] == want, (k, r)


def test_balance_band_parity_on_negatives(spark):
    """The l-diversity balance band shifts cents positive BEFORE the
    integer division because Spark `div` truncates toward zero while
    DuckDB `//` floors — random balances dense around zero (the exact
    divergence zone) must band identically in both engines."""
    import random

    import duckdb

    from cdc_stream_batch_etl_spark.operators.privacy import _BAND_SPARK, _BAND_SQL

    rng = random.Random(1729)
    bals = sorted(
        {round(rng.uniform(-999.99, 9999.99), 2) for _ in range(200)}
        | {-999.99, -0.01, 0.0, 0.01, 1999.99, 2000.0, 9999.99}
    )
    sdf = spark.createDataFrame([(b,) for b in bals], "c_acctbal double").select(
        "c_acctbal", F.expr(_BAND_SPARK).alias("band")
    )
    got_spark = {r["c_acctbal"]: r["band"] for r in sdf.collect()}
    con = duckdb.connect()
    got_duck = dict(
        con.execute(
            f"SELECT c_acctbal, {_BAND_SQL} FROM (SELECT unnest({bals}::DOUBLE[]) AS c_acctbal)"
        ).fetchall()
    )
    for b in bals:
        assert got_spark[b] == got_duck[b], b


def test_percentile_interpolation_parity_random(spark):
    """quantalign (and price_deciles before it) leans on Spark exact
    `percentile` and DuckDB `quantile_cont` interpolating identically —
    randomized sweep over rough integer samples (odd/even sizes, heavy
    ties) at all nine deciles, bit-for-bit."""
    import random

    import duckdb

    rng = random.Random(9091)
    qs = [i / 10 for i in range(1, 10)]
    con = duckdb.connect()
    for trial in range(12):
        n = rng.choice([1, 2, 3, 7, 10, 101, 500])
        vals = [rng.randrange(0, 50) for _ in range(n)]  # small range: ties
        sdf = spark.createDataFrame([(v,) for v in vals], "x bigint").agg(
            F.percentile(F.col("x"), F.array(*[F.lit(q) for q in qs])).alias("p")
        )
        got_spark = sdf.collect()[0]["p"]
        got_duck = con.execute(
            f"SELECT quantile_cont(x, {qs}) FROM (SELECT unnest({vals}) AS x)"
        ).fetchone()[0]
        for i, (a, b) in enumerate(zip(got_spark, got_duck)):
            assert a == b, (trial, n, qs[i], a, b)
