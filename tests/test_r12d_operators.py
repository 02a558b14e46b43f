"""Round-12 fourth batch: independent re-derivations for the
split-conformal interval, the MI/NMI matrix, and the Local Outlier
Factor — properties the DuckDB oracle sweep can't express (the
conformal guarantee, the information inequalities, LOF's uniform-case
behavior)."""

import math

import numpy as np
import pyspark.sql.functions as F

from cdc_stream_batch_etl_spark import registry
from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.operators.conformal import (
    ALPHA_DEN,
    ALPHA_NUM,
    LAG,
    conformal_forecast_intervals,
)
from cdc_stream_batch_etl_spark.operators.mutualinfo import (
    _MI_PAIRS,
    mutual_information_matrix,
)
from cdc_stream_batch_etl_spark.similarity.lof import (
    K,
    SAMPLE,
    TOP,
    embedding_lof,
)

registry.load_all()


# ------------------------------------------------------------------ conformal


def test_conformal_matches_direct_derivation(spark, sf_dir):
    """Whole pipeline re-derived in plain Python: daily cents, row-lag
    forecast, half split, exact ceil-rank quantile, coverage count."""
    orders = load_table(spark, sf_dir, "orders")
    daily = sorted(
        (r.day, r.cents)
        for r in orders.groupBy(F.to_date("o_orderdate").alias("day"))
        .agg(
            (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .collect()
    )
    vals = [c for _, c in daily]
    resid = [abs(vals[i] - vals[i - LAG]) for i in range(LAG, len(vals))]
    n_cal = len(resid) // 2
    cal, test = resid[:n_cal], resid[n_cal:]
    qidx = -(-ALPHA_NUM * (n_cal + 1) // ALPHA_DEN)  # ceil
    q_hat = sorted(cal)[qidx - 1]
    covered = sum(1 for x in test if x <= q_hat)
    r = conformal_forecast_intervals(spark, sf_dir).first()
    assert r.n_cal == n_cal
    assert r.n_test == len(test)
    assert r.q_hat_cents == q_hat
    assert r.n_covered == covered
    assert abs(r.coverage - covered / len(test)) < 1e-12
    assert abs(r.test_mae_dollars - sum(test) / len(test) / 100) < 1e-9


def test_conformal_coverage_near_nominal(spark, sf_dir):
    """The split-conformal guarantee: realized coverage >= 1 - alpha -
    slack (exchangeability holds — the split is temporal but the series
    is stationary noise around a level at test SFs)."""
    r = conformal_forecast_intervals(spark, sf_dir).first()
    assert r.coverage >= ALPHA_NUM / ALPHA_DEN - 0.1
    assert r.q_hat_cents >= 0


# ------------------------------------------------------------------------- mi


def test_mi_matches_numpy_contingency(spark, sf_dir):
    """Every pair's MI/H re-derived from the raw contingency table with
    numpy logs."""
    out = {
        (r.table_name, r.x_col): r
        for r in mutual_information_matrix(spark, sf_dir).collect()
    }
    for table, x, y in _MI_PAIRS:
        df = load_table(spark, sf_dir, table).groupBy(x, y).count().collect()
        c = np.array([r["count"] for r in df], dtype=float)
        xs = [r[x] for r in df]
        ys = [r[y] for r in df]
        n = c.sum()
        cx = {v: sum(ci for ci, xi in zip(c, xs) if xi == v) for v in set(xs)}
        cy = {v: sum(ci for ci, yi in zip(c, ys) if yi == v) for v in set(ys)}
        mi = sum(
            (ci / n) * math.log(ci * n / (cx[xi] * cy[yi]))
            for ci, xi, yi in zip(c, xs, ys)
        )
        hx = -sum((v / n) * math.log(v / n) for v in cx.values())
        hy = -sum((v / n) * math.log(v / n) for v in cy.values())
        r = out[(table, x)]
        assert r.n == int(n) and r.n_cells == len(df)
        assert abs(r.mi_nats - mi) < 1e-8
        assert abs(r.h_x - hx) < 1e-8 and abs(r.h_y - hy) < 1e-8
        assert abs(r.nmi - mi / math.sqrt(hx * hy)) < 1e-8


def test_mi_information_inequalities(spark, sf_dir):
    """0 <= MI <= min(Hx, Hy); 0 <= NMI <= 1 (+ rounding slack)."""
    for r in mutual_information_matrix(spark, sf_dir).collect():
        assert -1e-9 <= r.mi_nats <= min(r.h_x, r.h_y) + 1e-9
        assert -1e-9 <= r.nmi <= 1 + 1e-9


# ------------------------------------------------------------------------ lof


def test_lof_matches_direct_numpy(spark, sf_dir):
    """Full LOF re-derivation in numpy on the same md5 sample: squared
    distances (9-rounded), (d2, id) kNN, reach/lrd/lof."""
    import hashlib

    emb = load_table(spark, sf_dir, "embeddings").collect()
    byid = {r.vec_id: np.array(r.embedding, dtype=np.float64) for r in emb}
    ids = sorted(
        byid, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i)
    )[:SAMPLE]
    n = len(ids)
    vecs = np.stack([byid[i] for i in ids])
    d2 = ((vecs[:, None, :] - vecs[None, :, :]) ** 2).sum(-1).round(9)
    knn, kdist = {}, {}
    for ai in range(n):
        order = sorted(
            (float(d2[ai, bi]), ids[bi], bi) for bi in range(n) if bi != ai
        )[:K]
        knn[ai] = [bi for _, _, bi in order]
        kdist[ai] = math.sqrt(order[-1][0])
    lrd = {}
    for ai in range(n):
        s = sum(
            max(kdist[bi], math.sqrt(float(d2[ai, bi]))) for bi in knn[ai]
        )
        lrd[ai] = K / s
    lof = {
        ids[ai]: sum(lrd[bi] for bi in knn[ai]) / (K * lrd[ai])
        for ai in range(n)
    }
    expected = sorted(lof.items(), key=lambda kv: (-kv[1], kv[0]))[:TOP]
    got = embedding_lof(spark, sf_dir).collect()
    assert [r.vec_id for r in got] == [i for i, _ in expected]
    for r, (_, val) in zip(got, expected):
        assert abs(r.lof - val) < 1e-6
        assert r.lof >= 0


def test_lof_scores_bounded_below_by_inlier_regime(spark, sf_dir):
    """LOF of the REPORTED top anomalies must exceed the theoretical
    deep-inlier score floor (lof -> ~1 in uniform regions): the top-20
    list should not be dominated by lof < 1 rows."""
    got = embedding_lof(spark, sf_dir).collect()
    assert len(got) == TOP
    assert got[0].lof >= got[-1].lof
    assert got[0].lof > 1.0
