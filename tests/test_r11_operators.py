"""Planted-fixture tests for the round-11 operators — each one's
non-trivial path exercised against hand-computed expectations (the
sf0.01 driver fixture leaves some paths vacuous: e.g. its (custkey,
cents) blocks are all singletons, so blocking_efficiency_report's
multi-size histogram and cap logic only light up here)."""

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

import cdc_stream_batch_etl_spark.operators.basket as basket
import cdc_stream_batch_etl_spark.operators.blocking as blocking
import cdc_stream_batch_etl_spark.operators.tscv as tscv
import cdc_stream_batch_etl_spark.text.ccnet as ccnet
import cdc_stream_batch_etl_spark.text.divergence as dv
import cdc_stream_batch_etl_spark.text.epochs as epochs
import cdc_stream_batch_etl_spark.text.fertility as fertility
import cdc_stream_batch_etl_spark.text.lm as lm
import cdc_stream_batch_etl_spark.text.wilson as wilson
from cdc_stream_batch_etl_spark.operators.communities import (
    label_propagation_communities,
)


def _patch(monkeypatch, mod, df):
    monkeypatch.setattr(mod, "load_table", lambda s, d, t: df)


# ---------------------------------------------------------------------------
# label propagation: radius-3 min-label semantics on a planted path graph
# ---------------------------------------------------------------------------


def test_lpa_path_graph_radius_three(spark, monkeypatch):
    """Path 1-2-...-8 (each edge in 2 orders to clear MIN_SUPPORT):
    after 3 rounds node k holds min(1, k-3) -> label 1 covers nodes
    1..4, then 2,3,4,5 keep one node each."""
    rows = []
    order = 0
    for a in range(1, 8):  # edges (a, a+1)
        for _ in range(2):  # support 2
            order += 1
            rows += [(order, a), (order, a + 1)]
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    _patch(monkeypatch, basket, li)
    got = {
        r.community: r.n_members
        for r in label_propagation_communities(spark, "x").collect()
    }
    assert got == {1: 4, 2: 1, 3: 1, 4: 1, 5: 1}


def test_lpa_star_collapses_in_one_round(spark, monkeypatch):
    """Star centered at 1: every leaf is 1 hop from the center — one
    community containing all nodes."""
    rows = []
    order = 0
    for leaf in range(2, 7):
        for _ in range(2):
            order += 1
            rows += [(order, 1), (order, leaf)]
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    _patch(monkeypatch, basket, li)
    got = {
        r.community: r.n_members
        for r in label_propagation_communities(spark, "x").collect()
    }
    assert got == {1: 6}


# ---------------------------------------------------------------------------
# blocking efficiency: multi-size histogram + the cap
# ---------------------------------------------------------------------------


def test_blocking_histogram_and_cap(spark, monkeypatch):
    """Customer 1: 3 orders at $10 (block 3 -> 3 pairs); customer 2: 2 at
    $20 (1 pair); customer 3: 25 at $30 (capped, 300 pairs); 4 singletons."""
    rows = []
    oid = 0
    for _ in range(3):
        oid += 1
        rows.append((oid, 1, 10.0, dt.datetime(2024, 1, oid)))
    for _ in range(2):
        oid += 1
        rows.append((oid, 2, 20.0, dt.datetime(2024, 1, 1)))
    for _ in range(25):
        oid += 1
        rows.append((oid, 3, 30.0, dt.datetime(2024, 1, 1)))
    for c in (4, 5, 6, 7):
        oid += 1
        rows.append((oid, c, float(c), dt.datetime(2024, 1, 1)))
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_totalprice double, o_orderdate timestamp"
    )
    _patch(monkeypatch, blocking, orders)
    got = {r.block_size: r for r in blocking.blocking_efficiency_report(spark, "x").collect()}
    assert set(got) == {1, 2, 3, 25}
    assert (got[1].n_blocks, got[1].candidate_pairs, got[1].capped) == (4, 0, False)
    assert (got[2].n_blocks, got[2].candidate_pairs, got[2].capped) == (1, 1, False)
    assert (got[3].n_blocks, got[3].candidate_pairs, got[3].capped) == (1, 3, False)
    assert (got[25].n_blocks, got[25].candidate_pairs, got[25].capped) == (1, 300, True)
    total = 1 + 3 + 300
    assert got[25].candidate_share == 300.0 / total
    assert got[1].candidate_share == 0.0


# ---------------------------------------------------------------------------
# temporal CV: expanding windows never leak the future
# ---------------------------------------------------------------------------


def test_tscv_expanding_windows(spark, monkeypatch):
    """12 days, K=5 -> 6 blocks of 2 days; fold k trains on 2k days and
    tests on the next 2; test windows strictly follow train windows."""
    rows = [
        (d, 100, 10.0 * (d + 1), dt.datetime(2024, 1, d + 1))
        for d in range(12)
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_totalprice double, o_orderdate timestamp"
    )
    _patch(monkeypatch, tscv, orders)
    folds = {r.fold: r for r in tscv.time_series_cv_folds(spark, "x").collect()}
    assert set(folds) == {1, 2, 3, 4, 5}
    for k, r in folds.items():
        assert r.train_days == 2 * k and r.test_days == 2
        assert r.train_end < r.test_start  # no temporal leakage
        assert r.test_start == dt.date(2024, 1, 2 * k + 1)
        # revenue: day d+1 carries 10*(d+1); train covers days 1..2k
        assert float(r.train_revenue) == sum(10.0 * d for d in range(1, 2 * k + 1))
        assert float(r.test_revenue) == 10.0 * (2 * k + 1) + 10.0 * (2 * k + 2)


# ---------------------------------------------------------------------------
# Wilson interval: closed form vs an independent Python evaluation
# ---------------------------------------------------------------------------


def test_wilson_matches_python_closed_form(spark, monkeypatch):
    """4 docs, 1 passing (>=50 tokens, stopword ratio in range)."""
    passing = " ".join(["the"] + ["word"] * 60)  # 61 tokens, ratio ~0.016
    failing_short = "tiny doc"
    failing_stopless = " ".join(["word"] * 60)
    failing_stoppy = " ".join(["the"] * 60)
    docs = spark.createDataFrame(
        [
            (1, passing, "en", "srcA", len(passing)),
            (2, failing_short, "en", "srcA", len(failing_short)),
            (3, failing_stopless, "en", "srcA", len(failing_stopless)),
            (4, failing_stoppy, "en", "srcA", len(failing_stoppy)),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    _patch(monkeypatch, wilson, docs)
    r = wilson.wilson_quality_ci(spark, "x").collect()[0]
    assert (r.n_docs, r.n_pass) == (4, 1)
    z, n, p = wilson.Z, 4, 0.25
    center = p + z * z / (2 * n)
    half = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
    denom = 1 + z * z / n
    assert r.wilson_lo == pytest.approx((center - half) / denom, abs=1e-9)
    assert r.wilson_hi == pytest.approx((center + half) / denom, abs=1e-9)
    assert 0.0 <= r.wilson_lo < p < r.wilson_hi <= 1.0


# ---------------------------------------------------------------------------
# fertility: hand-counted tokens
# ---------------------------------------------------------------------------


def test_fertility_hand_counts(spark, monkeypatch):
    docs = spark.createDataFrame(
        [
            (1, "don't stop", "en", "s", 10),   # ws=2; bpe: don,'t,' stop' -> 3
            (2, "a b2 c", "fr", "s", 6),        # ws=3; bpe: a,' b',2,' c' -> 4
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    _patch(monkeypatch, fertility, docs)
    got = {r.lang: r for r in fertility.tokenizer_fertility(spark, "x").collect()}
    assert (got["en"].n_ws_tokens, got["en"].n_bpe_tokens) == (2, 3)
    assert got["en"].fertility == 1.5
    assert (got["fr"].n_ws_tokens, got["fr"].n_bpe_tokens) == (3, 4)
    assert got["en"].n_bytes == 10 and got["fr"].n_bytes == 6


# ---------------------------------------------------------------------------
# epoch allocation: halving-returns ledger is exact
# ---------------------------------------------------------------------------


def test_epoch_allocation_exact_ledger(spark, monkeypatch):
    docs = spark.createDataFrame(
        [(1, " ".join(["w"] * 100), "en", "sA", 199)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    _patch(monkeypatch, epochs, docs)
    rows = {r.epochs: r for r in epochs.epoch_allocation_plan(spark, "x").collect()}
    assert rows[1].d_tokens == 100
    # E(R) = D * (2 - 2^(1-R)): 100, 150, 175, 187.5, 193.75, 196.875
    expect = {1: 100.0, 2: 150.0, 3: 175.0, 4: 187.5, 5: 193.75, 6: 196.875}
    for r_, e in expect.items():
        assert rows[r_].effective_tokens == e  # exact binary fractions
        assert rows[r_].tokens_spent == 100 * r_
        assert rows[r_].marginal_effective_per_token == 1.0 / 2 ** (r_ - 1)
    # utilization strictly decreasing — the diminishing-returns signature
    u = [rows[r_].utilization for r_ in range(1, 7)]
    assert all(a > b for a, b in zip(u, u[1:]))


# ---------------------------------------------------------------------------
# ccnet buckets: equal-mass terciles, head >= middle >= tail by score
# ---------------------------------------------------------------------------


def test_ccnet_terciles_order_and_mass(spark, sf_dir):
    rows = ccnet.ccnet_lm_buckets(spark, sf_dir).collect()
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r.lang, {})[r.bucket] = r
    for lang, b in by_lang.items():
        assert set(b) == {"head", "middle", "tail"}, lang
        # ntile: bucket sizes differ by at most 1
        sizes = [b[k].n_docs for k in ("head", "middle", "tail")]
        assert max(sizes) - min(sizes) <= 1
        # score bands are ordered and non-overlapping
        assert b["head"].min_score >= b["middle"].max_score
        assert b["middle"].min_score >= b["tail"].max_score


# ---------------------------------------------------------------------------
# divergence: identical distribution -> TV 0; disjoint vocab -> hand value
# ---------------------------------------------------------------------------


def test_divergence_single_source_is_zero(spark, monkeypatch):
    docs = spark.createDataFrame(
        [(1, "x y x", "en", "only", 5), (2, "y x", "en", "only", 3)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    _patch(monkeypatch, dv, docs)
    r = dv.source_divergence_report(spark, "x").collect()[0]
    assert r.tv_distance == 0.0  # p == q term-exact
    assert r.bhattacharyya == pytest.approx(1.0, abs=1e-12)


def test_divergence_disjoint_sources(spark, monkeypatch):
    """Two sources, disjoint vocab, equal mass: q = 0.25 on each of 4
    words; each p = 0.5 on its own 2 words. TV = 0.5; BC = sqrt(1/8)*4/2
    per source... computed by hand: sum over own words sqrt(0.5*0.25)*2."""
    docs = spark.createDataFrame(
        [(1, "aa bb", "en", "s1", 5), (2, "cc dd", "en", "s2", 5)],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    _patch(monkeypatch, dv, docs)
    got = {r.source: r for r in dv.source_divergence_report(spark, "x").collect()}
    for s in ("s1", "s2"):
        assert got[s].n_vocab == 4
        # own words: |0.5-0.25|*2; foreign: |0-0.25|*2 -> total 1.0 -> TV 0.5
        assert got[s].tv_distance == pytest.approx(0.5, abs=1e-12)
        assert got[s].bhattacharyya == pytest.approx(
            2 * math.sqrt(0.5 * 0.25), abs=1e-12
        )


# ---------------------------------------------------------------------------
# HLL: operating-range accuracy + register determinism
# ---------------------------------------------------------------------------


def test_hll_accuracy_in_operating_range(spark):
    """n=1500 distinct > 2.5m/…: raw HLL's standard error is
    1.04/sqrt(512) ≈ 4.6%; assert the estimate lands within 3σ."""
    import cdc_stream_batch_etl_spark.operators.hll as hll

    ev = spark.range(1500).selectExpr(
        "id AS user_id", "'purchase' AS event_type"
    )
    orig = hll.load_table
    try:
        hll.load_table = lambda s, d, t: ev  # noqa: ARG005
        r = hll.hll_distinct_by_type(spark, "x").collect()[0]
    finally:
        hll.load_table = orig
    assert r.n_distinct_exact == 1500
    assert abs(r.raw_estimate - 1500) / 1500 < 3 * 1.04 / math.sqrt(512)
    assert r.registers_used + r.empty_registers == 512


# ---------------------------------------------------------------------------
# k-core: planted graph with a known 3-core
# ---------------------------------------------------------------------------


def test_kcore_peels_tendrils_keeps_clique(spark, monkeypatch):
    """K4 clique (every node degree 3) + a chain hanging off it: one
    peel removes the whole chain, the clique is the 3-core fixpoint."""
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),  # K4
             (4, 5), (5, 6), (6, 7)]                          # tendril
    rows = []
    order = 0
    for a, b in edges:
        for _ in range(2):  # clear MIN_SUPPORT
            order += 1
            rows += [(order, a), (order, b)]
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    _patch(monkeypatch, basket, li)
    from cdc_stream_batch_etl_spark.operators.kcore import k_core_decomposition

    got = {r.round: (r.nodes_remaining, r.edges_remaining)
           for r in k_core_decomposition(spark, "x").collect()}
    assert got[0] == (7, 9)
    # one peel removes the whole tendril (degrees 2, 2, 1 all < 3);
    # the K4 clique is the 3-core fixpoint — rounds 2 and 3 hold it,
    # and the equal consecutive rows make convergence visible
    assert got[1] == (4, 6)
    assert got[2] == (4, 6)
    assert got[3] == (4, 6)


# ---------------------------------------------------------------------------
# Kaplan-Meier: hand-computed curve with censoring
# ---------------------------------------------------------------------------


def test_km_hand_computed_with_censoring(spark, monkeypatch):
    """3 customers: A orders at day 0 and day 14 (event gap 2 weeks,
    then censored 2w to the horizon at day 28); B at day 0 and 28
    (event 4w, censored 0w); C at day 0 only (censored 4w).
    Observations: events {2w, 4w}, censored {2w, 0w, 4w}.
    n_risk(2w) = 4 (all with time >= 2: two 2w, two 4w), d(2)=1 -> S=0.75
    n_risk(4w) = 2, d(4)=1 -> S = 0.75 * 0.5 = 0.375."""
    import cdc_stream_batch_etl_spark.operators.survival as sv

    d0, d14, d28 = (dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 15),
                    dt.datetime(2024, 1, 29))
    rows = [
        (1, 10, 1.0, d0), (2, 10, 1.0, d14),
        (3, 20, 1.0, d0), (4, 20, 1.0, d28),
        (5, 30, 1.0, d0),
    ]
    orders = spark.createDataFrame(
        rows, "o_orderkey bigint, o_custkey bigint, o_totalprice double, o_orderdate timestamp"
    )
    _patch(monkeypatch, sv, orders)
    got = {r.t_weeks: r for r in sv.repurchase_survival_km(spark, "x").collect()}
    assert set(got) == {2, 4}
    assert (got[2].n_risk, got[2].d_events) == (4, 1)
    assert got[2].survival == 0.75
    assert (got[4].n_risk, got[4].d_events) == (2, 1)
    assert got[4].survival == 0.375
