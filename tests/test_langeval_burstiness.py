"""Planted-fixture tests for the lang-ID eval tables and the
burstiness index (periodic vs bursty arrivals, confusion margins)."""

import datetime as dt
import math

import cdc_stream_batch_etl_spark.operators.burstiness as bz
from cdc_stream_batch_etl_spark.text.langeval import (
    lang_id_class_metrics,
    lang_id_confusion,
)


def test_confusion_margins_and_metrics_agree(spark, sf_dir):
    cells = lang_id_confusion(spark, sf_dir).collect()
    metrics = {r.cls: r for r in lang_id_class_metrics(spark, sf_dir).collect()}
    # row shares sum to 1 per declared lang
    by_lang = {}
    for c in cells:
        by_lang.setdefault(c.lang, []).append(c)
    for lang, rows in by_lang.items():
        assert abs(sum(r.share_of_declared for r in rows) - 1.0) < 1e-12
        support = sum(r.n for r in rows)
        assert metrics[lang].support == support
        tp = sum(r.n for r in rows if r.is_match)
        assert metrics[lang].tp == tp
        assert metrics[lang].fn == support - tp
    # fp cross-check: predicted-column margin minus tp
    pred_margin = {}
    for c in cells:
        pred_margin[c.predicted_lang] = pred_margin.get(c.predicted_lang, 0) + c.n
    for cls, m in metrics.items():
        assert m.fp == pred_margin.get(cls, 0) - m.tp
        if m.precision is not None and m.recall not in (None, 0.0) and m.f1 is not None:
            p, r = m.precision, m.recall
            assert abs(m.f1 - 2 * p * r / (p + r)) < 1e-12


def _burst(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    orig = bz.load_table
    try:
        bz.load_table = lambda s, d, t: df  # noqa: ARG005
        return {r.event_type: r for r in bz.event_burstiness(spark, "x").collect()}
    finally:
        bz.load_table = orig


T0 = dt.datetime(2024, 1, 1)


def test_periodic_arrivals_have_burstiness_minus_one(spark):
    rows = [
        (i, T0 + dt.timedelta(seconds=10 * i), 1, "beat") for i in range(12)
    ]
    r = _burst(spark, rows)["beat"]
    assert r.n_gaps == 11
    assert r.mean_gap_us == 10_000_000.0
    assert r.std_gap_us == 0.0
    assert r.cv == 0.0 and r.burstiness == -1.0


def test_zero_gap_type_yields_null_cv_and_burstiness(spark):
    """All same-type events at identical timestamps → every gap is 0 µs,
    mean = 0: cv and burstiness must be NULL (guarded 0/0), never NaN
    (r10 ADVICE — cross-engine NaN bits are outside the determinism
    argument)."""
    rows = [(i, T0, 1, "sametick") for i in range(5)]
    r = _burst(spark, rows)["sametick"]
    assert r.n_gaps == 4
    assert r.mean_gap_us == 0.0 and r.std_gap_us == 0.0
    assert r.cv is None and r.burstiness is None


def test_bursty_arrivals_match_python_moments(spark):
    gaps = [1, 1, 1, 1, 1, 1, 1, 1, 1, 991]  # a storm then a long lull
    ts, rows = 0, [(0, T0, 1, "burst")]
    for i, g in enumerate(gaps, 1):
        ts += g
        rows.append((i, T0 + dt.timedelta(seconds=ts), 1, "burst"))
    r = _burst(spark, rows)["burst"]
    mu = sum(gaps) / len(gaps) * 1e6
    var = sum((g * 1e6) ** 2 for g in gaps) / len(gaps) - mu * mu
    sd = math.sqrt(var)
    assert r.n_gaps == len(gaps)
    assert abs(r.mean_gap_us - mu) < 1e-3
    assert abs(r.std_gap_us - sd) < 1e-3
    # exact closed form: B = (sd - mu) / (sd + mu), positive = bursty
    assert abs(r.burstiness - (sd - mu) / (sd + mu)) < 1e-9
    assert r.burstiness > 0.4
    # per-user isolation: gaps never span users
    rows2 = [(100, T0, 2, "burst"), (101, T0 + dt.timedelta(seconds=5), 2, "burst")]
    r2 = _burst(spark, rows + rows2)["burst"]
    assert r2.n_gaps == len(gaps) + 1
