"""Corpus scaling-law fits vs an independent pure-Python reference on a
constructed corpus (exact V(N) grid, OLS closed form), plus driver-data
sanity on the fit outputs."""

import math
from collections import Counter

from cdc_stream_batch_etl_spark.text.laws import (
    GRID_DIVS,
    ZIPF_RANKS,
    heaps_law_fit,
    zipf_law_fit,
)


def _ols(points):
    n = len(points)
    sx = sum(x for x, _ in points)
    sy = sum(y for _, y in points)
    sxx = sum(x * x for x, _ in points)
    syy = sum(y * y for _, y in points)
    sxy = sum(x * y for x, y in points)
    cov = n * sxy - sx * sy
    varx = n * sxx - sx * sx
    vary = n * syy - sy * sy
    slope = cov / varx
    return slope, (sy - slope * sx) / n, (cov * cov) / (varx * vary)


def _heaps_reference(docs):
    """docs: list of (doc_id, source, text) — replicates the operator's
    exact grid semantics token by token."""
    by_source = {}
    for _, src, text in sorted(docs):
        by_source.setdefault(src, []).extend(text.split(" "))
    out = {}
    for src, toks in by_source.items():
        t = len(toks)
        first = {}
        for i, w in enumerate(toks):
            first.setdefault(w, i)
        pts = []
        for d in GRID_DIVS:
            n_prefix = max(1, t // d)
            v = sum(1 for idx in first.values() if idx < n_prefix)
            pts.append((math.log(n_prefix), math.log(v)))
        beta, icpt, r2 = _ols(pts)
        out[src] = (t, len(first), beta, math.exp(icpt), r2)
    return out


def test_heaps_matches_python_reference(spark, sf_dir):
    docs = [
        (r.doc_id, r.source, r.text)
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    ]
    ref = _heaps_reference(docs)
    for r in heaps_law_fit(spark, sf_dir).collect():
        t, vocab, beta, k, r2 = ref[r.source]
        assert r.total_tokens == t
        assert r.vocab_size == vocab
        assert r.n_points == len(GRID_DIVS)
        assert abs(r.heaps_beta - beta) < 1e-6
        assert abs(r.heaps_k - k) < 1e-6
        assert abs(r.r2 - r2) < 1e-6


def test_zipf_matches_python_reference(spark, sf_dir):
    rows = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    by_source = {}
    for r in rows:
        by_source.setdefault(r.source, Counter()).update(r.text.split(" "))
    out = {r.source: r for r in zipf_law_fit(spark, sf_dir).collect()}
    assert set(out) == set(by_source)
    for src, wc in by_source.items():
        ranked = sorted(wc.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_RANKS]
        pts = [
            (math.log(i + 1), math.log(cnt))
            for i, (_, cnt) in enumerate(ranked)
        ]
        slope, icpt, r2 = _ols(pts)
        r = out[src]
        assert r.n_points == len(ranked)
        assert r.top_cnt == ranked[0][1]
        assert abs(r.zipf_slope - slope) < 1e-6
        assert abs(r.zipf_intercept - icpt) < 1e-6
        assert abs(r.r2 - r2) < 1e-6


def test_degenerate_repetitive_source_gets_low_beta(spark):
    # pure boilerplate: vocabulary saturates immediately -> beta ~ 0
    df = spark.createDataFrame(
        [(i, "loop", "a b c a b c a b c a b c a b c a b c") for i in range(20)],
        "doc_id bigint, source string, text string",
    )
    import cdc_stream_batch_etl_spark.text.laws as laws
    import cdc_stream_batch_etl_spark.catalog as catalog

    orig = catalog.load_table
    try:
        catalog.load_table = lambda s, d, t: df  # noqa: ARG005
        laws.load_table = catalog.load_table
        r = laws.heaps_law_fit(spark, "unused").collect()[0]
    finally:
        catalog.load_table = orig
        laws.load_table = orig
    assert r.vocab_size == 3
    assert r.heaps_beta < 0.25  # saturated growth
