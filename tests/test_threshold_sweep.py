"""Threshold-sweep invariants: monotone counts, theory-curve values,
and planted exact-duplicate candidates scoring 1.0 on both measures."""

import cdc_stream_batch_etl_spark.dedup.threshold_sweep as ts
from cdc_stream_batch_etl_spark.dedup.threshold_sweep import (
    PCTS,
    candidate_scores,
    minhash_threshold_sweep,
)


def test_sweep_monotone_and_theory(spark, sf_dir):
    rows = minhash_threshold_sweep(spark, sf_dir).collect()
    assert [r.threshold_pct for r in rows] == list(PCTS)
    n_cand = rows[0].n_candidates
    prev_exact = prev_est = n_cand + 1
    for r in rows:
        assert r.n_candidates == n_cand
        assert r.n_exact_ge <= prev_exact and r.n_est_ge <= prev_est
        prev_exact, prev_est = r.n_exact_ge, r.n_est_ge
        assert r.n_agree_ge <= min(r.n_exact_ge, r.n_est_ge)
        t = r.threshold_pct / 100.0
        assert abs(r.capture_theory - (1 - (1 - t**4) ** 4)) < 1e-12
        if r.n_est_ge:
            assert r.est_precision == r.n_agree_ge / r.n_est_ge


def test_planted_exact_duplicates_score_one(spark):
    text = "the quick brown fox jumps over the lazy dog again and again"
    other = "completely different words about spark catalyst tungsten arrow engines"
    docs = spark.createDataFrame(
        [(1, text), (2, text), (3, other)], "doc_id bigint, text string"
    )
    scored = {(r.doc_a, r.doc_b): r for r in candidate_scores(docs).collect()}
    assert (1, 2) in scored
    r = scored[(1, 2)]
    assert r.exact_j == 1.0 and r.est_j == 1.0
    # the unrelated doc shares no shingles, so it can only appear with
    # sub-threshold similarity (usually no candidate at all)
    for (a, b), s in scored.items():
        if 3 in (a, b):
            assert s.exact_j == 0.0


def test_sweep_matches_scores(spark, sf_dir):
    from cdc_stream_batch_etl_spark.catalog import load_table

    docs = load_table(spark, sf_dir, "documents")
    scores = candidate_scores(docs).collect()
    rows = {r.threshold_pct: r for r in minhash_threshold_sweep(spark, sf_dir).collect()}
    for pct in (5, 50, 95):
        t = pct / 100.0
        assert rows[pct].n_exact_ge == sum(1 for s in scores if s.exact_j >= t)
        assert rows[pct].n_est_ge == sum(1 for s in scores if s.est_j >= t)
