"""Vocabulary-coverage contracts beyond the oracle (text/vocab.py):
arithmetic identities, the deterministic top-V cut under ties, and a
planted-OOV source."""

import duckdb

from cdc_stream_batch_etl_spark.text.vocab import VOCAB_V, vocab_coverage


def test_identities_and_bounds(spark, sf_dir):
    rows = vocab_coverage(spark, sf_dir).collect()
    assert rows, "no sources"
    for r in rows:
        assert r.total_occ == r.covered_occ + r.oov_occ
        assert 0.0 <= r.coverage_r <= 1.0
        assert r.oov_types >= 0
        # covered occurrences imply the vocab intersects this source
        if r.covered_occ:
            assert r.coverage_r > 0.0


def test_vocab_cut_matches_independent_truth(spark, sf_dir):
    """Recompute coverage against an INDEPENDENTLY derived top-V set
    (python Counter, not SQL) — catches a wrong tie-break or off-by-one
    in the LIMIT in both engines at once."""
    from collections import Counter

    docs = duckdb.sql(
        f"SELECT source, text FROM read_parquet('{sf_dir}/documents.parquet')"
    ).fetchall()
    cnt = Counter()
    per_source = {}
    for source, text in docs:
        toks = text.split(" ")
        cnt.update(toks)
        per_source.setdefault(source, []).extend(toks)
    vocab = {
        w for w, _ in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_V]
    }
    got = {r.source: r for r in vocab_coverage(spark, sf_dir).collect()}
    assert set(got) == set(per_source)
    for source, toks in per_source.items():
        covered = sum(1 for t in toks if t in vocab)
        assert got[source].total_occ == len(toks)
        assert got[source].covered_occ == covered
        assert got[source].oov_types == len(
            {t for t in toks if t not in vocab}
        )
