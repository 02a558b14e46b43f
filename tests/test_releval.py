"""retrieval_ndcg_eval invariants + an independent pure-Python nDCG
recomputation from the two legs' own rank frames."""

import math

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.similarity.fusion import _lex_ranks, _sem_ranks
from cdc_stream_batch_etl_spark.similarity.releval import (
    EVAL_DEPTH,
    REL_DEPTH,
    retrieval_ndcg_eval,
)


def test_matches_pure_python_reference(spark, sf_dir):
    lex = {
        r.lex_rank: r.doc_id
        for r in _lex_ranks(spark, sf_dir).collect()
        if r.lex_rank <= EVAL_DEPTH
    }
    sem = {
        r.doc_id: r.sem_rank
        for r in _sem_ranks(spark, sf_dir).collect()
        if r.sem_rank <= REL_DEPTH
    }
    out = retrieval_ndcg_eval(spark, sf_dir).collect()
    assert [r.depth for r in out] == list(range(1, len(lex) + 1))

    dcg = 0.0
    idcg = 0.0
    hits = 0
    best_rr = 0.0
    for r in out:
        d = r.depth
        rel = REL_DEPTH + 1 - sem[lex[d]] if lex[d] in sem else 0
        assert r.rel == rel
        disc = 1.0 / math.log2(d + 1)
        dcg += rel * disc
        idcg += max(REL_DEPTH + 1 - d, 0) * disc
        hits += 1 if rel > 0 else 0
        if rel > 0:
            best_rr = max(best_rr, 1.0 / d)
        assert r.n_rel_cum == hits
        assert r.precision_at_d == hits / d
        assert abs(r.dcg_cum - dcg) < 1e-6
        assert abs(r.ndcg - dcg / idcg) < 1e-6
        assert r.rr_cum == best_rr


def test_ndcg_bounds_and_monotone_dcg(spark, sf_dir):
    out = retrieval_ndcg_eval(spark, sf_dir).collect()
    prev_dcg = 0.0
    for r in out:
        assert 0.0 <= r.ndcg <= 1.0
        assert r.dcg_cum >= prev_dcg - 1e-12  # running sum never decreases
        prev_dcg = r.dcg_cum
        assert 0.0 <= r.precision_at_d <= 1.0


def test_graded_fixture_is_not_degenerate(spark):
    # the driver-gate corpus must exercise BOTH branches: at sf0.01 the
    # lexical top-10 contains graded AND zero-relevance documents.
    # Derived from the test SF dir so the suite stays relocatable
    # (sf0.001 is too small for the guarantee, hence the sibling).
    import os

    from tests.conftest import SF_DIR

    sf001 = os.path.join(os.path.dirname(SF_DIR.rstrip("/")), "sf0.01")
    df = retrieval_ndcg_eval(spark, sf001)
    rels = [r.rel for r in df.collect()]
    assert any(x > 0 for x in rels) and any(x == 0 for x in rels)
    n_pos = sum(1 for x in rels if x > 0)
    assert n_pos >= 2  # a single hit would make nDCG a one-term constant


def test_rel_grades_are_consistent_with_sem_leg(spark, sf_dir):
    df = retrieval_ndcg_eval(spark, sf_dir)
    assert df.filter((F.col("rel") < 0) | (F.col("rel") > REL_DEPTH)).count() == 0
