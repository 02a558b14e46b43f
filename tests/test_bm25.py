"""BM25 behavior contracts beyond the oracle hash-match
(test_queries.py covers exact cross-engine parity): ranking semantics
that would survive a refactor of the arithmetic but break if the
scoring logic inverted."""

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.text.bm25 import bm25_scores


def test_absent_term_contributes_nothing(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    base = {r.doc_id: r.score for r in bm25_scores(docs, ("spark", "merge")).collect()}
    padded = {
        r.doc_id: r.score
        for r in bm25_scores(docs, ("spark", "merge", "zqxjkvbn")).collect()
    }
    assert base == padded  # a term matching no document changes nothing


def test_more_matched_terms_beats_fewer_at_equal_length(spark, sf_dir):
    """On synthetic docs of EQUAL length (so the dl normalization
    cancels), matching two query terms must outscore matching one."""
    rows = [
        (1, "spark merge alpha beta"),
        (2, "spark gamma delta epsilon"),
        (3, "zeta eta theta iota"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in bm25_scores(docs, ("spark", "merge")).collect()}
    assert 3 not in got  # no match, no row
    assert got[1].n_terms_matched == 2 and got[2].n_terms_matched == 1
    assert got[1].score > got[2].score


def test_rarer_term_weighs_more(spark, sf_dir):
    """Rational IDF: with one term in 3 docs and another in 1, the
    single doc holding only the rare term outscores a doc holding only
    the common term (equal tf, equal dl)."""
    rows = [
        (1, "common rare pad1 pad2"),
        (2, "common pad1 pad2 pad3"),
        (3, "common pad4 pad5 pad6"),
        (4, "rare pad7 pad8 pad9"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.score for r in bm25_scores(docs, ("common", "rare")).collect()}
    assert got[4] > got[2]
