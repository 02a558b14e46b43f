"""clean_corpus invariants: gates and dedups actually hold on the output."""

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.dedup.minhash import lsh_pairs
from cdc_stream_batch_etl_spark.text.corpus import MIN_TOKENS, clean_corpus


def test_clean_corpus_invariants(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = clean_corpus(spark, sf_dir)
    kept = {r.doc_id for r in out.collect()}
    assert kept, "empty cleaned corpus"
    assert len(kept) < docs.count(), "nothing was filtered"

    # token gate holds
    assert out.filter(F.col("n_tokens") < MIN_TOKENS).count() == 0

    # exact dedup holds: no two survivors share normalized content
    survivors = docs.filter(F.col("doc_id").isin(list(kept)))
    dup_groups = (
        survivors.groupBy(F.md5(F.lower(F.trim("text"))).alias("h"))
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup_groups == 0

    # near-dup prune holds: no LSH-verified pair survives intact
    remaining_pairs = lsh_pairs(survivors.select("doc_id", "text")).count()
    assert remaining_pairs == 0


def test_clean_corpus_scale_mode_identical_and_fewer_scans(spark, sf_dir):
    """materialize_survivors (the r13 default) must be value-identical
    to the recompute path, with the corpus scan count collapsed."""
    from cdc_stream_batch_etl_spark.plans.inspect import profile

    recompute = clean_corpus(spark, sf_dir, materialize_survivors=False)
    default = clean_corpus(spark, sf_dir)  # r13: materializes
    assert default.exceptAll(recompute).count() == 0
    assert recompute.exceptAll(default).count() == 0

    p_recompute, p_default = profile(recompute), profile(default)
    assert p_default.scans <= 6  # survivors checkpointed, consumers reuse
    assert p_default.scans < p_recompute.scans


def test_gate_funnel_consistent_with_clean_corpus(spark, sf_dir):
    """The funnel's stage counts must be monotonically non-increasing and
    agree with clean_corpus: its exact-dedup survivor count minus the
    LSH-removed docs is exactly what clean_corpus returns."""
    from cdc_stream_batch_etl_spark.text.funnel_gates import corpus_gate_funnel

    stages = {r.stage: r for r in corpus_gate_funnel(spark, sf_dir).collect()}
    order = ["ingest", "quality_gate", "lang_gate", "exact_dedup"]
    counts = [stages[s].n_docs for s in order]
    assert counts == sorted(counts, reverse=True)
    for prev, cur in zip(order, order[1:]):
        assert stages[cur].n_removed == stages[prev].n_docs - stages[cur].n_docs
    clean_n = clean_corpus(spark, sf_dir).count()
    assert clean_n <= stages["exact_dedup"].n_docs
    assert stages["ingest"].survivor_ratio == 1.0
