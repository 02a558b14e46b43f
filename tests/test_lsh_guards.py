"""Guards on the MinHash-LSH candidate generator: bucket-size cap and
no cached-RDD leaks (VERDICT r1 items 2 and 3)."""

import pytest
from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.dedup.minhash import (
    MAX_BUCKET,
    lsh_pairs,
    minhash_lsh_pairs,
)


def _identical_corpus(spark, n):
    """n documents with identical text — every band hashes to one bucket."""
    text = " ".join(f"w{i % 7}" for i in range(40))
    return spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(text).alias("text")
    )


def test_degenerate_bucket_is_dropped(spark):
    # 4 * MAX_BUCKET identical docs: uncapped LSH would emit C(256,2)=32640
    # candidate pairs per band; the cap drops the bucket entirely.
    docs = _identical_corpus(spark, 4 * MAX_BUCKET)
    assert lsh_pairs(docs).count() == 0


def test_bucket_at_cap_still_pairs(spark):
    # exactly MAX_BUCKET identical docs: bucket is AT the cap, kept;
    # all C(cap,2) pairs verify at jaccard 1.0.
    docs = _identical_corpus(spark, MAX_BUCKET)
    rows = lsh_pairs(docs).collect()
    assert len(rows) == MAX_BUCKET * (MAX_BUCKET - 1) // 2
    assert all(r.jaccard == 1.0 for r in rows)
    assert all(r.doc_a < r.doc_b for r in rows)


def test_candidate_count_bounded_by_cap(spark):
    # mixed corpus: one degenerate cluster over the cap + distinct docs.
    # Total pairs must stay below the per-bucket bound times bucket count,
    # i.e. the degenerate cluster contributes nothing.
    over = _identical_corpus(spark, MAX_BUCKET + 1)
    distinct = spark.range(100).select(
        (F.col("id") + 10_000).alias("doc_id"),
        F.concat(F.lit("unique document number "), F.col("id").cast("string"),
                 F.lit(" with its own words "),
                 F.sha2(F.col("id").cast("string"), 256)).alias("text"),
    )
    pairs = lsh_pairs(over.unionByName(distinct)).collect()
    assert pairs == []


def test_no_cached_rdds_after_lsh(spark, sf_dir):
    # the r1 implementation persisted the band table and never released it;
    # the groupBy-bucket rewrite caches nothing at all.
    # other tests' localCheckpoints may linger in the shared session, so
    # the invariant is "LSH adds nothing", not an absolute zero
    # lingering checkpoint blocks from other tests may be GC-released
    # mid-test, so compare RDD id SETS (nothing NEW), not counts
    spark.catalog.clearCache()
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    minhash_lsh_pairs(spark, sf_dir).count()
    minhash_lsh_pairs(spark, sf_dir).count()
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert after <= before


def test_bucket_stats_report_dropped_mass(spark, sf_dir):
    from cdc_stream_batch_etl_spark.dedup.minhash import lsh_bucket_stats

    stats = {r.band: r for r in lsh_bucket_stats(spark, sf_dir).collect()}
    assert set(stats) == {0, 1, 2, 3}
    for r in stats.values():
        # sf0.001 corpus has no degenerate buckets — nothing dropped
        assert r.n_docs_dropped == 0
        assert r.max_bucket_size <= MAX_BUCKET
