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


def test_lsh_checkpoint_blocks_are_bounded(spark, sf_dir):
    # the r1 implementation persisted the band table and never released
    # it. Since r12, lsh_pairs DELIBERATELY materializes the shingle
    # frame once via an eager localCheckpoint (three consumers; a lazy
    # persist race-fills under composed full-outer consumers — the
    # lsh_recall_eval bimodality, OPTIMIZATION_r12.md). Checkpoint
    # blocks are ContextCleaner-managed (released on JVM GC, like the
    # LPA/ktruss/semantic checkpoints that already linger between
    # tests), so the guard is BOUNDEDNESS: exactly one block per call,
    # never a per-consumer or per-band accumulation.
    spark.catalog.clearCache()
    before = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    minhash_lsh_pairs(spark, sf_dir).count()
    minhash_lsh_pairs(spark, sf_dir).count()
    after = set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())
    assert len(after - before) <= 2, (
        f"two lsh_pairs calls may pin at most their two shingle "
        f"checkpoints, saw {len(after - before)} new blocks"
    )


def test_bucket_stats_report_dropped_mass(spark, sf_dir):
    from cdc_stream_batch_etl_spark.dedup.minhash import lsh_bucket_stats

    stats = {r.band: r for r in lsh_bucket_stats(spark, sf_dir).collect()}
    assert set(stats) == {0, 1, 2, 3}
    for r in stats.values():
        # sf0.001 corpus has no degenerate buckets — nothing dropped
        assert r.n_docs_dropped == 0
        assert r.max_bucket_size <= MAX_BUCKET


def test_semantic_max_cell_cap_fails_open(spark, sf_dir, tmp_path, monkeypatch):
    """The MAX_CELL pair-stage cap never binds at fixture scale, so the
    oracle gate alone proves nothing about the fail-open path. Plant a
    degenerate cell (identical embeddings, cap monkeypatched to 64):
    rows past the cap must be KEPT (fail open, conservative for training
    data), in-cap duplicates removed down to the smallest id, and
    semantic_cell_stats must report the skipped mass."""
    import os as _os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from cdc_stream_batch_etl_spark.dedup import semantic

    monkeypatch.setattr(semantic, "MAX_CELL", 64)
    n = 80  # one cell of 80 identical vectors > cap of 64
    planted = tmp_path / "degenerate"
    planted.mkdir()
    emb = [0.1] * 64
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(n), pa.int64()),
                "embedding": pa.array([emb] * n, pa.list_(pa.float32())),
                "label": pa.array([0] * n, pa.int32()),
            }
        ),
        str(planted / "embeddings.parquet"),
    )
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents"):
        _os.symlink(f"{sf_dir}/{t}.parquet", planted / f"{t}.parquet")

    out = {r.vec_id: r.kept for r in semantic.semantic_dedup(spark, str(planted)).collect()}
    assert len(out) == n
    in_cap = {v: k for v, k in out.items() if v < 64}
    overflow = {v: k for v, k in out.items() if v >= 64}
    assert in_cap[0] is True  # smallest id survives its dup group
    assert sum(1 for k in in_cap.values() if not k) == 63  # rest removed
    assert all(overflow.values()), "fail-open violated: overflow rows removed"

    stats = semantic.semantic_cell_stats(spark, str(planted)).collect()
    assert len(stats) == 1
    assert stats[0].n_cell == n
    assert stats[0].n_compared == 64
    assert stats[0].n_skipped == n - 64  # dropped mass is REPORTED
