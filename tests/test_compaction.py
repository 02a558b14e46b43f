"""Small-file compaction: a fragmented table (many tiny files — the
post-streaming-merge shape) compacts to the byte-budget file count,
preserving rows, values and hive partitioning — committed via the
immutable commit-marker protocol (write a fresh _vN dir, then CREATE
the empty _commit_N marker; markers are only ever created or deleted
whole, never rewritten — the interim single-pointer _CURRENT scheme is
swept as debris), so a concurrent reader never observes a missing or
half-written table."""

import os
import shutil
import threading

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.catalog import (
    compact_partitions,
    load_versioned,
    resolve_table_path,
    with_versioned_retry,
)


def test_compacts_fragmented_table(spark, tmp_path):
    path = str(tmp_path / "frag")
    # 40 single-row files — the micro-batch fragmentation shape
    spark.range(40).select(
        F.col("id"), (F.col("id") * 2).alias("v")
    ).repartition(40).write.parquet(path)
    before = spark.read.parquet(path)
    n_before = len(before.inputFiles())
    # round-robin repartition leaves some of the 40 slots empty (empty
    # partitions write no file) — fragmented is fragmented either way
    assert n_before > 10
    expected = {(r.id, r.v) for r in before.collect()}

    stats = compact_partitions(spark, path)
    assert stats["files_before"] == n_before
    # tiny table, huge target → everything lands in ONE file
    assert stats["files_after"] == 1
    after = load_versioned(spark, path)
    assert len(after.inputFiles()) == 1
    assert {(r.id, r.v) for r in after.collect()} == expected
    # migration keeps the legacy root files through one compaction: a
    # NON-resolving legacy reader still sees the complete old table
    assert spark.read.parquet(path).count() == 40


def test_compaction_preserves_hive_partitions(spark, tmp_path):
    path = str(tmp_path / "part")
    df = spark.range(30).select(
        F.col("id"), (F.col("id") % 3).alias("p")
    )
    # fragment each partition directory
    df.repartition(10).write.partitionBy("p").parquet(path)
    before_files = len(spark.read.parquet(path).inputFiles())
    assert before_files > 3

    stats = compact_partitions(spark, path, partition_cols=("p",))
    after = load_versioned(spark, path)
    assert stats["files_after"] < before_files
    # partition pruning still works post-compaction
    pruned = after.filter(F.col("p") == 1)
    assert pruned.count() == 10
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(p" in plan or "p#" in plan
    # all rows and values intact
    assert {(r.id, r.p) for r in after.collect()} == {
        (i, i % 3) for i in range(30)
    }


def test_partitioned_compaction_honors_byte_budget(spark, tmp_path):
    """A hive partition bigger than target_bytes must split into
    multiple files while a tiny sibling stays single-file — the
    repartition-on-partition-cols-alone failure mode gave one file per
    directory regardless of size."""
    path = str(tmp_path / "skewed")
    big = spark.range(60_000).select(
        F.lit(0).alias("p"),
        F.col("id"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    small = spark.range(5).select(
        F.lit(1).alias("p"),
        F.col("id"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    big.unionByName(small).repartition(20).write.partitionBy("p").parquet(path)

    compact_partitions(spark, path, target_bytes=256 * 1024, partition_cols=("p",))
    after = load_versioned(spark, path)
    files_p0 = {f for f in after.inputFiles() if "p=0" in f}
    files_p1 = {f for f in after.inputFiles() if "p=1" in f}
    assert len(files_p0) > 1, "oversized partition must split"
    assert len(files_p1) == 1, "tiny partition must not re-fragment"
    assert after.count() == 60_005


def test_compaction_recovers_crash_window(spark, tmp_path):
    """Regression (r9 scheme): a crash BETWEEN rename(dst→__precompact)
    and rename(tmp→dst) left no table at `path` — only the __precompact
    copy. The next run must restore it (not fail at getContentSummary,
    and not sweep the only copy away as debris) and then compact
    normally under the pointer protocol."""
    path = str(tmp_path / "t")
    spark.range(100).repartition(8).write.parquet(path)
    expected = {r.id for r in spark.read.parquet(path).collect()}
    # simulate the mid-swap crash: table moved aside, nothing at dst
    shutil.move(path, path + "__precompact")
    # plus tmp debris from the same dead run
    os.makedirs(path + "__compacting", exist_ok=True)
    assert not os.path.exists(path)

    stats = compact_partitions(spark, path)
    assert stats["files_after"] == 1
    assert not os.path.exists(path + "__compacting")
    assert not os.path.exists(path + "__precompact")
    assert {r.id for r in load_versioned(spark, path).collect()} == expected


def test_compaction_cleans_stale_debris_and_swaps_atomically(spark, tmp_path):
    """Debris from a crashed prior run — legacy sibling dirs, an
    uncommitted version dir, a half-written pointer tmp — must not
    poison the next run, which commits normally."""
    path = str(tmp_path / "t")
    spark.range(100).repartition(8).write.parquet(path)
    os.makedirs(path + "__compacting", exist_ok=True)
    os.makedirs(path + "__precompact", exist_ok=True)
    os.makedirs(path + "/_v7", exist_ok=True)  # uncommitted crashed write
    with open(path + "/._CURRENT.tmp", "w") as f:
        f.write("_v7")

    stats = compact_partitions(spark, path)
    assert stats["files_after"] == 1
    assert not os.path.exists(path + "__compacting")
    assert not os.path.exists(path + "__precompact")
    assert not os.path.exists(path + "/_v7")
    assert not os.path.exists(path + "/._CURRENT.tmp")
    assert load_versioned(spark, path).count() == 100


def test_version_retention_and_pointer_resolution(spark, tmp_path):
    """Retain-previous rule: after one compaction the legacy files are
    still on disk (in-flight readers finish); after a second, only the
    two newest versions exist and the stale legacy files are retired."""
    path = str(tmp_path / "t")
    spark.range(50).repartition(5).write.parquet(path)
    legacy_files = {e for e in os.listdir(path) if not e.startswith(("_", "."))}
    assert legacy_files

    compact_partitions(spark, path)
    assert resolve_table_path(spark, path).endswith("/_v2")
    # legacy v1 retained through one compaction
    assert legacy_files <= set(os.listdir(path))

    compact_partitions(spark, path)
    assert resolve_table_path(spark, path).endswith("/_v3")
    entries = set(os.listdir(path))
    assert "_v2" in entries and "_v3" in entries  # current + previous
    assert not (legacy_files & entries), "stale legacy files must retire"
    assert load_versioned(spark, path).count() == 50

    compact_partitions(spark, path)
    entries = set(os.listdir(path))
    assert "_v4" in entries and "_v3" in entries and "_v2" not in entries


def test_reader_never_errors_during_compaction(spark, tmp_path):
    """THE reader-safety contract the two-rename swap could not give: a
    reader loop (resolve markers → scan → count) running concurrently
    with repeated compactions must never error and must always see the
    complete table. The loop reads through with_versioned_retry — the
    documented contract for actions that may sleep through ≥ 2
    compactions (retain-two-generations covers one; the action-time
    re-resolve covers the rest)."""
    path = str(tmp_path / "live")
    spark.range(2_000).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    ).repartition(16).write.parquet(path)

    errors = []
    counts = []
    stop = threading.Event()

    def reader():
        while not stop.is_set():
            try:
                counts.append(
                    with_versioned_retry(spark, path, lambda df: df.count())
                )
            except Exception as ex:  # noqa: BLE001 — the test IS the catch
                errors.append(repr(ex))
                return

    t = threading.Thread(target=reader, daemon=True)
    t.start()
    try:
        for _ in range(4):
            compact_partitions(spark, path)
    finally:
        stop.set()
        t.join(timeout=60)
    assert not errors, f"reader failed during compaction: {errors[:3]}"
    assert counts, "reader loop never completed a scan"
    assert set(counts) == {2_000}, f"reader saw partial table: {set(counts)}"
