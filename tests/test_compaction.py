"""Small-file compaction: a fragmented table (many tiny files — the
post-streaming-merge shape) compacts to the byte-budget file count,
preserving rows, values and hive partitioning."""

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.catalog import compact_partitions


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
    after = spark.read.parquet(path)
    assert len(after.inputFiles()) == 1
    assert {(r.id, r.v) for r in after.collect()} == expected


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
    after = spark.read.parquet(path)
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
