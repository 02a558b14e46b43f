"""Sharded islands-and-gaps: runs planted to straddle shard
boundaries must stitch back to the exact global islands (the global
spelling is re-derived inline as the truth)."""

from pyspark.sql import Window, functions as F

from cdc_stream_batch_etl_spark.operators.islands import islands


def _global_islands(keys):
    r = keys.withColumn(
        "grp", F.col("key") - F.row_number().over(Window.orderBy("key"))
    )
    isl = r.groupBy("grp").agg(
        F.min("key").alias("island_start"),
        F.max("key").alias("island_end"),
        F.count("*").cast("bigint").alias("island_len"),
    )
    nxt = F.lead("island_start").over(Window.orderBy("island_start"))
    return isl.select(
        "island_start",
        "island_end",
        "island_len",
        (nxt - F.col("island_end") - 1).alias("gap_to_next"),
    ).orderBy("island_start")


def _rows(df):
    return [
        (r.island_start, r.island_end, r.island_len, r.gap_to_next)
        for r in df.collect()
    ]


def test_boundary_straddling_runs_stitch_exactly(spark):
    # shard=100 → runs deliberately crossing x=100/200/300 boundaries,
    # one run spanning THREE whole shards (95..405), singletons, and a
    # run ending exactly on a boundary (499..500)
    keyset = (
        list(range(95, 406))
        + [42]
        + list(range(480, 501))
        + [777]
        + list(range(998, 1003))
    )
    keys = spark.createDataFrame([(k,) for k in keyset], "key bigint").repartition(7)
    got = _rows(islands(keys, shard=100))
    want = _rows(_global_islands(keys))
    assert got == want
    # sanity: the plant really makes multi-shard islands
    assert (95, 405, 311, 74) in got


def test_single_shard_degenerates_to_global(spark):
    keys = spark.createDataFrame([(k,) for k in [1, 2, 3, 9]], "key bigint")
    assert _rows(islands(keys, shard=1 << 40)) == [
        (1, 3, 3, 5),
        (9, 9, 1, None),
    ]


def test_negative_keys_shard_correctly(spark):
    # floor-sharding: a run straddling zero must not split wrongly at
    # the sign boundary (truncation would put -1 and 1 in shard 0 but
    # -101..-100 in the wrong shard)
    keys = spark.createDataFrame(
        [(k,) for k in range(-105, 6)], "key bigint"
    ).repartition(5)
    got = _rows(islands(keys, shard=100))
    assert got == [(-105, 5, 111, None)]
