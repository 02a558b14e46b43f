"""Streaming ingest dedup: duplicates dropped within and across
micro-batches; stream output matches the batch dedup twin on the same
data (stream/batch parity, the W1 pattern applied to dedup)."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdc_stream_batch_etl_spark.sources.files import parquet_stream
from cdc_stream_batch_etl_spark.streaming.dedup_stream import (
    dedup_stream,
    dedup_stream_exact,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("event_time", T.TimestampType()),
    ]
)


@pytest.fixture()
def doc_batches(spark, tmp_path):
    """Three micro-batch files: dup inside batch 0, cross-batch dup in
    batch 1, fresh text + a third copy in batch 2."""
    rows = [
        [  # batch 0
            (1, "alpha beta gamma", "2024-01-01 00:00:00"),
            (2, "alpha beta gamma", "2024-01-01 00:00:10"),  # in-batch dup
            (3, "delta epsilon", "2024-01-01 00:00:20"),
        ],
        [  # batch 1
            (4, "alpha beta gamma", "2024-01-01 00:01:00"),  # cross-batch dup
            (5, "zeta eta", "2024-01-01 00:01:10"),
        ],
        [  # batch 2
            (6, "theta iota", "2024-01-01 00:02:00"),
            (7, "delta epsilon", "2024-01-01 00:02:10"),  # cross-batch dup
        ],
    ]
    src = tmp_path / "src"
    src.mkdir()
    for i, batch in enumerate(rows):
        df = spark.createDataFrame(batch, ["doc_id", "text", "ts"]).select(
            "doc_id", "text", F.col("ts").cast("timestamp").alias("event_time")
        )
        df.coalesce(1).write.parquet(str(src / f"b{i}.parquet"))
    return str(src) + "/*"


def _run_to_memory(spark, stream_df, name):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.processAllAvailable()
    q.stop()
    return spark.sql(f"SELECT * FROM {name}")


@pytest.mark.parametrize("variant", [dedup_stream, dedup_stream_exact])
def test_stream_dedup_matches_batch_twin(
    spark, tmp_path, doc_batches, variant, state_provider
):
    stream = parquet_stream(spark, doc_batches, SCHEMA)
    out = _run_to_memory(
        spark, variant(stream), f"dedup_{variant.__name__}_{state_provider}"
    )

    # all dups fall inside the horizon here, so both variants agree with
    # the batch twin: one surviving doc per distinct text
    survivors = {r["digest"] for r in out.collect()}
    batch = (
        spark.read.schema(SCHEMA)
        .parquet(doc_batches)
        .withColumn("digest", F.md5("text"))
        .select("digest")
        .distinct()
    )
    assert survivors == {r["digest"] for r in batch.collect()}
    # exactly one survivor per digest — no dup leaked through
    assert out.count() == len(survivors) == 4


def test_chunk_dedup_stream_matches_batch_chunks(spark, doc_batches):
    """Stream/batch parity at CHUNK granularity: the streamed first-seen
    chunk set must be exactly the batch chunk table's distinct hashes,
    one row per hash — and an edited near-duplicate must emit only its
    novel chunks."""
    from cdc_stream_batch_etl_spark.streaming.dedup_stream import (
        chunk_dedup_stream,
    )
    from cdc_stream_batch_etl_spark.text.cdchunk import _chunked

    stream = parquet_stream(spark, doc_batches, SCHEMA)
    out = _run_to_memory(spark, chunk_dedup_stream(stream), "chunk_dedup")

    got = [r.chunk_hash for r in out.collect()]
    batch = (
        _chunked(spark.read.schema(SCHEMA).parquet(doc_batches))
        .select("chunk_hash")
        .distinct()
    )
    want = {r.chunk_hash for r in batch.collect()}
    assert set(got) == want
    assert len(got) == len(want), "a duplicate chunk leaked through"


def test_chunk_dedup_stream_restart_no_replay(spark, tmp_path, state_provider):
    """Kill-restart on the same checkpoint: the seen-chunk state must
    survive, so a post-restart re-crawl of an EDITED document emits only
    the chunks its edit created — never the shared passage again."""
    from pyspark.sql import functions as F

    from cdc_stream_batch_etl_spark.sources.files import parquet_stream
    from cdc_stream_batch_etl_spark.streaming.dedup_stream import (
        chunk_dedup_stream,
    )
    from tests.conftest import assert_state_provider_engaged

    base = " ".join(f"w{(i * 37) % 101}q{i % 13}" for i in range(300))
    edited = "new intro tokens " + base  # chunk-level near-dup of base

    src = tmp_path / "src"
    src.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def write_batch(name, rows):
        df = spark.createDataFrame(rows, ["doc_id", "text", "ts"]).select(
            "doc_id", "text", F.col("ts").cast("timestamp").alias("event_time")
        )
        df.coalesce(1).write.parquet(str(src / name))

    def run():
        q = (
            chunk_dedup_stream(parquet_stream(spark, str(src) + "/*", SCHEMA))
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    write_batch("b0.parquet", [(1, base, "2024-01-01 00:00:00")])
    run()  # phase 1, then "crash"
    write_batch("b1.parquet", [(2, edited, "2024-01-01 00:01:00")])
    run()  # restart on the same checkpoint

    rows = spark.read.parquet(out).collect()
    hashes = [r.chunk_hash for r in rows]
    assert len(hashes) == len(set(hashes)), "restart replayed a seen chunk"
    # doc 2 contributed only its novel (edit-created) chunks: far fewer
    # than its full chunk count, but at least one
    doc2 = [r for r in rows if r.doc_id == 2]
    from cdc_stream_batch_etl_spark.text.cdchunk import _chunked

    n2_full = _chunked(
        spark.createDataFrame([(2, edited)], "doc_id bigint, text string")
    ).count()
    assert 1 <= len(doc2) < n2_full / 2, (len(doc2), n2_full)
    assert_state_provider_engaged(ckpt, state_provider)
