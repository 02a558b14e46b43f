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
