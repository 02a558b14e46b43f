"""Deterministic training-order shuffle — content-addressed data order.

Training runs must be REPRODUCIBLE: the order documents reach the
trainer affects the model, so "shuffle the corpus" cannot mean
`ORDER BY random()`. The standard fix is content-addressed ordering —
position = rank of md5(seed ‖ doc_id) — which is stable across reruns,
cluster sizes, and partitioning, and reshuffles completely when the
seed epoch changes (the per-epoch reshuffle a data loader needs).
train_test_split (text/sampling.py) applies the idiom to MEMBERSHIP;
this applies it to ORDER.

Scale: a single GLOBAL rank would be one total sort — legal but the
slowest possible spelling. The trainer actually consumes shard files,
so the operator emits (shard, position_in_shard): shard = hash bucket
(the shard_manifest placement), position = rank within the shard — a
partitioned window after one uniform shuffle, never a global sort. A
reader streaming shards in shard order and rows in position order sees
a fully deterministic, hash-uniform permutation of the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

SHUFFLE_SEED = "epoch0"
N_SHARDS = 64

_SHUFFLE_ORACLE = f"""
WITH h AS (
  SELECT doc_id,
         md5('{SHUFFLE_SEED}' || ':' || CAST(doc_id AS VARCHAR)) AS hv
  FROM documents
)
SELECT doc_id,
       CAST(('0x' || substr(hv, 1, 8)) AS BIGINT) % {N_SHARDS} AS shard,
       CAST(row_number() OVER (
         PARTITION BY CAST(('0x' || substr(hv, 1, 8)) AS BIGINT) % {N_SHARDS}
         ORDER BY hv, doc_id) AS BIGINT) AS position
FROM h
"""


@register("training_shuffle", oracle=_SHUFFLE_ORACLE)
def training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document's (shard, position) under the seed-epoch
    content-addressed shuffle — rerun-stable, partition-count-stable."""
    docs = load_table(spark, sf_dir, "documents")
    hv = F.md5(F.concat(F.lit(f"{SHUFFLE_SEED}:"), F.col("doc_id").cast("string")))
    h = docs.select("doc_id", hv.alias("hv")).withColumn(
        "shard",
        (
            F.conv(F.substring("hv", 1, 8), 16, 10).cast("bigint") % N_SHARDS
        ),
    )
    w = Window.partitionBy("shard").orderBy("hv", "doc_id")
    return h.select(
        "doc_id",
        "shard",
        F.row_number().over(w).cast("bigint").alias("position"),
    )
