"""Output shard planning — the write side of a training-data pipeline.

Beyond-reference operator. After cleaning/dedup/sampling, a corpus is
written as N shards that downstream training jobs stream independently;
the manifest (per-shard row/char/token mass) is the artifact a data
loader and a capacity planner both read. Two properties matter at scale:

- **content-addressed placement** — shard = md5-bucket of the document's
  content digest, NOT ``doc_id % N`` or round-robin: re-runs, backfills
  and upstream re-partitioning cannot move a doc between shards, so
  shard-level caching and resumable training stay valid (the same
  rationale as text/sampling.py's split buckets);
- **balance by construction** — md5 buckets are uniform, so shard sizes
  concentrate tightly around corpus/N with no planner needed; the
  manifest's min/max columns make any surprise skew observable.

Plan shape: one scan-local projection (digest + per-doc token count) and
ONE hash-agg shuffle keyed by shard_id (N=64 keys → map-side partials do
almost all the work). At 100 TB the same query runs ahead of the actual
``df.write.partitionBy("shard_id")`` to size executors; the write itself
reuses the computed column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

N_SHARDS = 64

_MANIFEST_ORACLE = f"""
WITH d AS (
  SELECT CAST(('0x' || substr(md5(lower(trim(text))), 1, 15)) AS BIGINT)
           % {N_SHARDS} AS shard_id,
         length(text) AS n_chars_actual,
         len(string_split(text, ' ')) AS n_tokens,
         lang
  FROM documents
)
SELECT shard_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars_actual) AS BIGINT) AS total_chars,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(count(DISTINCT lang) AS BIGINT) AS n_langs,
       CAST(max(n_chars_actual) AS BIGINT) AS max_doc_chars
FROM d
GROUP BY shard_id
"""


@register("shard_manifest", oracle=_MANIFEST_ORACLE)
def shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard manifest for a 64-way content-addressed corpus layout."""
    docs = load_table(spark, sf_dir, "documents")
    digest = F.md5(F.lower(F.trim(F.col("text"))))
    shard = (F.conv(F.substring(digest, 1, 15), 16, 10).cast("bigint") % N_SHARDS).alias(
        "shard_id"
    )
    return (
        docs.select(
            shard,
            F.length("text").alias("n_chars_actual"),
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
            "lang",
        )
        .groupBy("shard_id")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars_actual").cast("bigint").alias("total_chars"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.countDistinct("lang").alias("n_langs"),
            F.max("n_chars_actual").cast("bigint").alias("max_doc_chars"),
        )
    )
