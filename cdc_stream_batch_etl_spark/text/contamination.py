"""Train/eval contamination check — does any *evaluation* document appear
verbatim (content-normalized) in the *training* split?

The benchmark-leakage audit every training-data pipeline runs before a
model sees the corpus: composes the content-addressed split
(text/sampling.py) with content fingerprinting (text/analysis.py). A
hit means the same normalized text landed on both sides of the split
under different doc_ids — exact-duplicate leakage.

Plan shape: both sides derive from ONE scan of documents (Catalyst
reuses the subplan); the join key is the md5 content digest, so the
shuffle moves only (digest, doc_id) pairs — O(corpus rows), narrow rows.
The eval side is 20% of the corpus and AQE will broadcast it when small.
is_contaminated is emitted per eval doc (LEFT join + flag) so the output
is the audit table a pipeline would persist, not just the hit list.

Determinism: md5 normalization identical in both engines (same spelling
as doc_fingerprint); the matching train doc for a contaminated eval doc
is min(train doc_id) to make the witness stable when several train
copies exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .sampling import TRAIN_PCT, VAL_PCT, _bucket_spark, _bucket_sql

_CONTAMINATION_ORACLE = f"""
WITH tagged AS (
  SELECT doc_id,
         md5(lower(trim(text))) AS content_md5,
         CASE WHEN {_bucket_sql("doc_id")} < {TRAIN_PCT} THEN 'train'
              WHEN {_bucket_sql("doc_id")} < {TRAIN_PCT + VAL_PCT} THEN 'val'
              ELSE 'test' END AS split
  FROM documents
), train AS (
  SELECT content_md5, min(doc_id) AS train_doc_id
  FROM tagged WHERE split = 'train' GROUP BY content_md5
)
SELECT e.doc_id, e.split, e.content_md5,
       t.train_doc_id,
       t.train_doc_id IS NOT NULL AS is_contaminated
FROM (SELECT * FROM tagged WHERE split <> 'train') e
LEFT JOIN train t ON e.content_md5 = t.content_md5
"""


@register("contamination_check", oracle=_CONTAMINATION_ORACLE)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = _bucket_spark(F.col("doc_id"))
    tagged = docs.select(
        "doc_id",
        F.md5(F.lower(F.trim(F.col("text")))).alias("content_md5"),
        F.when(bucket < TRAIN_PCT, "train")
        .when(bucket < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
        .alias("split"),
    )
    train = (
        tagged.filter(F.col("split") == "train")
        .groupBy("content_md5")
        .agg(F.min("doc_id").alias("train_doc_id"))
    )
    ev = tagged.filter(F.col("split") != "train")
    return ev.join(train, "content_md5", "left").select(
        "doc_id",
        "split",
        "content_md5",
        "train_doc_id",
        F.col("train_doc_id").isNotNull().alias("is_contaminated"),
    )
