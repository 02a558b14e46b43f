"""Exact + prefix deduplication: hash-groupBy on content fingerprints.

Scale: one hash-agg shuffle keyed on the digest — the canonical 100 TB
exact-dedup plan (partial agg map-side, no sort, no skew: digests are
uniform)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_EXACT_ORACLE = """
SELECT md5(lower(trim(text))) AS content_md5,
       min(doc_id) AS canonical_doc_id,
       count(*) AS dup_count
FROM documents
GROUP BY 1
"""


@register("dedup_exact", oracle=_EXACT_ORACLE)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup groups: min doc_id is the canonical survivor."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("content_md5")).agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count("*").alias("dup_count"),
    )


_PREFIX_ORACLE = """
SELECT md5(array_to_string(string_split(text, ' ')[1:8], ' ')) AS prefix_md5,
       min(doc_id) AS canonical_doc_id,
       count(*) AS dup_count,
       array_to_string(list_sort(list(doc_id)), ',') AS member_ids
FROM documents
GROUP BY 1
HAVING count(*) > 1
"""


@register("dedup_prefix", oracle=_PREFIX_ORACLE)
def dedup_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-hash near-dup grouping (8-word prefix): the cheap first-pass
    dedup a training pipeline runs before MinHash."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.array_join(F.slice(F.split(F.col("text"), " "), 1, 8), " ")
    return (
        docs.groupBy(F.md5(prefix).alias("prefix_md5"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("dup_count"),
            F.array_join(F.sort_array(F.collect_list("doc_id")), ",").alias("member_ids"),
        )
        .filter(F.col("dup_count") > 1)
    )
