"""Duplicate-aware sample weights — dedup without losing the signal.

Hard dedup throws away the information that a document was popular:
a page mirrored 1000× is, evidence-wise, different from a one-off.
The standard soft-dedup compromise keeps ONE canonical copy but
carries the duplicate multiplicity as a sampling weight, so a
frequency-aware training mix can upweight it (and an anti-memorization
mix can cap it — the consumer decides; the pipeline's job is to
preserve the count).

Output: every document with its exact-dup group's canonical id, the
group multiplicity, and the sample weight — multiplicity for the
canonical survivor, 0 for removed copies (they contribute their mass
through their canonical). The weight column is DOUBLE so downstream
temperature/cap transforms compose without casts.

Scale: the dedup_exact plan (one digest-keyed hash agg) plus one
digest-keyed join back — both shuffles on the uniform md5 key; no
windows. The near-dup/semantic rungs get the same treatment through
cluster_representatives (dedup/survivorship.py), whose cluster sizes
are dup_cluster_stats; this operator is the exact-rung weight that
every pipeline applies first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_WEIGHTS_ORACLE = """
WITH g AS (
  SELECT md5(lower(trim(text))) AS content_md5,
         min(doc_id) AS canonical_doc_id,
         CAST(count(*) AS BIGINT) AS multiplicity
  FROM documents
  GROUP BY 1
)
SELECT d.doc_id,
       g.canonical_doc_id,
       g.multiplicity,
       CASE WHEN d.doc_id = g.canonical_doc_id
            THEN CAST(g.multiplicity AS DOUBLE) ELSE 0.0 END AS sample_weight
FROM documents d
JOIN g ON md5(lower(trim(d.text))) = g.content_md5
"""


@register("dedup_survivor_weights", oracle=_WEIGHTS_ORACLE)
def dedup_survivor_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document with its exact-dup canonical id, multiplicity, and
    duplicate-aware sample weight (multiplicity on the survivor, 0 on
    removed copies)."""
    docs = load_table(spark, sf_dir, "documents")
    digest = F.md5(F.lower(F.trim(F.col("text"))))
    g = docs.groupBy(digest.alias("content_md5")).agg(
        F.min("doc_id").alias("canonical_doc_id"),
        F.count("*").alias("multiplicity"),
    )
    return (
        docs.select("doc_id", digest.alias("content_md5"))
        .join(g, "content_md5")
        .select(
            "doc_id",
            "canonical_doc_id",
            "multiplicity",
            F.when(
                F.col("doc_id") == F.col("canonical_doc_id"),
                F.col("multiplicity").cast("double"),
            )
            .otherwise(0.0)
            .alias("sample_weight"),
        )
    )


_KFOLD_K = 5

_KFOLD_ORACLE = f"""
SELECT doc_id,
       CAST(('0x' || substr(md5('fold:' || CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
         % {_KFOLD_K} AS fold
FROM documents
"""


@register("stratified_kfold", oracle=_KFOLD_ORACLE)
def stratified_kfold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-addressed K-fold assignment — the cross-validation twin of
    train_test_split: fold membership is a pure function of the document
    id, so folds are stable under corpus regrowth, repartitioning, and
    reruns (what a seeded randomSplit is not). One scan, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    fold = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("fold:"), F.col("doc_id").cast("string"))), 1, 15),
            16,
            10,
        ).cast("bigint")
        % _KFOLD_K
    )
    return docs.select("doc_id", fold.alias("fold"))
