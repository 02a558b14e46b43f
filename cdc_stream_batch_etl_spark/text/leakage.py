"""Train/test split leakage audit — near-duplicates straddling the
split boundary.

A content-addressed split (text/sampling.py train_test_split) keeps
each DOCUMENT stable, but near-duplicate documents are independent
rows: the crawl's mirror of a training document can land in test, and
the model is then evaluated on (a paraphrase of) its own training
data — the classic eval-contamination bug (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better", measures
exactly this split leakage). This operator composes the two verified
components: the MinHash-LSH near-dup pair table (dedup/minhash.py,
threshold-verified Jaccard) and the split assignment — and reports
every near-dup pair whose members sit in DIFFERENT splits, with the
leak direction.

No join is needed for the split labels: the assignment is a pure
function of doc_id (that is the point of content addressing), so both
labels are computed scan-locally on the pair rows. Cost = the LSH pair
table itself; the audit adds two md5 evaluations per pair.

Fixing a flagged pair = dropping the non-train member (or re-keying
the pair into one split); `curated_training_set` consumes the same
pair table for the removal path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..dedup.minhash import lsh_pairs, pairs_oracle_sql
from ..registry import register
from .sampling import TRAIN_PCT, VAL_PCT, _bucket_spark, _bucket_sql


def _split_sql(key: str) -> str:
    return (
        f"CASE WHEN {_bucket_sql(key)} < {TRAIN_PCT} THEN 'train' "
        f"WHEN {_bucket_sql(key)} < {TRAIN_PCT + VAL_PCT} THEN 'val' "
        f"ELSE 'test' END"
    )


def _split_spark(key: str) -> F.Column:
    b = _bucket_spark(F.col(key))
    return (
        F.when(b < TRAIN_PCT, "train")
        .when(b < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )


_LEAKAGE_ORACLE = f"""
WITH pairs AS ({pairs_oracle_sql()})
SELECT doc_a, doc_b, jaccard,
       {_split_sql("doc_a")} AS split_a,
       {_split_sql("doc_b")} AS split_b
FROM pairs
WHERE {_split_sql("doc_a")} <> {_split_sql("doc_b")}
ORDER BY doc_a, doc_b
"""


@register("split_leakage_report", oracle=_LEAKAGE_ORACLE)
def split_leakage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs (MinHash-LSH, Jaccard-verified) whose members fall
    in different train/val/test splits — each row is a document the
    eval set shares with training up to near-duplication."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_pairs(docs)
    return (
        pairs.select(
            "doc_a",
            "doc_b",
            "jaccard",
            _split_spark("doc_a").alias("split_a"),
            _split_spark("doc_b").alias("split_b"),
        )
        .filter(F.col("split_a") != F.col("split_b"))
        .orderBy("doc_a", "doc_b")
    )
