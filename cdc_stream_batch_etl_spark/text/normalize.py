"""Text normalization — the canonicalization pass every training-data
pipeline runs before hashing/dedup (whitespace collapse, trim, case
fold), exposed as its own audited operator so the cleaning applied
upstream of `dedup_exact`'s digest is inspectable rather than implicit.

Beyond-reference (the reference never normalizes text; its pandas
transforms pass strings through — SURVEY §2.6 C-family is numeric/label
work). Engine-portable subset only: ASCII case fold, horizontal
whitespace collapse, trim — no unicode NFC/NFKC, which Java and utf8proc
implement differently and would break the cross-engine oracle.

Scale: pure scan-local column expressions (regexp_replace/lower/trim),
codegen'd, zero shuffles — the cheapest kind of full-corpus pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# DuckDB regexp_replace is first-match unless the 'g' flag is passed;
# Spark's is always global — the oracle spells the flag explicitly.
_NORMALIZE_ORACLE = """
WITH n AS (
  SELECT doc_id,
         lower(trim(regexp_replace(text, '[ \\t]+', ' ', 'g'))) AS norm_text,
         text
  FROM documents
)
SELECT doc_id,
       norm_text,
       length(norm_text) AS n_chars_norm,
       CAST(length(text) - length(norm_text) AS BIGINT) AS n_chars_removed,
       norm_text <> text AS changed,
       md5(norm_text) AS norm_md5
FROM n
"""


@register("text_normalize", oracle=_NORMALIZE_ORACLE)
def text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, norm_text, size deltas, changed flag, digest of the
    normalized form — the key exact-dedup would group on)."""
    docs = load_table(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(F.col("text"), "[ \\t]+", " ")))
    return docs.select(
        "doc_id",
        norm.alias("norm_text"),
        F.length(norm).alias("n_chars_norm"),
        (F.length("text") - F.length(norm)).cast("bigint").alias("n_chars_removed"),
        (norm != F.col("text")).alias("changed"),
        F.md5(norm).alias("norm_md5"),
    )
