"""Per-document n-gram novelty — how much of a document exists nowhere
else in the corpus.

The inverse of boilerplate_ratio (text/decontam.py): instead of scoring
shared n-grams, score the share of a document's distinct shingles whose
corpus document-frequency is exactly 1. High novelty = unique content
worth keeping; near-zero novelty = the document is assembled from
template text even if no single document duplicates it (the case the
pairwise dedup ladder structurally cannot see).

Plan shape: distinct shingles per doc (scan-local array math), explode,
ONE shingle-keyed hash-agg for document frequency (map-side combined —
the wordcount class), then re-aggregate per doc. Shingles are distinct
within a doc, so count(*) per shingle IS the document frequency — no
count(distinct) expand. The join back to documents is doc-id-keyed and
uniform. All ratios are integer/integer divisions — engine-exact.

Reference anchor: beyond-reference; the per-doc selection signal
consumed alongside doc_quality and dsir_importance in stage 3 of the
curation sequence (README "corpus-curation run").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..dedup import shingles_col, shingles_sql

_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, unnest({shingles_sql()}) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
), df AS (
  SELECT shingle, count(*) AS doc_freq FROM sh GROUP BY shingle
)
SELECT s.doc_id,
       CAST(count(*) AS BIGINT) AS n_shingles,
       CAST(count(*) FILTER (WHERE d.doc_freq = 1) AS BIGINT) AS n_novel,
       CAST(count(*) FILTER (WHERE d.doc_freq = 1) AS DOUBLE) / count(*)
         AS novelty
FROM sh s JOIN df d ON s.shingle = d.shingle
GROUP BY s.doc_id
"""


@register("ngram_novelty", oracle=_ORACLE)
def ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_shingles, n_novel, novelty): the share of each
    document's distinct 3-shingles that appear in no other document."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", F.explode(shingles_col()).alias("shingle"))
    df = sh.groupBy("shingle").agg(F.count("*").alias("doc_freq"))
    return (
        sh.join(df, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_shingles"),
            F.count(F.when(F.col("doc_freq") == 1, 1)).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_shingles")).alias("novelty"),
        )
    )
