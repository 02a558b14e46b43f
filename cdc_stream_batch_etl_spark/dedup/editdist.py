"""Edit-distance verification for prefix-blocked near-duplicate pairs.

The character-level rung of the dedup ladder: shingle/MinHash methods
are token-set approximations, but the curation decision for borderline
pairs (OCR noise, small in-place edits) wants the true edit distance.
Running Levenshtein on all pairs is O(N^2 * L^2) — never at scale — so
this operator scopes it to pairs sharing a 32-char exact prefix block
(the sorted-neighborhood/blocking idiom; the corpus's mutated near-dups
keep their openings, so the block catches them), capped per block like
every bucketed join in the package.

Levenshtein is a built-in in both engines (JVM-side codegen in Spark,
native in DuckDB) computing the same standard DP — integer-exact, so
the oracle is a full-value hash match, not a tolerance check.

Scale: the block key is scan-local; pairs exist only within capped
blocks; the DP cost is bounded by the corpus max doc length (~600
chars fixture; shard by length band first at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

BLOCK_CHARS = 32
#: Per-block cap — fail-open like dedup/semantic.MAX_CELL.
MAX_BLOCK = 50

_ORACLE = f"""
WITH b AS (
  SELECT doc_id, text,
         substr(text, 1, {BLOCK_CHARS}) AS blk,
         row_number() OVER (
           PARTITION BY substr(text, 1, {BLOCK_CHARS}) ORDER BY doc_id) AS rk
  FROM documents
)
SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
       levenshtein(a.text, c.text) AS edit_distance,
       greatest(length(a.text), length(c.text)) AS max_len,
       1.0 - CAST(levenshtein(a.text, c.text) AS DOUBLE)
           / greatest(length(a.text), length(c.text)) AS similarity
FROM b a JOIN b c ON a.blk = c.blk AND a.doc_id < c.doc_id
WHERE a.rk <= {MAX_BLOCK} AND c.rk <= {MAX_BLOCK}
"""


@register("edit_distance_pairs", oracle=_ORACLE)
def edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Levenshtein distance and normalized similarity for every
    pair of documents sharing a 32-char prefix block."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.substring("text", 1, BLOCK_CHARS).alias("blk"),
    ).withColumn(
        "rk", F.row_number().over(Window.partitionBy("blk").orderBy("doc_id"))
    ).filter(F.col("rk") <= MAX_BLOCK)
    a, c = docs.alias("a"), docs.alias("c")
    dist = F.levenshtein(F.col("a.text"), F.col("c.text"))
    max_len = F.greatest(F.length("a.text"), F.length("c.text"))
    return (
        a.join(c, (F.col("a.blk") == F.col("c.blk")) & (F.col("a.doc_id") < F.col("c.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("c.doc_id").alias("doc_b"),
            dist.alias("edit_distance"),
            max_len.alias("max_len"),
            (F.lit(1.0) - dist.cast("double") / max_len).alias("similarity"),
        )
    )
