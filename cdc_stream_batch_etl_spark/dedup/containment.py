"""Asymmetric containment scoring for near-duplicate candidate pairs.

Jaccard misses the quote/excerpt case: a short document wholly contained
in a long one has low Jaccard (union is large) but containment
|A∩B|/|A| = 1.0. Corpus curation treats those differently — the excerpt
is usually the one to drop — so the containment pass reports BOTH
directions for every candidate pair.

Candidate generation is a single-band MinHash with r=1: the bucket key
is the MINIMUM shingle hash (the classic bottom-1 sketch). Any pair
sharing its global-minimum shingle collides, which upper-bounds the
candidate set while catching every pair with high overlap on the rarer
shingles. Buckets are capped at MAX_BUCKET docs by doc_id rank (the
semantic.py fail-open convention, mirrored exactly in the oracle) so a
degenerate stop-shingle bucket cannot go quadratic.

Scale: shingle arrays ride the shuffle only for the ≤MAX_BUCKET docs
per bucket that survive the cap; intersection sizes are scan-local
array_intersect on the joined pair — no per-shingle explode join (the
ngram.py yardstick shape this operator approximates at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from . import hash64_expr, hash64_sql, shingles_col, shingles_sql

#: Per-bucket cap — fail-open like dedup/semantic.MAX_CELL.
MAX_BUCKET = 50
#: Report pairs with containment ≥ τ in at least one direction.
CONTAIN_THRESHOLD = 0.5

_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {shingles_sql()} AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
), bucketed AS (
  SELECT doc_id, shingles,
         list_min([{hash64_sql("s")} for s in shingles]) AS bucket,
         row_number() OVER (
           PARTITION BY list_min([{hash64_sql("s")} for s in shingles])
           ORDER BY doc_id) AS rk
  FROM sh WHERE len(shingles) > 0
), pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         len(a.shingles) AS n_a, len(b.shingles) AS n_b,
         len(list_intersect(a.shingles, b.shingles)) AS n_common
  FROM bucketed a JOIN bucketed b USING (bucket)
  WHERE a.doc_id < b.doc_id
    AND a.rk <= {MAX_BUCKET} AND b.rk <= {MAX_BUCKET}
)
SELECT doc_a, doc_b, n_a, n_b, n_common,
       CAST(n_common AS DOUBLE) / n_a AS containment_a,
       CAST(n_common AS DOUBLE) / n_b AS containment_b
FROM pairs
WHERE CAST(n_common AS DOUBLE) / n_a >= {CONTAIN_THRESHOLD}
   OR CAST(n_common AS DOUBLE) / n_b >= {CONTAIN_THRESHOLD}
"""


@register("containment_pairs", oracle=_ORACLE)
def containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both-direction shingle containment for bottom-1-sketch candidate
    pairs: (doc_a, doc_b, set sizes, intersection, |A∩B|/|A|, |A∩B|/|B|)."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select("doc_id", shingles_col().alias("shingles")).filter(
        F.size("shingles") > 0
    )
    bucketed = sh.select(
        "doc_id",
        "shingles",
        F.expr(f"array_min(transform(shingles, s -> {hash64_expr('s')}))").alias(
            "bucket"
        ),
    ).withColumn(
        "rk", F.row_number().over(Window.partitionBy("bucket").orderBy("doc_id"))
    )
    capped = bucketed.filter(F.col("rk") <= MAX_BUCKET)
    a, b = capped.alias("a"), capped.alias("b")
    pairs = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.size("a.shingles").alias("n_a"),
            F.size("b.shingles").alias("n_b"),
            F.size(F.array_intersect("a.shingles", "b.shingles")).alias("n_common"),
        )
    )
    c_a = F.col("n_common").cast("double") / F.col("n_a")
    c_b = F.col("n_common").cast("double") / F.col("n_b")
    return pairs.select(
        "doc_a",
        "doc_b",
        "n_a",
        "n_b",
        "n_common",
        c_a.alias("containment_a"),
        c_b.alias("containment_b"),
    ).filter(
        (F.col("containment_a") >= CONTAIN_THRESHOLD)
        | (F.col("containment_b") >= CONTAIN_THRESHOLD)
    )
