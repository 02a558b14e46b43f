"""N-gram Jaccard near-duplicate pairs (exact similarity join).

The exact-verification baseline the MinHash/LSH path approximates: explode
distinct 3-word shingles, self-join on shingle, Jaccard from intersection /
union sizes. τ=0.5 cleanly separates the corpus's mutated near-dups
(J ≥ 0.9) from background vocabulary overlap (J ≤ 0.07).

Scale: the shingle self-join is quadratic in the hottest shingle's doc
frequency — tractable at bench scale, and the reason the banded MinHash
variant (minhash.py) is the 100 TB path. A production guard would drop
stop-shingles above a document-frequency cap before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from . import shingles_sql

JACCARD_THRESHOLD = 0.5

_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, unnest({shingles_sql()}) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
), cnt AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.shared,
       CAST(i.shared AS DOUBLE) / (ca.n + cb.n - i.shared) AS jaccard
FROM inter i
JOIN cnt ca ON ca.doc_id = i.doc_a
JOIN cnt cb ON cb.doc_id = i.doc_b
WHERE CAST(i.shared AS DOUBLE) / (ca.n + cb.n - i.shared) >= {JACCARD_THRESHOLD}
"""


@register("ngram_jaccard_pairs", oracle=_ORACLE)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .minhash import shingled_docs

    docs = load_table(spark, sf_dir, "documents")
    return jaccard_pairs_from_shingled(shingled_docs(docs))


def jaccard_pairs_from_shingled(shingled: DataFrame) -> DataFrame:
    """Exact-Jaccard pairs over a pre-materialized (doc_id, shingles)
    frame (dedup/minhash.shingled_docs).

    r12 (guide §5 caching, §2.5): the shingle table feeds BOTH sides of
    the self-join and the per-doc counts — unpersisted, the interpreted
    zip_with shingling ran three times, inside one scan task of the
    single-row-group corpus file. One eagerly-materialized, fanned-out
    shingling pass feeds all three references (eager because the
    self-join sides race-fill a lazy cache from concurrent stages).
    r13: the materialized frame is the SAME (doc_id, shingles) base the
    LSH leg uses, so lsh_recall_eval shingles the corpus once, not twice;
    the explode to (doc_id, shingle) rows happens per consumer — array
    flattening over checkpointed rows, trivial next to the shingling.
    Checkpoint blocks are ContextCleaner/GC-managed (not released by
    clearCache — see functions/materialize.py)."""
    sh = shingled.select("doc_id", F.explode("shingles").alias("shingle"))
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("shared"))
    )
    jaccard = F.col("shared").cast("double") / (F.col("ca.n") + F.col("cb.n") - F.col("shared"))
    return (
        inter.join(cnt.alias("ca"), F.col("doc_a") == F.col("ca.doc_id"))
        .join(cnt.alias("cb"), F.col("doc_b") == F.col("cb.doc_id"))
        .select("doc_a", "doc_b", "shared", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
