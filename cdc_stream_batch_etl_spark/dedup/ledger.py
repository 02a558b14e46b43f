"""Dedup ledger — per-document attribution across the whole dedup ladder.

A curation pipeline's published artifact is rarely one method's output;
it is the LEDGER: for every document, which rung of the ladder removed
it — exact digest, MinHash-LSH near-dup, or semantic (embedding-space)
duplicate — and whether it survives all three. This is the view a data
card cites ("X% exact dups, Y% near-dups, Z% semantic dups") and the
input to any removal-reason audit. The testdata's 1:1 doc_id ↔ vec_id
correspondence joins the text rungs to the embedding rung.

Composition, not recomputation: the three removal sets reuse the exact
plans of dedup_exact (digest-window canonical), minhash_lsh_pairs
(banded LSH with the MAX_BUCKET cap), and semantic_dedup (clustered
in-cell cosine with the MAX_CELL cap) — each already bounded and
oracle-verified on its own. The ledger adds only three LEFT joins keyed
on doc_id (uniform 1:1 keys, AQE broadcasts the removal sets, which are
strictly smaller than the corpus). Removal conventions are the ladder's
own: smallest id survives every rung.

Scale: cost = sum of the three component plans + three doc_id-keyed
hash joins; no new quadratic surface, no new skew surface. At 100 TB
the component frames would be materialized once by the pipeline runner
and the ledger becomes pure joins (runner.py precedent for sourced
summaries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..similarity.linalg import adaptive_stride_sql
from .minhash import lsh_pairs, pairs_oracle_sql
from .semantic import MAX_CELL, SEM_THRESHOLD, semantic_dedup

_LEDGER_ORACLE = f"""
WITH exact_rm AS (
  SELECT doc_id FROM (
    SELECT doc_id,
           min(doc_id) OVER (PARTITION BY md5(lower(trim(text)))) AS canon
    FROM documents
  ) WHERE doc_id <> canon
), near_rm AS (
  SELECT DISTINCT doc_b AS doc_id FROM ({pairs_oracle_sql("documents")})
), sem_rm AS (
  SELECT vec_id AS doc_id FROM (
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ), cent AS (
      SELECT vec_id AS cid, emb AS cemb FROM e
      WHERE vec_id % {adaptive_stride_sql("e")} = 0
    ), assign AS (
      SELECT vec_id, emb,
             (max(struct_pack(d := list_dot_product(emb, cemb), cid := cid))).cid AS cell
      FROM e CROSS JOIN cent
      GROUP BY vec_id, emb
    ), capped AS (
      SELECT vec_id, emb, cell,
             row_number() OVER (PARTITION BY cell ORDER BY vec_id) AS rk
      FROM assign
    ), pairs AS (
      SELECT b.vec_id AS vb
      FROM capped a JOIN capped b ON a.cell = b.cell AND a.vec_id < b.vec_id
      WHERE a.rk <= {MAX_CELL} AND b.rk <= {MAX_CELL}
        AND list_dot_product(a.emb, b.emb)
            / (sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb)))
            >= {SEM_THRESHOLD}
    )
    SELECT DISTINCT vb AS vec_id FROM pairs
  )
)
SELECT d.doc_id,
       e.doc_id IS NOT NULL AS removed_exact,
       n.doc_id IS NOT NULL AS removed_near,
       s.doc_id IS NOT NULL AS removed_semantic,
       (e.doc_id IS NULL AND n.doc_id IS NULL AND s.doc_id IS NULL) AS kept
FROM documents d
LEFT JOIN exact_rm e ON d.doc_id = e.doc_id
LEFT JOIN near_rm n ON d.doc_id = n.doc_id
LEFT JOIN sem_rm s ON d.doc_id = s.doc_id
"""


@register("dedup_ledger", oracle=_LEDGER_ORACLE)
def dedup_ledger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document with its removal attribution across exact, LSH
    near-dup, and semantic dedup (doc_id = vec_id in the testdata)."""
    docs = load_table(spark, sf_dir, "documents")

    from pyspark.sql import Window

    digest = F.md5(F.lower(F.trim(F.col("text"))))
    exact_rm = (
        docs.select("doc_id", digest.alias("content_md5"))
        .withColumn("canon", F.min("doc_id").over(Window.partitionBy("content_md5")))
        .filter(F.col("doc_id") != F.col("canon"))
        .select("doc_id")
    )
    near_rm = lsh_pairs(docs).select(F.col("doc_b").alias("doc_id")).distinct()
    sem_rm = (
        semantic_dedup(spark, sf_dir)
        .filter(~F.col("kept"))
        .select(F.col("vec_id").alias("doc_id"))
    )

    e = exact_rm.withColumn("x_exact", F.lit(True))
    n = near_rm.withColumn("x_near", F.lit(True))
    s = sem_rm.withColumn("x_sem", F.lit(True))
    return (
        docs.select("doc_id")
        .join(e, "doc_id", "left")
        .join(n, "doc_id", "left")
        .join(s, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("x_exact", F.lit(False)).alias("removed_exact"),
            F.coalesce("x_near", F.lit(False)).alias("removed_near"),
            F.coalesce("x_sem", F.lit(False)).alias("removed_semantic"),
            (
                F.col("x_exact").isNull()
                & F.col("x_near").isNull()
                & F.col("x_sem").isNull()
            ).alias("kept"),
        )
    )
