"""Duplicate-cluster survivorship: quality-aware canonical selection.

Beyond-reference operators. ``dedup_components`` (components.py) labels
every document with its near-dup cluster; the *survivorship policy* —
WHICH member of each cluster the training corpus keeps — is a separate
decision. min-doc_id (the components default) is arbitrary; a real
pipeline keeps the highest-quality member (here: most content,
``n_chars``), because near-dup clusters typically mix full documents
with truncated or boilerplate-wrapped copies of the same text.

Two operators:

- ``cluster_representatives`` — one row per cluster: the quality-argmax
  representative (``max_by`` over a (n_chars, -doc_id) struct — ties
  break to the smallest id, so the pick is total-order deterministic),
  cluster size, and the kept/dropped character mass.
- ``incremental_dedup`` — the daily-ingest pattern: dedup an incoming
  batch against an already-ingested base corpus *without re-deduping the
  base*. Incoming docs are routed to ``dup_of_base`` (digest already in
  the base index), ``dup_in_batch`` (a smaller incoming doc_id owns the
  digest), or ``kept``. The fixture split is doc_id parity (evens =
  base, odds = incoming) so the oracle can reproduce it.

Scale notes (100 TB):
- ``cluster_representatives`` adds ONE digest... cluster-keyed hash-agg
  shuffle on top of the components labels; ``max_by`` is an aggregate
  (map-side partial, no window sort over the corpus).
- ``incremental_dedup``'s base side is reduced to a DISTINCT digest
  index (32-byte rows — the persisted artifact a production pipeline
  keeps between runs) before the join; the join keys are uniform md5
  digests, so no skew. When the daily batch is small relative to the
  base, runtime bloom-filter join (`spark.sql.optimizer.runtime.
  bloomFilter.enabled`) or broadcasting the BATCH side and streaming
  the base index past it inverts the cost; both are plan-level choices
  Spark/AQE makes from stats, not code changes here.

Reference parity note: the reference has no dedup surface at all (its
closest analog is Postgres upsert-by-PK, python/etl_pipeline.py); this
family is part of the beyond-reference training-data mandate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .components import dedup_components
from .minhash import pairs_oracle_sql

_REPS_ORACLE = f"""
WITH RECURSIVE pairs AS (
  {pairs_oracle_sql("documents")}
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), walk(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON w.node = e.src
), labels AS (
  SELECT node AS doc_id, min(lbl) AS canonical_id FROM walk GROUP BY node
), scored AS (
  SELECT l.canonical_id, d.doc_id, d.n_chars,
         row_number() OVER (
           PARTITION BY l.canonical_id
           ORDER BY d.n_chars DESC, d.doc_id ASC
         ) AS rn
  FROM labels l JOIN documents d USING (doc_id)
)
SELECT canonical_id,
       CAST(count(*) AS BIGINT) AS cluster_size,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(max(CASE WHEN rn = 1 THEN doc_id END) AS BIGINT) AS rep_doc_id,
       CAST(max(CASE WHEN rn = 1 THEN n_chars END) AS BIGINT) AS rep_chars
FROM scored
GROUP BY canonical_id
"""


@register("cluster_representatives", oracle=_REPS_ORACLE)
def cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-argmax survivor per near-dup cluster (singletons included:
    they are their own representative)."""
    labels = dedup_components(spark, sf_dir)  # doc_id, canonical_id, is_canonical
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    quality = F.struct(F.col("n_chars"), (-F.col("doc_id")).alias("tie"))
    return (
        labels.join(docs, "doc_id")
        .groupBy("canonical_id")
        .agg(
            F.count("*").alias("cluster_size"),
            F.sum("n_chars").alias("total_chars"),
            F.max_by("doc_id", quality).alias("rep_doc_id"),
            F.max_by("n_chars", quality).alias("rep_chars"),
        )
    )


_INCR_ORACLE = """
WITH incoming AS (
  SELECT doc_id, md5(lower(trim(text))) AS content_md5
  FROM documents WHERE doc_id % 2 = 1
), base_index AS (
  SELECT DISTINCT md5(lower(trim(text))) AS content_md5
  FROM documents WHERE doc_id % 2 = 0
), firsts AS (
  SELECT content_md5, min(doc_id) AS first_id FROM incoming GROUP BY 1
)
SELECT i.doc_id, i.content_md5,
       CASE WHEN b.content_md5 IS NOT NULL THEN 'dup_of_base'
            WHEN i.doc_id <> f.first_id THEN 'dup_in_batch'
            ELSE 'kept' END AS status
FROM incoming i
LEFT JOIN base_index b USING (content_md5)
JOIN firsts f USING (content_md5)
"""


@register("incremental_dedup", oracle=_INCR_ORACLE)
def incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup an incoming batch against the base corpus's digest index.

    Every incoming doc is annotated, none silently dropped — the caller
    filters ``status = 'kept'``; the other two statuses are the audit
    trail (how much of today's crawl was already known vs self-dup)."""
    docs = load_table(spark, sf_dir, "documents")
    digest = F.md5(F.lower(F.trim(F.col("text")))).alias("content_md5")
    incoming = docs.filter(F.col("doc_id") % 2 == 1).select("doc_id", digest)
    base_index = (
        docs.filter(F.col("doc_id") % 2 == 0).select(digest).distinct()
        .withColumn("in_base", F.lit(True))
    )
    firsts = incoming.groupBy("content_md5").agg(F.min("doc_id").alias("first_id"))
    return (
        incoming.join(base_index, "content_md5", "left")
        .join(firsts, "content_md5")
        .select(
            "doc_id",
            "content_md5",
            F.when(F.col("in_base"), "dup_of_base")
            .when(F.col("doc_id") != F.col("first_id"), "dup_in_batch")
            .otherwise("kept")
            .alias("status"),
        )
    )
