"""Overlapping-window document chunking — beyond-reference.

RAG indexing and long-context training both need documents split into
fixed-size overlapping token windows with STABLE chunk identities: a
chunk id must be a pure function of (doc_id, chunk index) so re-runs and
backfills upsert instead of duplicating, and downstream embeddings can be
joined back without positional bookkeeping.

Chunking is entirely scan-local — the chunk list is one array expression
per document, exploded once; no shuffle anywhere in the plan, so the
operator scales linearly with corpus bytes and parallelizes per input
split. (PLANS.md records 0 exchanges.)

Geometry: windows of CHUNK_W words every CHUNK_S words (CHUNK_W-CHUNK_S
words of overlap). The number of windows is ceil(n_words / CHUNK_S) via
integer arithmetic — identical in Spark (`div`) and DuckDB (`//`) — and
the tail window is kept even when shorter than CHUNK_W (training-data
convention: never silently drop trailing text).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..dedup import hash64_expr, hash64_sql

CHUNK_W = 32  # window width (words)
CHUNK_S = 24  # stride (words); CHUNK_W - CHUNK_S words of overlap


_CHUNKS_ORACLE = f"""
SELECT doc_id,
       chunk_idx,
       {hash64_sql("doc_id || ':' || chunk_idx")} AS chunk_id,
       array_to_string(words[chunk_idx * {CHUNK_S} + 1 : chunk_idx * {CHUNK_S} + {CHUNK_W}], ' ') AS chunk_text,
       len(words[chunk_idx * {CHUNK_S} + 1 : chunk_idx * {CHUNK_S} + {CHUNK_W}]) AS n_chunk_words
FROM (
  SELECT doc_id, words,
         unnest(range((len(words) + {CHUNK_S} - 1) // {CHUNK_S})) AS chunk_idx
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
)
"""


@register("doc_chunks", oracle=_CHUNKS_ORACLE)
def doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explode each document into overlapping CHUNK_W-word windows at
    stride CHUNK_S. chunk_id = md5-derived 60-bit hash of
    'doc_id:chunk_idx' — content-addressed, stable across runs and
    engines (same family as train_test_split's bucket function)."""
    docs = load_table(spark, sf_dir, "documents")
    # explode the chunk INDICES first: the Generate node is a projection
    # barrier, so the slice below reads `words` as a materialized
    # attribute instead of re-tokenizing per chunk (a transform(sequence)
    # lambda here was quadratic after CollapseProject inlined the split —
    # see dedup.ngram_fold_sql). The stride geometry rules out the
    # zip_with-fold spelling, so the barrier pattern is the linear path.
    chunk = F.slice(F.col("words"), F.col("chunk_idx") * CHUNK_S + 1, CHUNK_W)
    return (
        docs.select("doc_id", F.split("text", " ").alias("words"))
        .select(
            "doc_id",
            "words",
            F.explode(
                F.expr(f"sequence(0, (size(words) + {CHUNK_S} - 1) div {CHUNK_S} - 1)")
            ).alias("chunk_idx"),
        )
        .select(
            "doc_id",
            "chunk_idx",
            F.expr(hash64_expr("concat(doc_id, ':', chunk_idx)")).alias("chunk_id"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
            F.size(chunk).alias("n_chunk_words"),
        )
    )
