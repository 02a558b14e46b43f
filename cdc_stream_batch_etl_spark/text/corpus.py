"""clean_corpus — the composed training-data cleaning pipeline.

The end-to-end use case every operator family exists for, as ONE query:

  documents
    → quality gate   (keep medium/high: n_tokens >= 20 — text/analysis.py)
    → language gate  (keep docs a marker language identifies: != 'und')
    → exact dedup    (keep the min-doc_id canonical per content_md5)
    → near-dup prune (MinHash-LSH verified pairs; drop every doc that
                      appears as the larger id of a pair — dedup/minhash.py)

Fully deterministic end to end, so the WHOLE composition is DuckDB-oracled
— the strongest statement the engine makes: multi-family operator
composition preserves hash-exact semantics.

Scale shape: gates are scan-local predicates fused into one pass by
Catalyst; exact dedup is one digest-keyed shuffle; LSH runs on the gated
survivor set (smaller corpus, same plan as minhash_lsh_pairs); the final
prune is a broadcast anti-join against the (tiny) removed-id set.

Survivor materialization: composed over lineage, the survivor set is
re-derived by every consumer. The default is now ON (r13): the early
measurement that favored recompute (persist() regressed 19→30 s)
predated the LSH shingle checkpoint, after which only TWO consumers
remain (the shingle fill and the final anti-join) and the interleaved
A/B at sf0.1 favors materializing (min 3.17 s vs 5.36 s). At cluster
scale re-scanning + re-gating the corpus per consumer dominates even
more; SPARK_GRAFT_MATERIALIZE selects the scale-safe materialization
backend (functions/materialize.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..dedup.minhash import lsh_pairs, pairs_oracle_sql
from ..functions.materialize import materialize
from ..registry import register

MIN_TOKENS = 20


_ORACLE = f"""
WITH gated AS (
  SELECT doc_id, text, lang,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
  WHERE len(string_split(text, ' ')) >= {MIN_TOKENS}
    AND greatest(
          len(regexp_extract_all(text, '\\b(the|a|of|to|and)\\b')),
          len(regexp_extract_all(text, '\\b(der|die|und|das|ist)\\b')),
          len(regexp_extract_all(text, '\\b(le|la|et|les|des)\\b')),
          len(regexp_extract_all(text, '\\b(el|los|y|las|es)\\b'))) > 0
), exact AS (
  SELECT g.*
  FROM gated g
  JOIN (
    SELECT md5(lower(trim(text))) AS content_md5, min(doc_id) AS keep_id
    FROM gated GROUP BY 1
  ) k ON g.doc_id = k.keep_id
), pairs AS (
  {pairs_oracle_sql("exact")}
)
SELECT e.doc_id, e.lang, e.n_tokens
FROM exact e
LEFT JOIN (SELECT DISTINCT doc_b FROM pairs) r ON e.doc_id = r.doc_b
WHERE r.doc_b IS NULL
"""


@register("clean_corpus", oracle=_ORACLE)
def clean_corpus(
    spark: SparkSession, sf_dir: str, materialize_survivors: bool | None = None
) -> DataFrame:
    if materialize_survivors is None:
        # r13: default ON. The survivor frame is consumed by lsh_pairs'
        # shingle fill AND the final anti-join; unmaterialized, the
        # regex language gates + md5 keep-join re-ran per consumer.
        # A/B at sf0.1 (interleaved, same JVM): materialized min 3.17 s
        # vs 5.36 s unmaterialized; curated_training_set inherits.
        # (The old default deferred to SPARK_GRAFT_SCALE=1 — that
        # predated the r12/r13 LSH checkpoint reshape, after which the
        # un-broken lineage is re-derived from parquet per consumer.)
        materialize_survivors = True
    docs = load_table(spark, sf_dir, "documents")

    n_tokens = F.size(F.split(F.col("text"), " "))
    marker_hits = F.greatest(
        F.regexp_count(F.col("text"), F.lit(r"\b(the|a|of|to|and)\b")),
        F.regexp_count(F.col("text"), F.lit(r"\b(der|die|und|das|ist)\b")),
        F.regexp_count(F.col("text"), F.lit(r"\b(le|la|et|les|des)\b")),
        F.regexp_count(F.col("text"), F.lit(r"\b(el|los|y|las|es)\b")),
    )
    gated = docs.filter((n_tokens >= MIN_TOKENS) & (marker_hits > 0)).select(
        "doc_id", "text", "lang", n_tokens.cast("bigint").alias("n_tokens")
    )

    keep = gated.groupBy(F.md5(F.lower(F.trim(F.col("text")))).alias("content_md5")).agg(
        F.min("doc_id").alias("keep_id")
    )
    exact = gated.join(keep, gated["doc_id"] == keep["keep_id"]).select(
        "doc_id", "text", "lang", "n_tokens"
    )
    if materialize_survivors:
        # truncate lineage: lsh_pairs consumes the survivors twice
        # (banding + verification) and the final anti-join a third time —
        # without this each consumer re-scans + re-gates the corpus
        exact = materialize(exact)

    removed = lsh_pairs(exact.select("doc_id", "text")).select("doc_b").distinct()
    return exact.join(
        removed, exact["doc_id"] == removed["doc_b"], "left_anti"
    ).select("doc_id", "lang", "n_tokens")
