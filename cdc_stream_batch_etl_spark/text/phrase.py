"""Phrase search — exact two-term phrase matching by positional postings
intersection, the inverted-index search primitive.

term_postings (text/postings.py) builds the index; this is the query
side: find documents where TERM_A is immediately followed by TERM_B,
with occurrence counts. The distributed spelling is the classic
positional-postings join — postings(A) ⋈ postings(B) on
(doc_id, pos + 1) — NOT a regex scan: at 100 TB the corpus is read once
to build positioned postings (or not at all, when the term_postings
index is materialized — then the join reads two index partitions whose
size is the terms' document frequency, orders of magnitude below the
corpus), and the equi-join keys (doc_id, pos) shuffle-partition evenly.

The oracle is the OTHER algorithm: a per-document token walk in DuckDB
(list comprehension over split positions). Two independent
formulations, identical rows — the source_overlap verification pattern.

Tokenization is the engine's standard whitespace split (doc_token_stats,
term_postings), so phrase semantics are token-exact: no substring false
positives ("rehash value" does not match), no regex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: The queried phrase — two adjacent tokens.
TERM_A = "hash"
TERM_B = "value"

_PHRASE_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), counted AS (
  SELECT doc_id,
         CAST(len([i FOR i IN generate_series(1, len(t) - 1)
                   IF t[i] = '{TERM_A}' AND t[i + 1] = '{TERM_B}']) AS BIGINT)
           AS n_matches
  FROM toks
)
SELECT doc_id, n_matches FROM counted WHERE n_matches > 0
"""


@register("phrase_search", oracle=_PHRASE_ORACLE)
def phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents containing the phrase "TERM_A TERM_B" with occurrence
    counts, via positional-postings intersection (see module
    docstring)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split(F.col("text"), " ")).alias("pos", "term")
    )
    a = toks.filter(F.col("term") == TERM_A).select("doc_id", "pos")
    b = toks.filter(F.col("term") == TERM_B).select(
        "doc_id", (F.col("pos") - 1).alias("pos")
    )
    return (
        a.join(b, ["doc_id", "pos"])
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_matches"))
    )
