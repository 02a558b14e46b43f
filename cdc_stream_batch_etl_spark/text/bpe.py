"""BPE-style token counting — its own module so the registry can place
its first driver-window slot independently of the (already driver-green)
text/analysis.py family."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# BPE-style pre-tokenization (the GPT-2 pattern family, simplified to the
# engine-portable core): contraction suffixes, space-prefixed letter runs,
# space-prefixed digit runs, space-prefixed punctuation runs, residual
# whitespace. ASCII classes only — Java regex (Spark) and RE2 (DuckDB)
# disagree on some \p{} unicode classes, and the corpus is ASCII. This is
# the "how many LLM tokens is this corpus" estimator the composition
# planner budgets with; whitespace tokens undercount ~1.3-1.5x.
_BPE_PATTERN = r"'(s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ']+"
_BPE_PATTERN_SQL = _BPE_PATTERN.replace("'", "''")  # SQL string-literal escaping

_BPE_ORACLE = f"""
SELECT doc_id,
       len(string_split(text, ' ')) AS n_ws_tokens,
       len(regexp_extract_all(text, '{_BPE_PATTERN_SQL}')) AS n_bpe_tokens,
       CAST(len(regexp_extract_all(text, '{_BPE_PATTERN_SQL}')) AS DOUBLE)
         / len(string_split(text, ' ')) AS bpe_per_ws_token
FROM documents
"""


@register("bpe_token_count", oracle=_BPE_ORACLE)
def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish token counting: GPT-2-style pre-tokenizer regex match count
    next to the whitespace count — scan-local, codegen'd, zero shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    n_ws = F.size(F.split(F.col("text"), " "))
    n_bpe = F.regexp_count(F.col("text"), F.lit(_BPE_PATTERN))
    return docs.select(
        "doc_id",
        n_ws.cast("bigint").alias("n_ws_tokens"),
        n_bpe.cast("bigint").alias("n_bpe_tokens"),
        (n_bpe.cast("double") / n_ws).alias("bpe_per_ws_token"),
    )


#: merge-candidate report size; ties at the cut broken by pair text
BPE_TOP_PAIRS = 30

_MERGE_ORACLE = f"""
WITH words AS (
  SELECT w FROM documents,
       unnest(string_split_regex(text, '\\s+')) AS t(w)
  WHERE len(w) >= 2
),
pairs AS (
  SELECT substr(w, CAST(i AS INTEGER), 2) AS pair
  FROM words, unnest(range(1, len(w))) AS r(i)
)
SELECT pair, CAST(count(*) AS BIGINT) AS cnt
FROM pairs
GROUP BY pair
ORDER BY cnt DESC, pair
LIMIT {BPE_TOP_PAIRS}
"""


@register("bpe_merge_candidates", oracle=_MERGE_ORACLE)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE vocabulary-induction round: corpus-weighted adjacent
    character-pair frequencies inside whitespace words, top 30 (the
    next-merge ranking a tokenizer trainer would take; iterating = re-run
    on the merged symbol stream).

    Scale: the pair explode is scan-local (O(total chars), whole-stage
    codegen'd — sequence+transform, no UDF); the aggregate's key space is
    the pair alphabet (bounded by charset², a few thousand), so map-side
    partial combine collapses the shuffle to |alphabet²| rows per task
    regardless of corpus size, and the top-30 is a TakeOrdered on that
    tiny aggregate. The classic BPE corpus loop is driver-bound; this
    keeps each round one distributed pass."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.split(F.col("text"), r"\s+")).alias("w")
    ).filter(F.length("w") >= 2)
    pairs = words.select(
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substr(w, i, 2))")
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count("*").cast("bigint").alias("cnt"))
        .orderBy(F.desc("cnt"), "pair")
        .limit(BPE_TOP_PAIRS)
    )
