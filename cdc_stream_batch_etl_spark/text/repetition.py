"""Repetition-based quality filtering — the duplicated-n-gram and
dominant-token heuristics used to drop degenerate/template documents from
training corpora (the "repetitious text" family of filters popularized by
large-LM data pipelines).

Signals per document:
  - dup_bigram_ratio / dup_trigram_ratio: 1 - distinct/total n-grams —
    high when the doc loops over the same phrases. Scan-local array math
    (zip_with over shifted token slices; no shuffle, no UDF).
  - top_token_ratio: frequency of the most common token / token count —
    high for "spam spam spam" degenerate docs. Relational (explode →
    per-(doc,token) count → per-doc max): two hash aggregates partitioned
    by doc_id; the second reuses the first's partitioning, so it is one
    real shuffle of O(distinct tokens per doc) rows.
  - is_repetitive: the gate a cleaning pipeline would apply (>20% dup
    bigrams or >20% single-token mass).

Short-doc guards: n-gram ratios are NULL when the doc is too short to
form the n-gram (division-by-zero would otherwise produce NaN in Spark
and DuckDB — both engines, but NULL states the semantics).

All ratios are per-row double divisions of integers — bit-identical in
both engines regardless of row order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

DUP_THRESHOLD = 0.2

_REPETITION_ORACLE = f"""
WITH t AS (
  SELECT doc_id, string_split(text, ' ') AS toks FROM documents
), grams AS (
  SELECT doc_id, len(toks) AS n_tokens,
         list_transform(generate_series(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i + 1]) AS bg,
         list_transform(generate_series(1, len(toks) - 2),
                        i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS tg
  FROM t
), ratios AS (
  SELECT doc_id, n_tokens,
         CASE WHEN len(bg) = 0 THEN NULL
              ELSE 1 - CAST(len(list_distinct(bg)) AS DOUBLE) / len(bg) END AS dup_bigram_ratio,
         CASE WHEN len(tg) = 0 THEN NULL
              ELSE 1 - CAST(len(list_distinct(tg)) AS DOUBLE) / len(tg) END AS dup_trigram_ratio
  FROM grams
), tok_counts AS (
  SELECT doc_id, tok, count(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
  GROUP BY doc_id, tok
), top_tok AS (
  SELECT doc_id, max(c) AS top_cnt FROM tok_counts GROUP BY doc_id
)
SELECT r.doc_id, r.n_tokens, r.dup_bigram_ratio, r.dup_trigram_ratio,
       CAST(tt.top_cnt AS DOUBLE) / r.n_tokens AS top_token_ratio,
       (coalesce(r.dup_bigram_ratio, 0) > {DUP_THRESHOLD}
        OR CAST(tt.top_cnt AS DOUBLE) / r.n_tokens > {DUP_THRESHOLD}) AS is_repetitive
FROM ratios r
JOIN top_tok tt ON r.doc_id = tt.doc_id
"""


def _dup_ratio(grams: Column) -> Column:
    return F.when(
        F.size(grams) > 0,
        F.lit(1) - F.size(F.array_distinct(grams)).cast("double") / F.size(grams),
    )


@register("doc_repetition", oracle=_REPETITION_ORACLE)
def doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    concat_sp = lambda a, b: F.concat(a, F.lit(" "), b)  # noqa: E731
    bg = F.zip_with(F.slice(toks, 1, F.size(toks) - 1), F.slice(toks, 2, F.size(toks) - 1), concat_sp)
    tg = F.zip_with(
        F.zip_with(F.slice(toks, 1, F.size(toks) - 2), F.slice(toks, 2, F.size(toks) - 2), concat_sp),
        F.slice(toks, 3, F.size(toks) - 2),
        concat_sp,
    )
    ratios = docs.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        _dup_ratio(bg).alias("dup_bigram_ratio"),
        _dup_ratio(tg).alias("dup_trigram_ratio"),
    )
    top_tok = (
        docs.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .count()
        .groupBy("doc_id")
        .agg(F.max("count").alias("top_cnt"))
    )
    joined = ratios.join(top_tok, "doc_id")
    top_ratio = F.col("top_cnt").cast("double") / F.col("n_tokens")
    return joined.select(
        "doc_id",
        "n_tokens",
        "dup_bigram_ratio",
        "dup_trigram_ratio",
        top_ratio.alias("top_token_ratio"),
        (
            (F.coalesce(F.col("dup_bigram_ratio"), F.lit(0.0)) > DUP_THRESHOLD)
            | (top_ratio > DUP_THRESHOLD)
        ).alias("is_repetitive"),
    )
