"""Corpus-wide n-gram statistics — bigram counts and document frequency.

Beyond-reference operator: the vocabulary/collocation profile a training
corpus needs (tokenizer fitting, boilerplate detection — an n-gram whose
document frequency approaches the corpus size is template text).

Shape: per-doc bigram construction is scan-local array math
(``zip_with`` over two shifted slices of the token array — one pass, no
self-join; the alternative posexplode + index self-join would shuffle the
whole exploded corpus twice). The only shuffle is the final groupBy on the
bigram itself, which map-side partial aggregation compresses from
O(corpus tokens) to O(distinct bigrams per partition) before exchange.
``count(distinct doc_id)`` is exact (SURVEY.md A7 rule: the oracle must
hash-match — no approx_count_distinct), which Spark executes as a
two-phase expand; at 100 TB swap in a per-bigram HLL sketch only if the
harness relaxes exactness.

The zip_with lambda is interpreted (not codegen'd) — measured earlier on
the simhash path (see dedup/simhash.py) interpretation cost matters when
the HOF feeds a *self-join*; here it feeds a single aggregation and the
per-row cost is amortized by map-side combine, so the relational rewrite
is not worth its extra shuffle.

DF >= 2 filter: a HAVING on the aggregate (post-shuffle, so it prunes
output size, not shuffle size — acceptable because the aggregate itself
is the compression step).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

MIN_DF = 2

_NGRAM_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), bg AS (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS bigram
  FROM toks, (SELECT unnest(generate_series(1, len(t) - 1)) AS i) u
)
SELECT bigram,
       count(*) AS n_occurrences,
       count(DISTINCT doc_id) AS doc_freq
FROM bg
GROUP BY bigram
HAVING count(DISTINCT doc_id) >= {MIN_DF}
"""


@register("corpus_bigrams", oracle=_NGRAM_ORACLE)
def corpus_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    bigrams = F.zip_with(
        F.slice(toks, 1, F.size(toks) - 1),
        F.slice(toks, 2, F.size(toks) - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        docs.select("doc_id", F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(
            F.count("*").alias("n_occurrences"),
            F.countDistinct("doc_id").alias("doc_freq"),
        )
        .filter(F.col("doc_freq") >= MIN_DF)
    )
