"""CCNet-style perplexity bucketing — head/middle/tail per language by
corpus-LM score (Wenzek et al., "CCNet: Extracting High Quality
Monolingual Datasets from Web Crawl Data", LREC 2020; beyond-reference,
SURVEY §2.11 text-curation family).

CCNet's signature move: score every document with a small language
model, split each language into equal-mass perplexity TERCILES, and
train preferentially on the head. This re-expresses that on the
engine's own corpus-bigram score (text/lm.py — avg transition
probability, where HIGH avg-P = LOW perplexity = head), composing the
verified doc_lm_score plan rather than re-deriving it: per language,
rank docs by (score DESC, doc_id) and cut into ntile(3) buckets, then
report each bucket's volume (docs, whitespace tokens) and its score
RANGE [min, max] — the numbers a curriculum or sampling plan reads.

Determinism: the per-doc score is the lm.py sorted-fold expression
(driver-green, atol=0); bucketing is ntile over the total order
(score DESC, doc_id) — deterministic given deterministic scores; the
report's aggregates are exact integer sums plus min/max PICKS of
already-deterministic doubles — no new float accumulation anywhere.

Scale: the lm.py two-pass model + score join (its documented posture),
then ONE additional |docs|-row window keyed on lang (5 partitions here;
a skewed-language corpus salts the same way ntile plans always do —
the cut only needs per-lang rank, which a two-pass count+rank computes
without a single-partition sort if |langs| is tiny), and a 15-row agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .lm import _LM_ORACLE, doc_lm_score

_CCNET_ORACLE = f"""
WITH lm AS ({_LM_ORACLE}),
ranked AS (
  SELECT d.lang, d.doc_id, lm.avg_transition_p AS score,
         len(string_split(d.text, ' ')) AS n_tokens,
         ntile(3) OVER (PARTITION BY d.lang
                        ORDER BY lm.avg_transition_p DESC, d.doc_id) AS b
  FROM documents d JOIN lm ON d.doc_id = lm.doc_id
)
SELECT lang,
       CASE b WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS bucket,
       count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       min(score) AS min_score,
       max(score) AS max_score
FROM ranked
GROUP BY lang, b
ORDER BY lang, b
"""


@register("ccnet_lm_buckets", oracle=_CCNET_ORACLE)
def ccnet_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(lang, bucket, n_docs, n_tokens, min_score, max_score) — CCNet
    head/middle/tail terciles per language under the corpus-LM score."""
    docs = load_table(spark, sf_dir, "documents")
    scores = doc_lm_score(spark, sf_dir).select("doc_id", "avg_transition_p")
    ranked = (
        docs.select(
            "doc_id",
            "lang",
            F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
        )
        .join(scores, "doc_id")
        .withColumn(
            "b",
            F.ntile(3).over(
                Window.partitionBy("lang").orderBy(
                    F.desc("avg_transition_p"), F.col("doc_id")
                )
            ),
        )
    )
    return (
        ranked.groupBy("lang", "b")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.min("avg_transition_p").alias("min_score"),
            F.max("avg_transition_p").alias("max_score"),
        )
        .select(
            "lang",
            F.when(F.col("b") == 1, "head")
            .when(F.col("b") == 2, "middle")
            .otherwise("tail")
            .alias("bucket"),
            "n_docs",
            "n_tokens",
            "min_score",
            "max_score",
        )
        .orderBy("lang", "bucket")
    )
