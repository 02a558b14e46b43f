"""Per-source quality pass-rate with Wilson score intervals — the
uncertainty-aware version of the corpus quality gate (Wilson 1927, the
standard small-n binomial interval; beyond-reference, SURVEY §2.11
quality family next to doc_quality and corpus_gate_funnel).

A source with 40 documents and a 60% pass rate is NOT comparable to a
source with 40,000 at 60% — mixture decisions made on raw rates
over-trust small sources. This reports, per source, the high-quality
pass count/rate under doc_quality's gate (n_tokens ≥ 50 and stopword
ratio in [0.01, 0.3] — the same predicate, so the numbers compose) and
the 95% Wilson interval [lo, hi], whose lower bound is the
conservative ranking key curation actually sorts by (the same reason
Reddit comment ranking uses Wilson-lower-bound).

Determinism: k and n are exact integers; the interval is the textbook
closed form written as the IDENTICAL literal expression in both
engines — divisions, one sqrt (correctly-rounded per IEEE 754), no
accumulation of floats. The bounds subtract near-equal quantities
(center − half), which AMPLIFIES any single-ulp divergence from
compiler FMA contraction in the sqrt argument, so both engines export
the interval rounded to 9 decimals (the tfidf convention); p_hat is a
single division and exports raw.

Scale: one documents scan (predicate scan-local in codegen) →
|sources| hash agg with map-side partials → scalar arithmetic on the
20-row aggregate. One exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: two-sided 95% normal quantile, the double literal both engines parse
#: to the same bits
Z = 1.959963984540054

_WILSON_ORACLE = f"""
WITH d AS (
  SELECT source,
         CASE WHEN len(string_split(text, ' ')) >= 50
               AND CAST(len(regexp_extract_all(text, '\\b(the|a)\\b')) AS DOUBLE)
                   / len(string_split(text, ' ')) BETWEEN 0.01 AND 0.3
              THEN 1 ELSE 0 END AS pass
  FROM documents
),
agg AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(pass) AS BIGINT) AS n_pass,
         CAST(sum(pass) AS DOUBLE) / count(*) AS p_hat
  FROM d GROUP BY source
)
SELECT source, n_docs, n_pass, p_hat,
       round((p_hat + {Z} * {Z} / (2.0 * n_docs)
        - {Z} * sqrt(p_hat * (1.0 - p_hat) / n_docs
                     + {Z} * {Z} / (4.0 * n_docs * n_docs)))
         / (1.0 + {Z} * {Z} / n_docs), 9) AS wilson_lo,
       round((p_hat + {Z} * {Z} / (2.0 * n_docs)
        + {Z} * sqrt(p_hat * (1.0 - p_hat) / n_docs
                     + {Z} * {Z} / (4.0 * n_docs * n_docs)))
         / (1.0 + {Z} * {Z} / n_docs), 9) AS wilson_hi
FROM agg
ORDER BY source
"""


@register("wilson_quality_ci", oracle=_WILSON_ORACLE)
def wilson_quality_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_docs, n_pass, p_hat, wilson_lo, wilson_hi) — quality
    pass rate per source with its 95% Wilson score interval."""
    docs = load_table(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    stop_ratio = (
        F.regexp_count(F.col("text"), F.lit(r"\b(the|a)\b")).cast("double") / n_tokens
    )
    passes = F.when(
        (n_tokens >= 50) & stop_ratio.between(0.01, 0.3), F.lit(1)
    ).otherwise(F.lit(0))
    agg = docs.select("source", passes.alias("pass")).groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("pass").alias("n_pass"),
    )
    n = F.col("n_docs")
    p = F.col("n_pass").cast("double") / n
    z2 = F.lit(Z) * F.lit(Z)
    center = p + z2 / (F.lit(2.0) * n)
    half = F.lit(Z) * F.sqrt(
        p * (F.lit(1.0) - p) / n + z2 / (F.lit(4.0) * n * n)
    )
    denom = F.lit(1.0) + z2 / n
    return agg.select(
        "source",
        "n_docs",
        "n_pass",
        p.alias("p_hat"),
        F.round((center - half) / denom, 9).alias("wilson_lo"),
        F.round((center + half) / denom, 9).alias("wilson_hi"),
    ).orderBy("source")
