"""Token-budget corpus selection — per-source quota by quality rank.

A training-mix recipe rarely says "take everything"; it says "at most B
tokens from each source, best documents first" (the Pile / Dolma /
RedPajama mixture construction step). This operator ranks each source's
documents by a quality key and keeps the prefix whose cumulative token
count fits the per-source budget — the greedy knapsack every mixture
builder runs after cleaning and dedup (composition.py's
lang_temperature_sample is the SAMPLING twin; this is the HARD-CAP twin).

Quality key: type/token ratio (n_unique/n_tokens, the doc_token_stats
convention) descending — dull repetitive documents rank last — with
doc_id as the total-order tiebreak so both engines agree on the cut.

Scale: the window is PARTITIONED BY source — each source's cumsum is
independent, so the plan is one hash shuffle on source followed by a
per-partition sort, parallel across sources. This is the scale-safe
spelling: a GLOBAL token budget would need a single total-order cumsum
(one partition — a scale-killer) or a threshold bisection; per-source
quotas are what mixture recipes specify anyway. Skewed sources (one
domain = half the corpus) are bounded by the budget itself: the cumsum
can stop early only logically, but AQE skew-split plus the fact that
rank/cumsum are O(n log n) per partition keep the cost at sort-of-source,
the same cost class as any per-domain window in the engine
(ranking.py precedent).

Beyond-reference (the reference has no corpus operators); the budget
constant is fixture-scaled like config.Thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: per-source token budget (fixture-scaled: sf0.01 has ~100 docs/source
#: × ~60 tokens, so 2000 selects roughly the best third of each source)
TOKEN_QUOTA = 2000

_QUOTA_ORACLE = f"""
WITH t AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_tokens,
         CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
           / len(string_split(text, ' ')) AS ttr
  FROM documents
), c AS (
  SELECT doc_id, source, n_tokens, ttr,
         SUM(n_tokens) OVER (
           PARTITION BY source ORDER BY ttr DESC, doc_id
           ROWS UNBOUNDED PRECEDING
         ) AS cum_tokens
  FROM t
)
SELECT doc_id, source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum_tokens AS BIGINT) AS cum_tokens,
       cum_tokens <= {TOKEN_QUOTA} AS selected
FROM c
"""


@register("token_quota_by_source", oracle=_QUOTA_ORACLE)
def token_quota_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every document annotated with its within-source cumulative token
    count (quality-ranked) and whether it fits the TOKEN_QUOTA budget."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    t = docs.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tokens"),
        (F.size(F.array_distinct(toks)).cast("double") / F.size(toks)).alias("ttr"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy(F.col("ttr").desc(), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return t.select(
        "doc_id",
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_tokens").over(w).cast("bigint").alias("cum_tokens"),
    ).withColumn("selected", F.col("cum_tokens") <= TOKEN_QUOTA)
