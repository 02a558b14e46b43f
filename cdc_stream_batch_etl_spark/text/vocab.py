"""Tokenizer vocabulary coverage — per-source OOV profile against the
corpus-frequency top-V vocabulary.

Training-pipeline role (beyond-reference, SURVEY §2.11 mandate): before
committing a tokenizer vocabulary, measure what fraction of each
source's token OCCURRENCES the candidate vocabulary covers and how many
distinct out-of-vocabulary types remain — the standard coverage/OOV
report that decides vocabulary size and flags sources whose text the
tokenizer will shred into bytes. Composes with bpe_merge_candidates
(which proposes merges) the way a tokenizer-training loop does.

Plan: ONE token explode feeds (a) the global top-V vocabulary — count
per token (map-side partials absorb the Zipf head), deterministic
total order (count DESC, token ASC) via a single V-row TakeOrdered —
and (b) the per-(source, token) occurrence counts; the vocabulary
broadcasts into a left-semi/anti split and the per-source rollup is a
|sources|-row aggregate. No corpus-sized structure is ever broadcast
(V is a constant), and nothing shuffles twice.

Determinism: counts and thresholds are exact integers; coverage is ONE
IEEE division of exact integers (the davg pattern); the vocabulary cut
is made total by the (count, token) tie-break in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: vocabulary size — top-V tokens by corpus frequency
VOCAB_V = 512

_COVERAGE_ORACLE = f"""
WITH tok AS (
  SELECT source, w
  FROM documents, unnest(string_split(text, ' ')) AS t(w)
),
vocab AS (
  SELECT w FROM (
    SELECT w, count(*) AS c FROM tok GROUP BY 1
    ORDER BY c DESC, w ASC LIMIT {VOCAB_V}
  )
),
per AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS occ FROM tok GROUP BY 1, 2
)
SELECT source,
       CAST(sum(occ) AS BIGINT) AS total_occ,
       CAST(sum(CASE WHEN v.w IS NOT NULL THEN occ ELSE 0 END) AS BIGINT)
         AS covered_occ,
       CAST(sum(occ) - sum(CASE WHEN v.w IS NOT NULL THEN occ ELSE 0 END)
            AS BIGINT) AS oov_occ,
       CAST(count(CASE WHEN v.w IS NULL THEN 1 END) AS BIGINT) AS oov_types,
       round(CAST(sum(CASE WHEN v.w IS NOT NULL THEN occ ELSE 0 END) AS DOUBLE)
             / sum(occ), 6) AS coverage_r
FROM per p LEFT JOIN vocab v USING (w)
GROUP BY source
ORDER BY source
"""


@register("vocab_coverage", oracle=_COVERAGE_ORACLE)
def vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source token coverage of the corpus top-V vocabulary:
    total/covered/OOV occurrences, distinct OOV types, coverage ratio."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .select("source", F.explode(F.split(F.col("text"), " ")).alias("w"))
    )
    # per-(source, token) counts — the only corpus-sized exchange; the
    # global vocabulary re-aggregates THIS table (|sources|·|types| rows),
    # not the raw tokens. Persisted because both the vocabulary cut and
    # the coverage rollup consume it — without the persist each consumer
    # re-runs the corpus explode+agg (2 scans in the PLANS profile).
    # Caller-must-clear contract as elsewhere (runner.run_query, bench
    # and the driver clearCache between queries).
    per = (
        tok.groupBy("source", "w")
        .agg(F.count("*").cast("bigint").alias("occ"))
        .persist()
    )
    by_tok = per.groupBy("w").agg(F.sum("occ").alias("c"))
    # deterministic top-V cut: (count DESC, token ASC) total order
    vocab = (
        by_tok.orderBy(F.desc("c"), F.asc("w"))
        .limit(VOCAB_V)
        .select("w", F.lit(1).alias("_inv"))
    )
    joined = per.join(F.broadcast(vocab), "w", "left")
    covered = F.when(F.col("_inv").isNotNull(), F.col("occ")).otherwise(
        F.lit(0)
    )
    return (
        joined.groupBy("source")
        .agg(
            F.sum("occ").cast("bigint").alias("total_occ"),
            F.sum(covered).cast("bigint").alias("covered_occ"),
            (F.sum("occ") - F.sum(covered)).cast("bigint").alias("oov_occ"),
            F.count(F.when(F.col("_inv").isNull(), 1))
            .cast("bigint")
            .alias("oov_types"),
            F.round(
                F.sum(covered).cast("double") / F.sum("occ"), 6
            ).alias("coverage_r"),
        )
        .orderBy("source")
    )
