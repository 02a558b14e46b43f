"""Epoch-allocation planning under data constraints — the
repeat-your-data value curve (Muennighoff et al., "Scaling
Data-Constrained Language Models", NeurIPS 2023 establishes that
repeated epochs have sharply diminishing returns; beyond-reference,
SURVEY §2.11 composition-planning family next to packing_waste_curve
and token_quota_by_source).

When the token budget exceeds the corpus, a pipeline re-reads sources
for multiple epochs — but the r-th epoch of the same tokens is worth
less than the first. This report tabulates, per source and epoch count
R ∈ 1..6, the cost/value ledger a budget planner reads: tokens spent
(R×D), EFFECTIVE tokens under a halving-returns model (epoch r
contributes D/2^(r-1), so E(R) = D·(2 − 2^(1−R)) — the same
diminishing-returns shape as the paper's fitted decay, chosen with a
power-of-two base so every term is an exact binary fraction),
utilization E/(R·D), and the marginal effective-token rate of the
R-th epoch (2^(1−R)). The knee — where marginal value drops below a
fresh-data alternative — is the answer, exactly the
packing_waste_curve read-this-table contract.

Determinism: D is an exact BIGINT sum; 2^(1−R) is written as
1.0 / (1<<(R−1)) — an exact IEEE double for R ≤ 6 — so every derived
column is a single exact-or-correctly-rounded arithmetic expression,
identical literal shape in both engines. No float accumulation.

Scale: one documents scan → |sources| hash agg (map-side partials),
then a 6-row literal explode of the 20-row aggregate. Nothing
corpus-sized past the first agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

MAX_EPOCHS = 6

_EPOCH_ORACLE = f"""
WITH src AS (
  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS d_tokens
  FROM documents GROUP BY source
),
plan AS (
  SELECT source, d_tokens, CAST(r AS BIGINT) AS epochs,
         1.0 / (1 << (CAST(r AS INTEGER) - 1)) AS marginal_rate
  FROM src, unnest(range(1, {MAX_EPOCHS + 1})) AS t(r)
)
SELECT source, epochs, d_tokens,
       CAST(epochs * d_tokens AS BIGINT) AS tokens_spent,
       d_tokens * (2.0 - marginal_rate) AS effective_tokens,
       (2.0 - marginal_rate) / epochs AS utilization,
       marginal_rate AS marginal_effective_per_token
FROM plan
ORDER BY source, epochs
"""


@register("epoch_allocation_plan", oracle=_EPOCH_ORACLE)
def epoch_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, epochs, d_tokens, tokens_spent, effective_tokens,
    utilization, marginal_effective_per_token) — the per-source
    repeat-epoch value ledger under halving returns."""
    docs = load_table(spark, sf_dir, "documents")
    src = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " ")).cast("bigint")).alias("d_tokens")
    )
    # (r, 2^(1-r)) pairs as literals — exact binary fractions, the same
    # values the oracle's 1.0/(1<<(r-1)) produces
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(r).cast("bigint").alias("epochs"),
                    F.lit(1.0 / (1 << (r - 1))).alias("marginal_rate"),
                )
                for r in range(1, MAX_EPOCHS + 1)
            ]
        )
    ).alias("e")
    plan = src.select("source", "d_tokens", pairs).select(
        "source",
        F.col("e.epochs").alias("epochs"),
        "d_tokens",
        (F.col("e.epochs") * F.col("d_tokens")).alias("tokens_spent"),
        F.col("e.marginal_rate").alias("marginal_rate"),
    )
    return plan.select(
        "source",
        "epochs",
        "d_tokens",
        "tokens_spent",
        (F.col("d_tokens") * (F.lit(2.0) - F.col("marginal_rate"))).alias(
            "effective_tokens"
        ),
        ((F.lit(2.0) - F.col("marginal_rate")) / F.col("epochs")).alias("utilization"),
        F.col("marginal_rate").alias("marginal_effective_per_token"),
    ).orderBy("source", "epochs")
