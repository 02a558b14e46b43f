"""Neyman-allocation sampling plan — variance-optimal stratified
sample sizing across corpus sources.

stratified_sample draws proportionally and pps_token_sample draws by
size; when the goal is estimating a corpus statistic (mean document
length, mean quality) with minimum variance at a fixed budget, the
optimal stratum allocation is Neyman's (1934): n_h ∝ N_h·σ_h — big AND
internally-diverse sources get more of the budget, homogeneous ones
less. This operator emits the plan: per source, its size, the exact
population standard deviation of document length, the optimal
allocation for a SAMPLE_BUDGET draw, and the realized sampling
fraction — the table a measurement pipeline feeds into its sampler.

Determinism: σ_h comes from exact integer sufficient statistics
(Σx, Σx², n over bigint n_chars — the repo's exact-stats discipline,
e.g. revenue_trend), so the variance double is bit-identical in both
engines and sqrt is IEEE-correctly-rounded. The allocation denominator
Σ_h N_h·σ_h is a SOURCE-ORDERED left fold over the strata (the bm25
list-fold idiom — both engines add the same doubles in the same
order), never a nondeterministic parallel or segment-tree sum; the
final n_h = floor of one IEEE multiply/divide chain on identical
doubles.

Scale: one hash-agg over the corpus to ~dozens of stratum rows; the
window runs on those rows. The plan is O(strata) however large the
corpus. No reference-repo counterpart (SURVEY §2.11 beyond-reference
mandate — the sampling-design sibling of stratified_sample /
pps_token_sample / source_mix_plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

SAMPLE_BUDGET = 10_000

_NEYMAN_ORACLE = f"""
WITH stats AS (
  SELECT source,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(n_chars) AS BIGINT) AS s1,
         CAST(sum(n_chars * n_chars) AS BIGINT) AS s2
  FROM documents
  GROUP BY source
),
sd AS (
  SELECT source, n_rows,
         sqrt(greatest(CAST(s2 AS DOUBLE) / n_rows
                       - (CAST(s1 AS DOUBLE) / n_rows) * (CAST(s1 AS DOUBLE) / n_rows),
                       0.0)) AS sigma
  FROM stats
),
tot AS (
  SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                  list(n_rows * sigma ORDER BY source)),
                     (a, b) -> a + b) AS w_total
  FROM sd
),
weighted AS (
  SELECT source, n_rows, sigma, n_rows * sigma AS w, t.w_total
  FROM sd CROSS JOIN tot t
)
SELECT source, n_rows, sigma,
       CAST(floor({SAMPLE_BUDGET} * w / w_total) AS BIGINT) AS alloc,
       CAST(floor({SAMPLE_BUDGET} * w / w_total) AS DOUBLE) / n_rows
         AS sampling_fraction
FROM weighted
ORDER BY source
"""


@register("neyman_allocation_plan", oracle=_NEYMAN_ORACLE)
def neyman_allocation_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Variance-optimal stratified sampling plan over sources:
    n_h = floor(B · N_h·σ_h / Σ N_h·σ_h) for a B = SAMPLE_BUDGET draw,
    with σ_h the exact population std-dev of document length."""
    docs = load_table(spark, sf_dir, "documents").select("source", "n_chars")
    stats = docs.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("n_chars").cast("bigint").alias("s1"),
        F.sum(F.col("n_chars") * F.col("n_chars")).cast("bigint").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_rows")
    sigma = F.sqrt(
        F.greatest(
            F.col("s2").cast("double") / F.col("n_rows") - mean * mean, F.lit(0.0)
        )
    )
    sd = stats.select("source", "n_rows", sigma.alias("sigma"))
    # source-ordered left fold of the per-stratum weights (the bm25
    # list-fold idiom): both engines add the SAME doubles in the SAME
    # order — never a parallel-reduction or segment-tree window sum
    tot = sd.agg(
        F.sort_array(
            F.collect_list(
                F.struct("source", (F.col("n_rows") * F.col("sigma")).alias("w"))
            )
        ).alias("arr")
    ).select(
        F.expr("aggregate(arr, 0.0D, (acc, x) -> acc + x.w)").alias("w_total")
    )
    weighted = sd.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_rows",
        "sigma",
        (F.col("n_rows") * F.col("sigma")).alias("w"),
        "w_total",
    )
    alloc = F.floor(F.lit(SAMPLE_BUDGET) * F.col("w") / F.col("w_total"))
    return (
        weighted.select(
            "source",
            "n_rows",
            "sigma",
            alloc.cast("bigint").alias("alloc"),
            (alloc.cast("double") / F.col("n_rows")).alias("sampling_fraction"),
        )
        .orderBy("source")
    )
