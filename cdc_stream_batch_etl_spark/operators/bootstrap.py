"""Poisson bootstrap — single-scan resampling uncertainty for corpus
and revenue statistics.

Classical bootstrap resampling draws N rows with replacement per
replicate — impossible to do R times over 100 TB. The Poisson bootstrap
(Hanley & MacGibbon 2006; the standard large-scale variant popularized
by Google's "Bag of Little Bootstraps"-era pipelines) replaces the
multinomial draw with an independent Poisson(1) weight per (row,
replicate): each row contributes ``w ~ Poisson(1)`` copies to replicate
r, which converges to the true bootstrap distribution and — crucially —
needs only ONE scan with a ×R row expansion that map-side partial
aggregation collapses to ≤ R rows per task before any shuffle.

Determinism (the repo's seeded-RNG rule, same as training_shuffle /
stratified_sample): the Poisson draw is the inverse CDF evaluated on a
40-bit md5 hash of (o_orderkey, replicate) — compared against
PRE-SCALED INTEGER thresholds ``floor(CDF_k · 2⁴⁰)``, so no float ever
enters the sampling decision and both engines make bit-identical draws.
Weights are capped at 6 (P(w>6|λ=1) ≈ 8·10⁻⁵ — the tail mass lands on
w=6, a documented truncation identical in both engines).

Per-replicate means use the functions/money.py dsum discipline: the
weighted revenue sum is exact DECIMAL(18,2)·w arithmetic
(order-independent), then ONE IEEE division by the integer weight sum —
bit-identical across engines and across Spark's nondeterministic
partial-agg orders.

Output is the R per-replicate rows (replicate, n_sampled, boot_mean):
the user's CI is any quantile of boot_mean over the rows; keeping the
replicates (rather than baking in one interpolation convention) is what
makes the result exactly oracle-able and composable.

At 100 TB: one scan; the explode(sequence(0, R−1)) fan-out never
materializes beyond the codegen pipeline because hash-aggregation
consumes it in the same stage; the shuffle carries ≤ R×tasks tiny
partial rows. No reference-repo counterpart (SURVEY §2.11
beyond-reference mandate — the uncertainty-quantification step of a
metrics pipeline).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: number of bootstrap replicates
N_REPLICATES = 32
#: Poisson(1) weight cap (tail mass collapses onto the cap)
_W_CAP = 6

# integer thresholds floor(P(X<=k | lambda=1) * 2^40) for k = 0..cap-1:
# a 40-bit hash h draws weight w = #{k : h >= T_k} — pure integer
# comparisons, identical in both engines.
_THRESHOLDS = [
    math.floor(math.exp(-1) * sum(1 / math.factorial(i) for i in range(k + 1)) * (1 << 40))
    for k in range(_W_CAP)
]

# 40-bit md5-derived hash of (orderkey, replicate) — the winnow.py idiom
_H40_SPARK = (
    "cast(conv(substr(md5(concat(cast(o_orderkey as string), ':', "
    "cast(replicate as string))), 1, 10), 16, 10) as bigint)"
)
_H40_SQL = (
    "CAST(('0x' || substr(md5(o_orderkey::VARCHAR || ':' || replicate::VARCHAR), 1, 10)) AS BIGINT)"
)


def _w_cases(h: str) -> str:
    """w = count of thresholds <= h, spelled as an integer sum of
    comparisons (no CASE chain — both engines fold it identically)."""
    return " + ".join(f"(case when {h} >= {t} then 1 else 0 end)" for t in _THRESHOLDS)


_BOOTSTRAP_ORACLE = f"""
WITH expanded AS (
  SELECT o.o_orderkey, o.o_totalprice, r.replicate
  FROM orders o, LATERAL unnest(generate_series(0, {N_REPLICATES - 1})) r(replicate)
),
hashed AS (
  SELECT replicate, o_totalprice, {_H40_SQL} AS h
  FROM expanded
),
weighted AS (
  SELECT replicate, o_totalprice,
         {_w_cases('h')} AS w
  FROM hashed
)
SELECT CAST(replicate AS BIGINT) AS replicate,
       CAST(sum(w) AS BIGINT) AS n_sampled,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * w) AS DOUBLE) / sum(w) AS boot_mean
FROM weighted
GROUP BY replicate
ORDER BY replicate
"""


@register("bootstrap_revenue_means", oracle=_BOOTSTRAP_ORACLE)
def bootstrap_revenue_means(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson(1) bootstrap of mean order value: N_REPLICATES
    deterministic hash-seeded replicates, each one row (replicate,
    n_sampled, boot_mean). spread(boot_mean) is the sampling
    uncertainty of the corpus mean — the single-scan alternative to R
    full resamples."""
    from ..functions.parallelism import fan_out

    # r12 optimization (guide §2.5 input skew / §1.2 step 1): orders is a
    # single-row-group file, so the explode + 32 md5 draws per order —
    # ~4.8M digests at sf0.1, the whole cost of this plan — ran inside the
    # ONE scan task on one core (9.5 s solo). fan_out round-robins the
    # 150k input rows across the cluster first (no-op on wide scans), so
    # the hashing parallelizes; per-row draws are key-independent, output
    # unchanged.
    orders = fan_out(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    )
    expanded = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.explode(F.sequence(F.lit(0), F.lit(N_REPLICATES - 1))).alias("replicate"),
    )
    # hash projected ONCE, then the 6 threshold comparisons read the
    # column — never 6 inlined md5 evaluations per row
    hashed = expanded.select(
        "replicate", "o_totalprice", F.expr(_H40_SPARK).alias("h")
    )
    weighted = hashed.select(
        "replicate",
        "o_totalprice",
        F.expr(_w_cases("h")).alias("w"),
    )
    return (
        weighted.groupBy("replicate")
        .agg(
            F.sum("w").cast("bigint").alias("n_sampled"),
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)") * F.col("w")).cast("double")
                / F.sum("w")
            ).alias("boot_mean"),
        )
        .select(F.col("replicate").cast("bigint").alias("replicate"), "n_sampled", "boot_mean")
        .orderBy("replicate")
    )
