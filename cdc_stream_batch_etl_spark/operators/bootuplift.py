"""Bootstrap uplift distribution — the A/B readout that needs no
normality (beyond-reference, SURVEY §2.11 experimentation family
completing ab_test_zscores (normal-approx p-values) and
ab_power_planner (design): the z-test's approximation is exactly what
a skewed revenue metric violates, and the standard fix is the
bootstrap distribution of the ARM DIFFERENCE — this operator emits it,
one row per replicate, so any CI convention can be read off the rows).

Semantics: arm = md5-parity of o_custkey (the ab_test_zscores device,
dedup.hash64 % 2 — a deterministic 50/50 customer split); per
replicate r, every order contributes w ~ Poisson(1) copies via the
bootstrap_revenue_means integer-threshold draw on md5(o_orderkey, r)
(operators/bootstrap.py — the weights are SHARED with that operator by
construction, same hash, same thresholds); the row reports each arm's
weighted mean order value and uplift = mean_b - mean_a.

Exactness: the sampling decision never touches a float
(40-bit-hash >= integer-threshold comparisons); weighted sums are
exact DECIMAL(18,2)*w; each mean is ONE IEEE division and the uplift
one IEEE subtraction — identical shapes both engines. A replicate
where an arm draws zero weight (P ~ e^-n, impossible at any real SF)
would yield NULL mean and NULL uplift identically in both.

Scale: identical plan class to bootstrap_revenue_means — one orders
scan, explode(sequence(R)) consumed by map-side hash aggregation in
the same codegen stage, <= 2R partial rows per task into the shuffle.
The arm column just doubles the aggregate key space (replicate, arm).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..dedup import hash64_expr, hash64_sql
from ..registry import register
from .bootstrap import _H40_SPARK, _H40_SQL, _w_cases, N_REPLICATES

_ARM_SPARK = f"cast({hash64_expr('cast(o_custkey as string)')} % 2 as int)"
_ARM_SQL = f"CAST({hash64_sql('CAST(o_custkey AS VARCHAR)')} % 2 AS INT)"

_UPLIFT_ORACLE = f"""
WITH expanded AS (
  SELECT o.o_orderkey, o.o_totalprice, {_ARM_SQL} AS arm, r.replicate
  FROM orders o,
       LATERAL unnest(generate_series(0, {N_REPLICATES - 1})) r(replicate)
),
hashed AS (
  SELECT replicate, arm, o_totalprice, {_H40_SQL} AS h
  FROM expanded
),
weighted AS (
  SELECT replicate, arm, o_totalprice,
         {_w_cases('h')} AS w
  FROM hashed
),
per_arm AS (
  SELECT replicate, arm,
         CAST(sum(w) AS BIGINT) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)) * w) AS DOUBLE)
           / sum(w) AS mean_value
  FROM weighted GROUP BY replicate, arm
)
SELECT CAST(a.replicate AS BIGINT) AS replicate,
       a.n AS n_a, b.n AS n_b,
       a.mean_value AS mean_a, b.mean_value AS mean_b,
       b.mean_value - a.mean_value AS uplift
FROM per_arm a JOIN per_arm b
  ON a.replicate = b.replicate AND a.arm = 0 AND b.arm = 1
ORDER BY replicate
"""


@register("bootstrap_uplift_ci", oracle=_UPLIFT_ORACLE)
def bootstrap_uplift_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N_REPLICATES rows: per-replicate Poisson-bootstrap arm means and
    their difference — the distribution any uplift CI reads off."""
    from ..functions.parallelism import fan_out

    # r12 optimization (guide §2.5 / §5): fan_out parallelizes the
    # md5-draw stage off the single-row-group scan task (the bootstrap.py
    # fix — ~4.8M digests were single-threaded).
    orders = fan_out(
        load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey", "o_totalprice"
        )
    )
    expanded = orders.select(
        "o_orderkey",
        "o_totalprice",
        F.expr(_ARM_SPARK).alias("arm"),
        F.explode(F.sequence(F.lit(0), F.lit(N_REPLICATES - 1))).alias(
            "replicate"
        ),
    )
    hashed = expanded.select(
        "replicate", "arm", "o_totalprice", F.expr(_H40_SPARK).alias("h")
    )
    weighted = hashed.select(
        "replicate", "arm", "o_totalprice", F.expr(_w_cases("h")).alias("w")
    )
    # r12 optimization (guide §5 caching): the a/b self-join referenced
    # per_arm twice — without a persist the ENTIRE expand+hash pipeline
    # (the expensive part) ran twice per query. per_arm is 2×N_REPLICATES
    # tiny rows; persist it so the md5 pass runs once. Caller clears via
    # clearCache.
    per_arm = (
        weighted.groupBy("replicate", "arm")
        .agg(
            F.sum("w").cast("bigint").alias("n"),
            (
                F.sum(F.col("o_totalprice").cast("decimal(18,2)") * F.col("w"))
                .cast("double")
                / F.sum("w")
            ).alias("mean_value"),
        )
        .persist()
    )
    a, b = per_arm.alias("a"), per_arm.alias("b")
    return (
        a.join(
            b,
            (F.col("a.replicate") == F.col("b.replicate"))
            & (F.col("a.arm") == 0)
            & (F.col("b.arm") == 1),
        )
        .select(
            F.col("a.replicate").cast("bigint").alias("replicate"),
            F.col("a.n").alias("n_a"),
            F.col("b.n").alias("n_b"),
            F.col("a.mean_value").alias("mean_a"),
            F.col("b.mean_value").alias("mean_b"),
            (F.col("b.mean_value") - F.col("a.mean_value")).alias("uplift"),
        )
        .orderBy("replicate")
    )
