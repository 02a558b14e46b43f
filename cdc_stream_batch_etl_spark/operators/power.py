"""A/B sample-size planner — required users per arm to detect a
relative lift in each event type's reach at alpha=0.05 (two-sided),
power=0.80 (beyond-reference, SURVEY §2.11 experimentation family next
to ab_test_zscores: the z-test SCORES a finished experiment; this
operator PLANS one — the standard two-proportion formula
    n = (z_{a/2}·sqrt(2·p̄(1−p̄)) + z_β·sqrt(p1·q1 + p2·q2))² / (p1−p2)²
(Fleiss, "Statistical Methods for Rates and Proportions" §2.5) applied
to the measured baseline, over a fixed minimum-detectable-effect grid).

Semantics: baseline p1 per event_type is its user REACH — distinct
users with ≥1 such event over distinct users overall (the same reach
notion as customer_reach). The MDE grid is relative: +5 %, +10 %,
+20 % lifts, p2 = min(p1·(1+mde), 1). n_per_arm = ceil(formula); rows
where the lift cannot move the rate (p2 = p1, i.e. p1 = 1) export NULL.

Determinism: z constants are literals (z_{0.025} = 1.959963984540054 —
the wilson.py literal — and z_{0.20} = 0.8416212335729143); the formula
is +,·,/,sqrt,ceil only — every step IEEE-correctly-rounded, identical
expression shape in both legs, no pow/ln (the repo's cross-engine
exactness rule). Squares are written x·x.

Scale: one events scan → distinct (event_type, user_id) pairs (hash
agg with map-side partials — the pair frame is |types|·|users| at
worst, users not events); per-type counts AND the global distinct-user
count both derive from that persisted pair frame (no second scan); the
MDE grid is a 3-element inline explode; final frame is |types|×3 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: Two-sided alpha = 0.05 (same literal as wilson.py) and power = 0.80.
Z_ALPHA = 1.959963984540054
Z_BETA = 0.8416212335729143

#: Relative minimum detectable effects, percent.
MDE_PCTS = (5, 10, 20)

_POWER_ORACLE = f"""
WITH pairs AS (
  SELECT DISTINCT event_type, user_id FROM events
),
per_type AS (
  SELECT event_type, count(*) AS n_users FROM pairs GROUP BY 1
),
tot AS (SELECT count(DISTINCT user_id) AS u FROM pairs),
grid AS (
  SELECT per_type.event_type, per_type.n_users, tot.u,
         CAST(m AS BIGINT) AS mde_pct,
         CAST(n_users AS DOUBLE) / CAST(u AS DOUBLE) AS p1,
         least(CAST(n_users AS DOUBLE) / CAST(u AS DOUBLE)
               * (1.0 + CAST(m AS DOUBLE) / 100.0), 1.0) AS p2
  FROM per_type CROSS JOIN tot
  CROSS JOIN unnest([{", ".join(str(m) for m in MDE_PCTS)}]) AS t(m)
),
scored AS (
  SELECT event_type, mde_pct, n_users, p1, p2,
         {Z_ALPHA} * sqrt(2.0 * ((p1 + p2) / 2.0) * (1.0 - (p1 + p2) / 2.0))
         + {Z_BETA} * sqrt(p1 * (1.0 - p1) + p2 * (1.0 - p2)) AS s
  FROM grid
)
SELECT event_type, mde_pct, n_users AS baseline_users, p1, p2,
       CASE WHEN p2 > p1
            THEN CAST(ceil(s * s / ((p2 - p1) * (p2 - p1))) AS BIGINT)
            ELSE NULL END AS n_per_arm
FROM scored
ORDER BY event_type, mde_pct
"""


@register("ab_power_planner", oracle=_POWER_ORACLE)
def ab_power_planner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, mde_pct, baseline_users, p1, p2, n_per_arm) —
    two-proportion sample size per arm over the relative-MDE grid."""
    ev = load_table(spark, sf_dir, "events")
    pairs = ev.select("event_type", "user_id").distinct().persist()
    per_type = pairs.groupBy("event_type").agg(F.count("*").alias("n_users"))
    tot = pairs.agg(F.countDistinct("user_id").alias("u"))
    mde = F.explode(
        F.array(*[F.lit(m).cast("bigint") for m in MDE_PCTS])
    ).alias("mde_pct")
    p1 = F.col("n_users").cast("double") / F.col("u").cast("double")
    grid = (
        per_type.join(F.broadcast(tot))
        .select("event_type", "n_users", "u", mde)
        .select(
            "event_type",
            "mde_pct",
            "n_users",
            p1.alias("p1"),
            F.least(
                p1 * (1.0 + F.col("mde_pct").cast("double") / 100.0), F.lit(1.0)
            ).alias("p2"),
        )
    )
    pbar = (F.col("p1") + F.col("p2")) / 2.0
    s = F.lit(Z_ALPHA) * F.sqrt(2.0 * pbar * (1.0 - pbar)) + F.lit(Z_BETA) * F.sqrt(
        F.col("p1") * (1.0 - F.col("p1")) + F.col("p2") * (1.0 - F.col("p2"))
    )
    return (
        grid.select(
            "event_type",
            "mde_pct",
            F.col("n_users").alias("baseline_users"),
            "p1",
            "p2",
            F.when(
                F.col("p2") > F.col("p1"),
                F.ceil(
                    s * s / ((F.col("p2") - F.col("p1")) * (F.col("p2") - F.col("p1")))
                ).cast("bigint"),
            ).alias("n_per_arm"),
        )
        .orderBy("event_type", "mde_pct")
    )
