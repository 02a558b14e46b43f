"""Two-proportion A/B z-test — experiment readout per event type.

The statistical-QA family (benford, chi-square, drift) screens one
distribution; an experimentation pipeline needs the two-sample
readout: split users into arms, compare each event type's per-user
conversion rate, report effect size and the z statistic. Arms here are
the deterministic hash parity of user_id (a stand-in for a real
assignment column — the query shape is identical), "converted" means
the user fired the event type at least once.

    p̂ = (c_a + c_b) / (n_a + n_b)             (pooled)
    z  = (p_a − p_b) / sqrt(p̂(1−p̂)(1/n_a + 1/n_b))

Determinism: conversion counts are exact integers from a distinct
(type, user) collapse; arm sizes are global integer counts. The float
part is one fixed-shape expression per row (no accumulation), round 6.
The md5-parity arm assignment is identical in both engines
(dedup.hash64 % 2).

Scale: two scans of events — one distinct-count collapse per grain
(per-type converted users; global arm sizes). Both are single
hash-aggs with map-side partials; fusing them would require persisting
the types×users distinct frame, which at 100 TB is a multi-billion-row
cache for the privilege of one saved scan — the re-scan is cheaper.
Arm totals are a 1-row broadcast into the |types|-row result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..dedup import hash64_expr, hash64_sql
from ..registry import register

_ARM_SPARK = f"cast({hash64_expr('cast(user_id as string)')} % 2 as int)"
_ARM_SQL = f"CAST({hash64_sql('CAST(user_id AS VARCHAR)')} % 2 AS INT)"

_AB_ORACLE = f"""
WITH ua AS (
  SELECT DISTINCT user_id, {_ARM_SQL} AS arm FROM events
),
arms AS (
  SELECT CAST(count(*) FILTER (WHERE arm = 0) AS BIGINT) AS n_a,
         CAST(count(*) FILTER (WHERE arm = 1) AS BIGINT) AS n_b
  FROM ua
),
conv AS (
  SELECT event_type,
         CAST(count(DISTINCT CASE WHEN {_ARM_SQL} = 0 THEN user_id END)
           AS BIGINT) AS c_a,
         CAST(count(DISTINCT CASE WHEN {_ARM_SQL} = 1 THEN user_id END)
           AS BIGINT) AS c_b
  FROM events GROUP BY 1
)
SELECT event_type, c_a, c_b, n_a, n_b,
       round(CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b, 6)
         AS lift_r,
       round(CASE WHEN c_a + c_b = 0 OR c_a + c_b = n_a + n_b THEN NULL
             ELSE (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
             / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                    * (1.0e0 / n_a + 1.0e0 / n_b)) END, 6) AS z_r
FROM conv CROSS JOIN arms
ORDER BY event_type
"""


@register("ab_test_zscores", oracle=_AB_ORACLE)
def ab_test_zscores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per event type: converted users per hash-parity arm, lift and
    two-proportion z statistic."""
    return ab_from_events(load_table(spark, sf_dir, "events"))


def ab_from_events(ev: DataFrame) -> DataFrame:
    """Core readout over any (event_type, user_id) frame — split out so
    tests can plant arms with unequal conversion (at tiny SF every user
    fires every type, so z degenerates to NULL by design)."""
    arm = F.expr(_ARM_SPARK)
    ua = ev.select("user_id", arm.alias("arm")).distinct()
    arms = ua.agg(
        F.count(F.when(F.col("arm") == 0, 1)).cast("bigint").alias("n_a"),
        F.count(F.when(F.col("arm") == 1, 1)).cast("bigint").alias("n_b"),
    )
    conv = ev.groupBy("event_type").agg(
        F.countDistinct(F.when(arm == 0, F.col("user_id")))
        .cast("bigint")
        .alias("c_a"),
        F.countDistinct(F.when(arm == 1, F.col("user_id")))
        .cast("bigint")
        .alias("c_b"),
    )
    p_a = F.col("c_a").cast("double") / F.col("n_a")
    p_b = F.col("c_b").cast("double") / F.col("n_b")
    pooled = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pooled * (1 - pooled)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return (
        conv.crossJoin(F.broadcast(arms))
        .select(
            "event_type",
            "c_a",
            "c_b",
            "n_a",
            "n_b",
            F.round(p_a - p_b, 6).alias("lift_r"),
            # degenerate arms (0% or 100% pooled conversion) have zero
            # variance: z undefined → NULL, never a divide-by-zero
            F.round(
                F.when(
                    (F.col("c_a") + F.col("c_b") == 0)
                    | (
                        F.col("c_a") + F.col("c_b")
                        == F.col("n_a") + F.col("n_b")
                    ),
                    F.lit(None).cast("double"),
                ).otherwise((p_a - p_b) / se),
                6,
            ).alias("z_r"),
        )
        .orderBy("event_type")
    )
