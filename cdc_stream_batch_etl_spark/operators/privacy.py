"""K-anonymity audit — the privacy gate a training-data release runs.

Before customer-derived data leaves a pipeline, governance asks: does
any quasi-identifier combination isolate fewer than K individuals? This
operator reports, per (nation, market-segment) quasi-identifier group,
the group size and whether it satisfies K-anonymity — plus the release
decision inputs: how many groups and how many ROWS are at risk. The
same shape audits any release candidate (swap the grouping columns);
Sweeney's k-anonymity is the floor every tabular-release checklist
starts from.

Plan: one hash-agg on the quasi-identifier tuple (map-side partials;
the tuple's cardinality is bounded by the attribute domain product, so
the agg output is small no matter the corpus), then a 1-row broadcast
of the at-risk totals back onto the groups — the exact-percentile
broadcast idiom (segments.py:92-104). Zero windows, zero sorts.

Beyond-reference (the reference ships raw customer rows to Redis with
no governance layer — SURVEY §1.3)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

K_ANON = 5

_K_ANON_ORACLE = f"""
WITH g AS (
  SELECT c_nationkey, c_mktsegment, CAST(count(*) AS BIGINT) AS group_size
  FROM customer
  GROUP BY 1, 2
), tot AS (
  SELECT CAST(count(*) AS BIGINT) AS n_groups_at_risk,
         CAST(coalesce(sum(CASE WHEN group_size < {K_ANON} THEN group_size END), 0) AS BIGINT)
           AS n_rows_at_risk
  FROM g WHERE group_size < {K_ANON}
)
SELECT g.c_nationkey, g.c_mktsegment, g.group_size,
       g.group_size >= {K_ANON} AS k_anonymous,
       t.n_groups_at_risk, t.n_rows_at_risk
FROM g CROSS JOIN tot t
"""


@register("k_anonymity_report", oracle=_K_ANON_ORACLE)
def k_anonymity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per quasi-identifier group (nation × market segment): size, the
    K={K} verdict, and the corpus-wide at-risk totals on every row."""
    c = load_table(spark, sf_dir, "customer")
    groups = c.groupBy("c_nationkey", "c_mktsegment").agg(
        F.count("*").alias("group_size")
    )
    at_risk = groups.filter(F.col("group_size") < K_ANON).agg(
        F.count("*").alias("n_groups_at_risk"),
        F.coalesce(F.sum("group_size"), F.lit(0)).cast("bigint").alias("n_rows_at_risk"),
    )
    return (
        groups.crossJoin(F.broadcast(at_risk))
        .withColumn("k_anonymous", F.col("group_size") >= K_ANON)
        .select(
            "c_nationkey",
            "c_mktsegment",
            "group_size",
            "k_anonymous",
            "n_groups_at_risk",
            "n_rows_at_risk",
        )
    )
