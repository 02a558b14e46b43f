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


L_DIV = 3
#: sensitive attribute: account-balance band. Banding runs on exact
#: integer CENTS with a +200000 shift so both engines' integer division
#: (Spark `div` truncates toward zero, DuckDB `//` floors) agree — the
#: shift makes every operand positive, where the two rules coincide.
_BAND_SPARK = "(cast(round(c_acctbal * 100) as bigint) + 200000) div 200000"
_BAND_SQL = "(CAST(round(c_acctbal * 100) AS BIGINT) + 200000) // 200000"

_L_DIV_ORACLE = f"""
WITH cells AS (
  SELECT c_nationkey, c_mktsegment,
         {_BAND_SQL} AS balance_band,
         CAST(count(*) AS BIGINT) AS n
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT c_nationkey, c_mktsegment,
       CAST(sum(n) AS BIGINT) AS group_size,
       CAST(count(*) AS BIGINT) AS distinct_sensitive,
       CAST(max(n) AS BIGINT) AS max_sensitive_count,
       count(*) >= {L_DIV} AS l_diverse
FROM cells
GROUP BY 1, 2
ORDER BY c_nationkey, c_mktsegment
"""


@register("l_diversity_report", oracle=_L_DIV_ORACLE)
def l_diversity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct l-diversity audit (Machanavajjhala et al., ICDE 2006 —
    the rung above k_anonymity_report): a group can be k-anonymous yet
    leak its sensitive attribute if every member shares one value.
    Per quasi-identifier group (nation × market segment): size, the
    number of distinct sensitive balance-band values, the largest
    single band's count (the recursive-(c,l) input), and the
    l >= {L} verdict.

    Plan: two stacked hash-aggs — (qi, band) cells, then qi groups —
    both map-side-partial; cell cardinality is bounded by the attribute
    domain product, so the shuffles carry summaries, never rows. Zero
    windows, zero joins.
    """
    c = load_table(spark, sf_dir, "customer")
    cells = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.expr(_BAND_SPARK).alias("balance_band"),
    ).agg(F.count("*").alias("n"))
    return (
        cells.groupBy("c_nationkey", "c_mktsegment")
        .agg(
            F.sum("n").cast("bigint").alias("group_size"),
            F.count("*").cast("bigint").alias("distinct_sensitive"),
            F.max("n").cast("bigint").alias("max_sensitive_count"),
            (F.count("*") >= L_DIV).alias("l_diverse"),
        )
        .orderBy("c_nationkey", "c_mktsegment")
    )
