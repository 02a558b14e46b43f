"""Cohort LTV curves — cumulative revenue per acquisition cohort.

retention_cohorts (operators/sessions.py family) counts who comes
back; the revenue question — "how much has the March cohort spent by
age k months, per member?" — is the lifetime-value curve that pricing
and payback models consume. Cohort = month of the customer's FIRST
order; age = months between cohort and order month; the curve is the
running cumulative revenue per cohort over age, divided by cohort
size.

Determinism: revenue rides DECIMAL(18,2) cents end-to-end (exact,
order-independent sums); cohort sizes are exact integers. The single
float division per output row happens after rounding the cumulative
cents — fixed expression shape, round 6. Month arithmetic uses
calendar month indexes (year*12+month), exact integers in both
engines.

Scale: one corpus hash-agg to (customer, month) cents [the only
corpus-sized shuffle], a min() window per customer for the cohort
month (runs on the customer×months frame), then a (cohort, age)
hash-agg and a cumulative window over the cohort-sized curve frame
(|cohorts| × |ages| rows — calendar², invariant to corpus size).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_LTV_ORACLE = """
WITH om AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS m,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
),
c AS (
  SELECT *, min(m) OVER (PARTITION BY o_custkey) AS cohort_m FROM om
),
sizes AS (
  SELECT cohort_m, CAST(count(DISTINCT o_custkey) AS BIGINT) AS cohort_n
  FROM c GROUP BY 1
),
curve AS (
  SELECT cohort_m, CAST(m - cohort_m AS BIGINT) AS age_m,
         CAST(SUM(cents) AS BIGINT) AS cents
  FROM c GROUP BY 1, 2
),
cum AS (
  SELECT cohort_m, age_m,
         SUM(cents) OVER (PARTITION BY cohort_m ORDER BY age_m
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
  FROM curve
)
SELECT cu.cohort_m, cu.age_m,
       CAST(cu.cum_cents AS BIGINT) AS cum_cents,
       s.cohort_n,
       round(CAST(cu.cum_cents AS DOUBLE) / (100 * s.cohort_n), 6)
         AS ltv_per_member_r
FROM cum cu JOIN sizes s USING (cohort_m)
ORDER BY cu.cohort_m, cu.age_m
"""


@register("cohort_ltv_curves", oracle=_LTV_ORACLE)
def cohort_ltv_curves(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (first-order-month cohort, age in months): cumulative exact
    cents and per-member LTV."""
    o = load_table(spark, sf_dir, "orders")
    om = o.groupBy(
        F.col("o_custkey"),
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("m"),
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    c = om.withColumn(
        "cohort_m", F.min("m").over(Window.partitionBy("o_custkey"))
    )
    sizes = c.groupBy("cohort_m").agg(
        F.countDistinct("o_custkey").cast("bigint").alias("cohort_n")
    )
    curve = c.groupBy(
        "cohort_m", (F.col("m") - F.col("cohort_m")).cast("bigint").alias("age_m")
    ).agg(F.sum("cents").cast("bigint").alias("cents"))
    cum = curve.withColumn(
        "cum_cents",
        F.sum("cents").over(
            Window.partitionBy("cohort_m")
            .orderBy("age_m")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        cum.join(sizes, "cohort_m")
        .select(
            "cohort_m",
            "age_m",
            F.col("cum_cents").cast("bigint").alias("cum_cents"),
            "cohort_n",
            F.round(
                F.col("cum_cents").cast("double")
                / (100 * F.col("cohort_n")),
                6,
            ).alias("ltv_per_member_r"),
        )
        .orderBy("cohort_m", "age_m")
    )
