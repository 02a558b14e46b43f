"""New-vs-returning revenue split — the monthly acquisition readout.

cohort_ltv_curves (operators/ltv.py) follows each cohort forward; the
board-slide question inverts the axes: "of THIS month's revenue, how
much came from first-time customers?". One row per calendar month:
exact-cents revenue split into new (the customer's first-order month
is this month) vs returning, plus customer counts and the new-revenue
share.

Determinism: the split is integer month arithmetic on the min() over
an exact per-customer-month frame; revenue rides DECIMAL(18,2) cents;
the share is one float division per row, round 6.

Scale: the same single corpus hash-agg onto (customer, month) that
ltv.py uses, a min() window per customer on the customers×months
frame, then a |months|-row re-agg. Nothing after the first shuffle is
corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_NVR_ORACLE = """
WITH om AS (
  SELECT o_custkey,
         CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS BIGINT)
           AS m,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
),
c AS (SELECT *, min(m) OVER (PARTITION BY o_custkey) AS first_m FROM om)
SELECT m,
       CAST(COALESCE(SUM(cents) FILTER (WHERE m = first_m), 0) AS BIGINT)
         AS new_cents,
       CAST(COALESCE(SUM(cents) FILTER (WHERE m > first_m), 0) AS BIGINT)
         AS returning_cents,
       CAST(COUNT(*) FILTER (WHERE m = first_m) AS BIGINT) AS new_customers,
       CAST(COUNT(*) FILTER (WHERE m > first_m) AS BIGINT)
         AS returning_customers,
       round(CAST(COALESCE(SUM(cents) FILTER (WHERE m = first_m), 0)
                  AS DOUBLE) / SUM(cents), 6) AS new_share_r
FROM c
GROUP BY 1
ORDER BY 1
"""


@register("new_vs_returning_revenue", oracle=_NVR_ORACLE)
def new_vs_returning_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per calendar month: exact-cents revenue and customer counts split
    by first-month (new) vs later (returning), with the new share."""
    o = load_table(spark, sf_dir, "orders")
    om = o.groupBy(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1)
        .cast("bigint")
        .alias("m"),
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    c = om.withColumn(
        "first_m", F.min("m").over(Window.partitionBy("o_custkey"))
    )
    is_new = F.col("m") == F.col("first_m")
    new_cents = F.coalesce(
        F.sum(F.when(is_new, F.col("cents"))), F.lit(0)
    ).cast("bigint")
    return (
        c.groupBy("m")
        .agg(
            new_cents.alias("new_cents"),
            F.coalesce(F.sum(F.when(~is_new, F.col("cents"))), F.lit(0))
            .cast("bigint")
            .alias("returning_cents"),
            F.count(F.when(is_new, 1)).cast("bigint").alias("new_customers"),
            F.count(F.when(~is_new, 1))
            .cast("bigint")
            .alias("returning_customers"),
            F.round(
                new_cents.cast("double") / F.sum("cents"), 6
            ).alias("new_share_r"),
        )
        .orderBy("m")
    )
