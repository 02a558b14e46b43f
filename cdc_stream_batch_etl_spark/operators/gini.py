"""Spend inequality — exact Gini coefficient per customer segment.

"How concentrated is revenue across customers?" is the inequality
twin of hhi.py's supplier concentration. The Gini coefficient's
sorted-rank formula

    G = (2 · Σ i·x_i) / (n · Σ x_i) − (n + 1) / n

(i = 1-based rank of the i-th smallest spend) is exactly computable:
ranks come from row_number over the TOTAL order (spend_cents,
o_custkey — unique key breaks ties deterministically), and both
Σ i·x_i and Σ x_i accumulate as DECIMAL(38,0) integers (rank ×
cents can exceed int64 at corpus scale — the autocorr.py lesson).
The only floats are two divisions per output row, round 6.

Output grain: one row per order-priority band of the customer's
FIRST order (a stable, data-derived segmentation) plus rank counts —
so the operator demonstrates GROUPED inequality, not one global
number.

Scale: one hash-agg onto customers plus one row_number window on
orders for the first-order priority (same custkey shuffle), then
per-group rank windows on the |customers| frame and a
single-row-per-group agg. Rank windows sort within groups — the
price_deciles global-ranking note applies per group.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_GINI_ORACLE = """
WITH spend AS (
  SELECT o_custkey,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS spend_cents
  FROM orders GROUP BY 1
),
fp AS (
  SELECT o_custkey, o_orderpriority AS first_priority
  FROM (
    SELECT o_custkey, o_orderpriority,
           row_number() OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey) AS rn
    FROM orders
  )
  WHERE rn = 1
),
cust AS (
  SELECT s.o_custkey, f.first_priority, s.spend_cents
  FROM spend s JOIN fp f USING (o_custkey)
),
ranked AS (
  SELECT first_priority, spend_cents,
         row_number() OVER (PARTITION BY first_priority
                            ORDER BY spend_cents, o_custkey) AS i
  FROM cust
)
SELECT first_priority,
       CAST(count(*) AS BIGINT) AS n_customers,
       CAST(SUM(spend_cents) AS BIGINT) AS spend_total_cents,
       round(2.0e0 * CAST(SUM(CAST(i AS HUGEINT) * spend_cents) AS DOUBLE)
               / (count(*) * CAST(SUM(spend_cents) AS DOUBLE))
             - CAST(count(*) + 1 AS DOUBLE) / count(*), 6) AS gini_r
FROM ranked
GROUP BY 1
ORDER BY 1
"""


@register("spend_gini", oracle=_GINI_ORACLE)
def spend_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of customer lifetime spend, grouped by
    the priority band of each customer's first order."""
    o = load_table(spark, sf_dir, "orders")
    spend = o.groupBy("o_custkey").agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("spend_cents"),
    )
    # first-order priority via row_number (min_by over a struct key is
    # not portable to the DuckDB oracle)
    fp = (
        o.select(
            "o_custkey",
            "o_orderpriority",
            F.row_number()
            .over(
                Window.partitionBy("o_custkey").orderBy(
                    "o_orderdate", "o_orderkey"
                )
            )
            .alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .select("o_custkey", F.col("o_orderpriority").alias("first_priority"))
    )
    cust = spend.join(fp, "o_custkey")
    ranked = cust.select(
        "first_priority",
        "spend_cents",
        F.row_number()
        .over(
            Window.partitionBy("first_priority").orderBy(
                "spend_cents", "o_custkey"
            )
        )
        .alias("i"),
    )
    i_dec = F.col("i").cast("decimal(38,0)")
    c_dec = F.col("spend_cents").cast("decimal(38,0)")
    n = F.count("*")
    return (
        ranked.groupBy("first_priority")
        .agg(
            n.cast("bigint").alias("n_customers"),
            F.sum("spend_cents").cast("bigint").alias("spend_total_cents"),
            F.round(
                F.lit(2.0)
                * F.sum(i_dec * c_dec).cast("double")
                / (n * F.sum("spend_cents").cast("double"))
                - (n + 1).cast("double") / n,
                6,
            ).alias("gini_r"),
        )
        .orderBy("first_priority")
    )
