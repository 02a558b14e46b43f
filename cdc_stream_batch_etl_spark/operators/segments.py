"""Customer segmentation — the reference's flagship batch query.

Reproduces `extract_customer_data` + `transform_customer_segments`
(/root/reference/python/batch_processor.py:24-41, 108-145) on the FIXTURES.md
§3 table mapping (customers→customer, orders→orders):

  LEFT JOIN customers⟕orders (SURVEY §2.3 J1) → per-customer COUNT/SUM/MAX
  (A1-A4) → exact p80/p60 percentile thresholds (A9) → Gold/Silver/Bronze +
  recency label chains (C1-C4) → CLV (C2) → days-since with NaT→999 (C3).

Spark-first notes:
- thresholds are a 1-row global aggregate broadcast-crossJoined back into the
  labeling pass (SURVEY §2.8: two-pass, not a window function) — at 100 TB
  this is one tiny second shuffle stage, not a sort of the whole table;
- `percentile` (exact, linear interpolation) — NOT percentile_approx — to
  hash-match pandas `.quantile`/DuckDB `quantile_cont`;
- money sums are exact decimal then cast to double (functions/money.py), so
  the parallel sum is order-independent and oracle-identical;
- join strategy: customer×orders is a plain equi-join; at test scale Catalyst
  broadcasts, at 100 TB AQE picks sort-merge with skew handling. The
  groupBy reuses the join keys' partitioning when AQE coalesces.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..config import FROZEN_NOW_DATE
from ..functions.labels import customer_segment, recency_status
from ..functions.money import dsum
from ..registry import register

_ORACLE = f"""
WITH base AS (
  SELECT c.c_custkey,
         c.c_name,
         c.c_mktsegment,
         count(o.o_orderkey) AS total_orders,
         CAST(coalesce(sum(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_spent,
         max(o.o_orderdate) AS last_order_date
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2, 3
), th AS (
  SELECT quantile_cont(total_spent, 0.8) AS p80_spent,
         quantile_cont(total_spent, 0.6) AS p60_spent,
         quantile_cont(CAST(total_orders AS DOUBLE), 0.8) AS p80_orders
  FROM base
)
SELECT b.c_custkey,
       b.c_name,
       b.c_mktsegment,
       b.total_orders,
       b.total_spent,
       b.last_order_date,
       CASE WHEN b.total_spent >= th.p80_spent AND b.total_orders >= th.p80_orders THEN 'Gold'
            WHEN b.total_spent >= th.p60_spent OR b.total_orders >= th.p80_orders THEN 'Silver'
            ELSE 'Bronze' END AS customer_segment,
       b.total_spent * 2 AS estimated_clv,
       CAST(coalesce(datediff('day', CAST(b.last_order_date AS DATE), DATE '{FROZEN_NOW_DATE}'), 999) AS BIGINT)
         AS days_since_last_order,
       CASE WHEN coalesce(datediff('day', CAST(b.last_order_date AS DATE), DATE '{FROZEN_NOW_DATE}'), 999) <= 7
              THEN 'Very Active'
            WHEN coalesce(datediff('day', CAST(b.last_order_date AS DATE), DATE '{FROZEN_NOW_DATE}'), 999) <= 30
              THEN 'Active'
            ELSE 'Inactive' END AS recency_status
FROM base b CROSS JOIN th
"""


@register("customer_segments", oracle=_ORACLE)
def customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")

    base = (
        customer.alias("c")
        .join(orders.alias("o"), F.col("c.c_custkey") == F.col("o.o_custkey"), "left")
        .groupBy("c.c_custkey", "c.c_name", "c.c_mktsegment")
        .agg(
            F.count("o.o_orderkey").alias("total_orders"),
            dsum("o.o_totalprice", coalesce_zero=True).alias("total_spent"),
            F.max("o.o_orderdate").alias("last_order_date"),
        )
        # #customers rows, narrow; referenced by the threshold pass and
        # the labeling pass — persist so the orders join+agg runs once
        .persist()
    )

    thresholds = base.agg(
        F.percentile("total_spent", F.lit(0.8)).alias("p80_spent"),
        F.percentile("total_spent", F.lit(0.6)).alias("p60_spent"),
        F.percentile(F.col("total_orders").cast("double"), F.lit(0.8)).alias("p80_orders"),
    )

    days_since = F.coalesce(
        F.datediff(F.lit(FROZEN_NOW_DATE).cast("date"), F.to_date("last_order_date")),
        F.lit(999),
    ).cast("bigint")

    return (
        base.crossJoin(F.broadcast(thresholds))
        .withColumn(
            "customer_segment",
            customer_segment(
                F.col("total_spent"),
                F.col("total_orders"),
                F.col("p80_spent"),
                F.col("p60_spent"),
                F.col("p80_orders"),
            ),
        )
        .withColumn("estimated_clv", F.col("total_spent") * 2)
        .withColumn("days_since_last_order", days_since)
        .withColumn("recency_status", recency_status(F.col("days_since_last_order")))
        .select(
            "c_custkey",
            "c_name",
            "c_mktsegment",
            "total_orders",
            "total_spent",
            "last_order_date",
            "customer_segment",
            "estimated_clv",
            "days_since_last_order",
            "recency_status",
        )
    )
