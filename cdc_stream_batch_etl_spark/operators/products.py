"""Product performance insights.

Reproduces `extract_product_data` + `transform_product_insights`
(/root/reference/python/batch_processor.py:54-71, 147-176) on the FIXTURES
§3 mapping (products→part, order_items→lineitem, orders→orders,
stock_quantity→p_size, qty*unit_price→l_extendedprice):

  two-level LEFT JOIN part⟕lineitem⟕orders (SURVEY §2.3 J2/J3) →
  SUM qty / SUM revenue / COUNT DISTINCT orders (A5-A7) → safe-divide
  ratios with the replace-0-with-1 quirk (C5) → p80 thresholds (A9) →
  Star/Fast Moving/High Revenue/Low Performer overwrite-order label (C6) →
  stock status label (C7) → ORDER BY revenue DESC (O2).

Scale notes — the plan is deliberately NOT the literal two-left-join of
the reference SQL. Observed semantics are identical (oracle-checked
against the literal SQL) but the physical shape is chosen for 100 TB:

1. aggregate the fact side FIRST: lineitem ⋈ orders (one shuffle on
   orderkey; the join only establishes order existence for the exact
   DISTINCT) → groupBy(l_partkey) partial+final agg (one shuffle on a
   single long key, map-side combine effective);
2. THEN left-join the small part dimension to the aggregate (broadcast —
   no shuffle of the fact table on partkey at all, and the wide p_name/
   p_type strings never travel through a shuffle).

The literal plan (part⟕lineitem⟕orders then groupBy 5 mixed-type columns
incl. countDistinct) shuffles the fact table twice more and carries
dimension strings through every exchange — ~4x slower at bench scale.
Equivalence argument: o_orderkey is unique (PK), so the left join never
duplicates lineitem rows, and SUM over l columns ignores the join; parts
with no lineitems get coalesce(0) exactly as COALESCE in the SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..config import DEFAULT_CONFIG
from ..functions.labels import performance_category, stock_status
from ..functions.money import dsum
from ..registry import register

_LOW = DEFAULT_CONFIG.thresholds.low_stock
_OVER = DEFAULT_CONFIG.thresholds.overstock

_ORACLE = f"""
WITH base AS (
  SELECT p.p_partkey,
         p.p_name,
         p.p_brand,
         p.p_type,
         p.p_size,
         CAST(coalesce(sum(CAST(l.l_quantity AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_sold,
         CAST(coalesce(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_revenue,
         count(DISTINCT o.o_orderkey) AS unique_orders
  FROM part p
  LEFT JOIN lineitem l ON p.p_partkey = l.l_partkey
  LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2, 3, 4, 5
), derived AS (
  SELECT *,
         total_revenue / (CASE WHEN total_sold = 0 THEN 1 ELSE total_sold END) AS revenue_per_unit,
         total_sold / CAST(CASE WHEN p_size = 0 THEN 1 ELSE p_size END AS DOUBLE) AS turnover_rate
  FROM base
), th AS (
  SELECT quantile_cont(total_revenue, 0.8) AS p80_revenue,
         quantile_cont(turnover_rate, 0.8) AS p80_turnover
  FROM derived
)
SELECT d.p_partkey, d.p_name, d.p_brand, d.p_type, d.p_size,
       d.total_sold, d.total_revenue, d.unique_orders,
       d.revenue_per_unit, d.turnover_rate,
       CASE WHEN d.total_revenue >= th.p80_revenue AND d.turnover_rate >= th.p80_turnover THEN 'Star'
            WHEN d.turnover_rate >= th.p80_turnover THEN 'Fast Moving'
            WHEN d.total_revenue >= th.p80_revenue THEN 'High Revenue'
            ELSE 'Low Performer' END AS performance_category,
       CASE WHEN d.p_size >= {_OVER} THEN 'Overstock'
            WHEN d.p_size <= 0 THEN 'Out of Stock'
            WHEN d.p_size <= {_LOW} THEN 'Low Stock'
            ELSE 'Normal' END AS stock_status
FROM derived d CROSS JOIN th
"""


@register("product_insights", oracle=_ORACLE)
def product_insights(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    per_part = (
        lineitem.alias("l")
        .join(orders.alias("o"), F.col("l.l_orderkey") == F.col("o.o_orderkey"), "left")
        .groupBy(F.col("l.l_partkey").alias("l_partkey"))
        .agg(
            dsum("l.l_quantity").alias("agg_sold"),
            dsum("l.l_extendedprice").alias("agg_revenue"),
            F.countDistinct("o.o_orderkey").alias("agg_unique_orders"),
        )
        # #parts rows × 4 narrow columns; the two-pass (thresholds then
        # labels) references it twice — persisting THIS (and not the wide
        # post-dimension-join frame, which measured slower) makes the
        # lineitem⋈orders aggregation run once
        .persist()
    )
    # dimension⟕aggregate: both sides are #parts-sized — AQE broadcasts
    # the smaller at bench scale and falls back to sort-merge when the
    # part dimension itself is huge (no hint hardcoded on purpose)
    base = (
        part.join(per_part, F.col("p_partkey") == F.col("l_partkey"), "left")
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            "p_type",
            "p_size",
            F.coalesce(F.col("agg_sold"), F.lit(0.0)).alias("total_sold"),
            F.coalesce(F.col("agg_revenue"), F.lit(0.0)).alias("total_revenue"),
            F.coalesce(F.col("agg_unique_orders"), F.lit(0)).cast("bigint").alias("unique_orders"),
        )
    )

    derived = base.withColumn(
        "revenue_per_unit",
        F.col("total_revenue")
        / F.when(F.col("total_sold") == 0, F.lit(1.0)).otherwise(F.col("total_sold")),
    ).withColumn(
        "turnover_rate",
        F.col("total_sold")
        / F.when(F.col("p_size") == 0, F.lit(1)).otherwise(F.col("p_size")).cast("double"),
    )

    thresholds = derived.agg(
        F.percentile("total_revenue", F.lit(0.8)).alias("p80_revenue"),
        F.percentile("turnover_rate", F.lit(0.8)).alias("p80_turnover"),
    )

    return (
        derived.crossJoin(F.broadcast(thresholds))
        .withColumn(
            "performance_category",
            performance_category(
                F.col("total_revenue"),
                F.col("turnover_rate"),
                F.col("p80_revenue"),
                F.col("p80_turnover"),
            ),
        )
        .withColumn("stock_status", stock_status(F.col("p_size"), low=_LOW, overstock=_OVER))
        .select(
            "p_partkey", "p_name", "p_brand", "p_type", "p_size",
            "total_sold", "total_revenue", "unique_orders",
            "revenue_per_unit", "turnover_rate",
            "performance_category", "stock_status",
        )
        .orderBy(F.desc("total_revenue"))
    )
