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

Scale notes: part⟕lineitem is the fact-side join — at 100 TB Catalyst/AQE
runs it sort-merge partitioned on partkey with skew split; the second join
to orders is on l_orderkey (a different key → one reshuffle, unavoidable in
the reference semantics too since DISTINCT o.id must be exact). The
threshold pass is a 1-row broadcast, not a global sort.
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

    base = (
        part.alias("p")
        .join(lineitem.alias("l"), F.col("p.p_partkey") == F.col("l.l_partkey"), "left")
        .join(orders.alias("o"), F.col("l.l_orderkey") == F.col("o.o_orderkey"), "left")
        .groupBy("p.p_partkey", "p.p_name", "p.p_brand", "p.p_type", "p.p_size")
        .agg(
            dsum("l.l_quantity", coalesce_zero=True).alias("total_sold"),
            dsum("l.l_extendedprice", coalesce_zero=True).alias("total_revenue"),
            F.countDistinct("o.o_orderkey").alias("unique_orders"),
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
