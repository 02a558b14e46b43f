"""Order analytics: daily multi-aggregate, rollups, revenue analytics,
and the TPC-H Q1-shaped pricing summary used as a bench headline.

Reference semantics:
- `extract_order_analytics` (/root/reference/python/batch_processor.py:84-97):
  GROUP BY DATE(order_date), status → COUNT/SUM/AVG/MIN/MAX (SURVEY §2.4 A8,
  §2.5 C8, §2.6 O3).
- `generate_batch_summary` (batch_processor.py:195-234): frequency tables
  (A10), scalar summaries (A11), and the re-aggregation-of-aggregates quirk —
  `groupby('status')['order_count'].sum()` + mean-of-means (A12).
- `calculate_revenue_analytics` (airflow/dags/airflow_etl_utils.py:279-290):
  totals over a trailing time window with the max(count,1) zero-guard (A14,
  F2 time-range predicate).

Scale notes: all are single-shuffle hash aggregations (partial+final); the
rollup re-aggregates the *already aggregated* daily table (tiny), exactly as
the reference re-groups its extract — not a second scan of the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..config import BATCH_WINDOW_DAYS, FROZEN_NOW_DATE
from ..functions.money import davg, dsum
from ..registry import register

_DAILY_ORACLE = """
SELECT CAST(o_orderdate AS DATE) AS order_date,
       o_orderstatus AS status,
       count(*) AS order_count,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / count(o_totalprice) AS avg_order_value,
       min(o_totalprice) AS min_order_value,
       max(o_totalprice) AS max_order_value
FROM orders
GROUP BY 1, 2
"""


@register("order_analytics", oracle=_DAILY_ORACLE)
def order_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.to_date("o_orderdate").alias("order_date"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(
            F.count("*").alias("order_count"),
            dsum("o_totalprice").alias("total_revenue"),
            davg("o_totalprice").alias("avg_order_value"),
            F.min("o_totalprice").alias("min_order_value"),
            F.max("o_totalprice").alias("max_order_value"),
        )
        .orderBy(F.desc("order_date"), F.asc("status"))
    )


_ROLLUP_ORACLE = f"""
WITH daily AS ({_DAILY_ORACLE})
SELECT status,
       CAST(sum(order_count) AS BIGINT) AS total_orders,
       CAST(sum(CAST(total_revenue AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
       CAST(sum(CAST(avg_order_value AS DECIMAL(18,6))) AS DOUBLE) / count(avg_order_value)
         AS mean_daily_avg_order_value
FROM daily
GROUP BY 1
"""


@register("order_status_rollup", oracle=_ROLLUP_ORACLE)
def order_status_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregation of aggregates incl. the mean-of-means quirk (A12,
    reference batch_processor.py:229-231). The daily averages are rounded
    through DECIMAL(18,6) before the second mean so the parallel sum stays
    order-independent."""
    daily = order_analytics(spark, sf_dir)
    return daily.groupBy("status").agg(
        F.sum("order_count").cast("bigint").alias("total_orders"),
        F.sum(F.col("total_revenue").cast("decimal(18,2)")).cast("double").alias("total_revenue"),
        (
            F.sum(F.col("avg_order_value").cast("decimal(18,6)")).cast("double")
            / F.count("avg_order_value")
        ).alias("mean_daily_avg_order_value"),
    )


_REVENUE_ORACLE = f"""
SELECT CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_revenue,
       count(*) AS order_count,
       CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DOUBLE)
         / greatest(count(*), 1) AS avg_order_value
FROM orders
WHERE o_orderdate >= DATE '{FROZEN_NOW_DATE}' - INTERVAL {BATCH_WINDOW_DAYS} DAY
  AND o_orderdate <= DATE '{FROZEN_NOW_DATE}'
"""


@register("revenue_analytics", oracle=_REVENUE_ORACLE)
def revenue_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A14 + F2: trailing-window revenue scalars with max(count,1) guard
    (airflow_etl_utils.py:229,238,279-290; 24h window rescaled to
    BATCH_WINDOW_DAYS for the testdata's date span)."""
    orders = load_table(spark, sf_dir, "orders")
    start = F.lit(FROZEN_NOW_DATE).cast("date") - F.expr(f"INTERVAL {BATCH_WINDOW_DAYS} DAY")
    end = F.lit(FROZEN_NOW_DATE).cast("date")
    return (
        orders.filter(F.col("o_orderdate").between(start, end))
        .agg(
            dsum("o_totalprice", coalesce_zero=True).alias("total_revenue"),
            F.count("*").alias("order_count"),
            (
                dsum("o_totalprice", coalesce_zero=True)
                / F.greatest(F.count("*"), F.lit(1))
            ).alias("avg_order_value"),
        )
    )


_PRICING_ORACLE = """
SELECT l_returnflag,
       l_linestatus,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
       CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(l_quantity) AS avg_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(l_extendedprice) AS avg_price,
       CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(l_discount) AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= DATE '1998-09-02'
GROUP BY 1, 2
"""


@register("pricing_summary", oracle=_PRICING_ORACLE)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: the canonical wide hash-aggregate
    (8 aggs, 2 keys) used as the scan/agg bench headline. Derived-column
    money expressions are computed then summed in decimal for
    order-independent parity (functions/money.py)."""
    l = load_table(spark, sf_dir, "lineitem")
    disc_price = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(18,6)")
    charge = (
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
    ).cast("decimal(18,6)")
    return (
        l.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )
