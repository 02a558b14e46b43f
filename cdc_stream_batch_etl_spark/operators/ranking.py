"""Analytic window functions — ranked top-k per group, running totals,
rolling windows, and lag gaps.

The reference has NO window functions (SURVEY.md §2.8: no OVER clauses
anywhere; its only "ranking" is a full ORDER BY total_revenue DESC,
batch_processor.py:70, and its running totals are Redis `incrbyfloat`
counters, cdc_processor.py:124-127). A user replacing it with this engine
still expects the standard analytic family, so we add it beyond-reference:

  - top_parts_per_brand    ROW_NUMBER top-k per group (the "top sellers
                           per category" report the reference approximates
                           with a global sort)
  - customer_spend_running cumulative per-customer spend — the relational
                           form of the reference's `metrics:revenue`
                           running counters, but replayable at any point
                           in history instead of a single mutable cell
  - daily_revenue_rolling7 7-day moving sum/average over daily revenue
  - customer_order_gaps    LAG: days since the customer's previous order
                           (the inter-arrival feature a churn model eats)

Determinism/oracle rules: every ORDER BY inside an OVER clause carries a
unique key tie-break (o_orderkey / p_partkey) so both engines rank
identically; window sums over money go through DECIMAL(18,2) (exact,
order-independent) and cast to double at the edge, per functions/money.py.

Scale: a window over PARTITION BY k is one hash exchange on k plus a
per-partition sort — same shuffle shape as groupBy(k), no global sort.
top_parts_per_brand aggregates the fact table down to one row per part
BEFORE the window, so the sort input is |parts|, not |lineitem|. The one
global window (daily_revenue_rolling7) sorts |distinct days| rows — a
single-partition window is fine there because days are bounded (~2.4k),
and the heavy reduction happens in the groupBy before it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.money import DEC, dsum
from ..registry import register

_TOP_K = 3

_TOP_PARTS_ORACLE = f"""
WITH part_rev AS (
  SELECT p.p_partkey, p.p_brand,
         CAST(coalesce(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))), 0) AS DOUBLE)
           AS total_revenue
  FROM part p LEFT JOIN lineitem l ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
), ranked AS (
  SELECT p_partkey, p_brand, total_revenue,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY p_brand
           ORDER BY total_revenue DESC, p_partkey
         ) AS INT) AS brand_rank
  FROM part_rev
)
SELECT p_partkey, p_brand, total_revenue, brand_rank
FROM ranked WHERE brand_rank <= {_TOP_K}
"""


@register("top_parts_per_brand", oracle=_TOP_PARTS_ORACLE)
def top_parts_per_brand(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 parts by lifetime revenue within each brand.

    Fact side is aggregated to one row per part before the window, so the
    rank sort runs over |parts| rows; ties broken by p_partkey.
    """
    part = load_table(spark, sf_dir, "part")
    lineitem = load_table(spark, sf_dir, "lineitem")
    part_rev = (
        part.join(lineitem, part.p_partkey == lineitem.l_partkey, "left")
        .groupBy("p_partkey", "p_brand")
        .agg(dsum("l_extendedprice", coalesce_zero=True).alias("total_revenue"))
    )
    w = Window.partitionBy("p_brand").orderBy(
        F.desc("total_revenue"), F.asc("p_partkey")
    )
    return (
        part_rev.withColumn("brand_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("brand_rank") <= _TOP_K)
        .select("p_partkey", "p_brand", "total_revenue", "brand_rank")
    )


_RUNNING_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       o_totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate, o_orderkey
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS spend_to_date,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
       ) AS INT) AS order_seq
FROM orders
"""


@register("customer_spend_running", oracle=_RUNNING_ORACLE)
def customer_spend_running(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative spend and order sequence number per customer.

    The replayable-history form of the reference's `metrics:revenue:total`
    / per-entity counters (cdc_processor.py:124-127): one row per order
    with the customer's spend *as of* that order.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seq = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("order_date"),
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("spend_to_date"),
        F.row_number().over(seq).cast("int").alias("order_seq"),
    )


_ROLLING_ORACLE = """
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS order_date,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS day_revenue,
         CAST(count(*) AS BIGINT) AS day_orders
  FROM orders GROUP BY 1
)
SELECT order_date, day_revenue, day_orders,
       CAST(SUM(CAST(day_revenue AS DECIMAL(18,2))) OVER w AS DOUBLE) AS rolling7_revenue,
       CAST(SUM(CAST(day_revenue AS DECIMAL(18,2))) OVER w AS DOUBLE)
         / SUM(day_orders) OVER w AS rolling7_avg_order
FROM daily
WINDOW w AS (ORDER BY order_date ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
"""


@register("daily_revenue_rolling7", oracle=_ROLLING_ORACLE)
def daily_revenue_rolling7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue with a 7-day trailing sum and per-order average.

    The groupBy collapses |orders| to |days| (~2.4k) before the window, so
    the unpartitioned frame sorts a bounded input — acceptable at any SF
    because day-cardinality grows with calendar time, not data volume.
    """
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(F.to_date("o_orderdate").alias("order_date")).agg(
        dsum("o_totalprice").alias("day_revenue"),
        F.count("*").alias("day_orders"),
    )
    w = Window.orderBy("order_date").rowsBetween(-6, Window.currentRow)
    roll_sum = F.sum(F.col("day_revenue").cast(DEC)).over(w).cast("double")
    return daily.select(
        "order_date",
        "day_revenue",
        "day_orders",
        roll_sum.alias("rolling7_revenue"),
        (roll_sum / F.sum("day_orders").over(w)).alias("rolling7_avg_order"),
    )


_GAPS_ORACLE = """
SELECT o_custkey, o_orderkey,
       CAST(o_orderdate AS DATE) AS order_date,
       CAST(date_diff('day',
              LAG(CAST(o_orderdate AS DATE)) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
              CAST(o_orderdate AS DATE)) AS INT) AS days_since_prev
FROM orders
"""


@register("customer_order_gaps", oracle=_GAPS_ORACLE)
def customer_order_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Days since the same customer's previous order (NULL on the first).

    Inter-arrival gaps — the recency/churn feature; same exchange shape as
    any per-customer window (one hash exchange on o_custkey).
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    d = F.to_date("o_orderdate")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        d.alias("order_date"),
        F.datediff(d, F.lag(d).over(w)).cast("int").alias("days_since_prev"),
    )
