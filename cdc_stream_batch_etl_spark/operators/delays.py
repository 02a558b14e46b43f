"""Latency distributions — time-to-convert and fulfillment lag.

conversion_funnel counts WHO converts; the operational questions that
follow are HOW LONG conversion and fulfillment take. Two grouped
latency profiles:

- `time_to_convert`: per user, the delay from first signup to first
  purchase; profiled as exact p50/p90 with the converting-user count.
  One row (global cohort) — the funnel-latency headline number.
- `fulfillment_lag`: per order priority, the distribution of
  o_orderdate → l_shipdate lags across line items (the reference's
  orders/lineitem domain has no better latency pair; priority is the
  natural grouping an SLA report uses).

Both use the grouped-exact-percentile pass (lengthdist.py precedent:
Spark `percentile` ≡ DuckDB `quantile_cont`, linear interpolation) and
integer day/microsecond deltas — no float time arithmetic.

Scale: time_to_convert is two scan-filtered min-aggs on user_id (one
shuffle) + one scalar percentile agg; fulfillment_lag is one
orderkey-keyed join (the orders⋈lineitem shuffle every TPC-H shape
pays) + a tiny grouped sort-agg. No windows, no corpus sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_CONVERT_ORACLE = """
WITH s AS (
  SELECT user_id, min(ts) AS first_signup
  FROM events WHERE event_type = 'signup' GROUP BY 1
), p AS (
  SELECT user_id, min(ts) AS first_purchase
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), d AS (
  SELECT s.user_id,
         epoch_us(p.first_purchase) - epoch_us(s.first_signup) AS delay_us
  FROM s JOIN p USING (user_id)
  WHERE p.first_purchase >= s.first_signup
)
SELECT CAST(count(*) AS BIGINT) AS n_converting_users,
       quantile_cont(CAST(delay_us AS DOUBLE), 0.5) AS p50_delay_us,
       quantile_cont(CAST(delay_us AS DOUBLE), 0.9) AS p90_delay_us,
       CAST(min(delay_us) AS BIGINT) AS min_delay_us,
       CAST(max(delay_us) AS BIGINT) AS max_delay_us
FROM d
"""


@register("time_to_convert", oracle=_CONVERT_ORACLE)
def time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→first-purchase delay profile over converting users (users
    whose first purchase is at or after their first signup)."""
    ev = load_table(spark, sf_dir, "events")
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_signup"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    d = (
        s.join(p, "user_id")
        .filter(F.col("first_purchase") >= F.col("first_signup"))
        .select(
            (
                F.unix_micros("first_purchase") - F.unix_micros("first_signup")
            ).alias("delay_us")
        )
    )
    return d.agg(
        F.count("*").alias("n_converting_users"),
        F.percentile(F.col("delay_us").cast("double"), F.lit(0.5)).alias("p50_delay_us"),
        F.percentile(F.col("delay_us").cast("double"), F.lit(0.9)).alias("p90_delay_us"),
        F.min("delay_us").cast("bigint").alias("min_delay_us"),
        F.max("delay_us").cast("bigint").alias("max_delay_us"),
    )


_FULFILL_ORACLE = """
SELECT o.o_orderpriority,
       CAST(count(*) AS BIGINT) AS n_lineitems,
       quantile_cont(CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS DOUBLE), 0.5)
         AS p50_lag_days,
       quantile_cont(CAST(date_diff('day', o.o_orderdate, l.l_shipdate) AS DOUBLE), 0.9)
         AS p90_lag_days,
       CAST(max(date_diff('day', o.o_orderdate, l.l_shipdate)) AS BIGINT) AS max_lag_days
FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
GROUP BY 1
"""


@register("fulfillment_lag", oracle=_FULFILL_ORACLE)
def fulfillment_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order→ship lag distribution per order priority — the SLA report."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_orderdate"
    )
    l = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    lag = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    return (
        l.join(o, l["l_orderkey"] == o["o_orderkey"])
        .select("o_orderpriority", lag.alias("lag_days"))
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_lineitems"),
            F.percentile(F.col("lag_days").cast("double"), F.lit(0.5)).alias("p50_lag_days"),
            F.percentile(F.col("lag_days").cast("double"), F.lit(0.9)).alias("p90_lag_days"),
            F.max("lag_days").cast("bigint").alias("max_lag_days"),
        )
    )
