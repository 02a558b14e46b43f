"""Theil-Sen robust trend estimator over daily order revenue, per year
(beyond-reference, SURVEY §2.11 time-series family next to
revenue_trend / forecast_revenue_change: OLS slopes — and the
mean-based trends the reference's pandas summaries produce — break
under a single fat-fingered day; the median-of-pairwise-slopes
estimator keeps a 29.3 % breakdown point and is the standard robust
trend line for revenue monitoring).

Semantics: daily revenue = SUM(o_totalprice) per calendar day of
o_orderdate, summed in decimal(18,2) (the repo's money convention) and
then expressed on the integer cent grid. Within each order year, every
ordered day pair (d_i < d_j) contributes one slope
    s_ij = (cents_j - cents_i) / (d_j - d_i  in days)
and the year's trend is the MEDIAN slope, realized as the exact
order-statistic median: rank the pairs by (slope, day_i, day_j) and
average the values at positions floor((n+1)/2) and ceil((n+1)/2) —
no engine quantile/percentile function enters (their interpolation
arithmetic differs in the last ulp across engines; the two-point
average (a+b)/2 of identical doubles does not).

Exactness: cents deltas and day deltas are integers; each slope is ONE
IEEE double division of integer-exact doubles, so both engines produce
bit-identical slopes, identical (slope, day_i, day_j) rank orders, and
an identical two-point average. Exported unrounded.

Scale: the pair stage is CALENDAR-bounded, not data-bounded — daily
aggregation reduces any SF to <= 366 rows per year, so the per-year
self-join is <= 66.8k pairs at 100 TB exactly as at sf0.01. One
orders scan with a map-side-combining (year, day) hash agg is the only
data-sized stage; everything after runs on a frame the driver could
hold in L2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_THEILSEN_ORACLE = """
WITH daily AS (
  SELECT EXTRACT(year FROM o_orderdate) AS yr,
         CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1, 2
),
pairs AS (
  SELECT a.yr,
         CAST(b.cents - a.cents AS DOUBLE)
           / CAST(date_diff('day', a.day, b.day) AS DOUBLE) AS slope,
         a.day AS da, b.day AS db
  FROM daily a JOIN daily b ON a.yr = b.yr AND a.day < b.day
),
ranked AS (
  SELECT yr, slope,
         row_number() OVER (PARTITION BY yr ORDER BY slope, da, db) AS rn,
         count(*) OVER (PARTITION BY yr) AS n
  FROM pairs
),
med AS (
  SELECT yr, max(n) AS n_pairs, avg(slope) AS slope_cents_per_day
  FROM ranked
  WHERE rn = CAST(floor((n + 1) / 2.0) AS BIGINT)
     OR rn = CAST(floor((n + 2) / 2.0) AS BIGINT)
  GROUP BY yr
),
days AS (SELECT yr, count(*) AS n_days FROM daily GROUP BY yr)
SELECT CAST(d.yr AS BIGINT) AS order_year,
       CAST(d.n_days AS BIGINT) AS n_days,
       CAST(m.n_pairs AS BIGINT) AS n_pairs,
       m.slope_cents_per_day
FROM days d JOIN med m ON d.yr = m.yr
ORDER BY order_year
"""


@register("theil_sen_trend", oracle=_THEILSEN_ORACLE)
def theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(order_year, n_days, n_pairs, slope_cents_per_day) — median of
    pairwise daily-revenue slopes per year; exact order-statistic
    median, calendar-bounded pair stage."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(
        F.year("o_orderdate").alias("yr"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    a = daily.select(
        F.col("yr"), F.col("day").alias("da"), F.col("cents").alias("ca")
    )
    b = daily.select(
        F.col("yr").alias("yrb"), F.col("day").alias("db"), F.col("cents").alias("cb")
    )
    pairs = a.join(
        b, (F.col("yr") == F.col("yrb")) & (F.col("da") < F.col("db"))
    ).select(
        "yr",
        (
            (F.col("cb") - F.col("ca")).cast("double")
            / F.datediff("db", "da").cast("double")
        ).alias("slope"),
        "da",
        "db",
    )
    w = Window.partitionBy("yr")
    ranked = pairs.select(
        "yr",
        "slope",
        F.row_number().over(w.orderBy("slope", "da", "db")).alias("rn"),
        F.count("*").over(w).alias("n"),
    )
    med = (
        ranked.filter(
            (F.col("rn") == F.floor((F.col("n") + 1) / 2.0).cast("bigint"))
            | (F.col("rn") == F.floor((F.col("n") + 2) / 2.0).cast("bigint"))
        )
        .groupBy("yr")
        .agg(
            F.max("n").cast("bigint").alias("n_pairs"),
            F.avg("slope").alias("slope_cents_per_day"),
        )
    )
    days = daily.groupBy("yr").agg(F.count("*").cast("bigint").alias("n_days"))
    return (
        days.join(med, "yr")
        .select(
            F.col("yr").cast("bigint").alias("order_year"),
            "n_days",
            "n_pairs",
            "slope_cents_per_day",
        )
        .orderBy("order_year")
    )
