"""CUSUM control chart over daily order revenue (beyond-reference,
SURVEY §2.11 monitoring family next to revenue_changepoint / ks_drift:
the changepoint scan finds the single best historical break OFFLINE;
CUSUM is the sequential detector — the chart a pipeline health monitor
actually runs day over day, raising an alarm as soon as the cumulative
drift of the daily mean exceeds the calibrated band, with the classic
ARL trade-off set by the k (allowance) and h (decision) multiples of
sigma).

Semantics: series = daily revenue in integer cents. Calibration = the
first half of days (by day order): mu0 = calibration mean, sigma =
calibration standard deviation (population form), k = round(0.5*sigma)
cents, h = round(4*sigma) cents. The one-sided statistics use the
prefix-sum identity (recurrence-free, window-expressible):

    s+_t = cum_t - min_{i<=t} cum_i,  cum_t = sum_{i<=t} (x_i - mu0 - k)
    s-_t = max_{i<=t} cumn_i - cumn_t, cumn_t = sum_{i<=t}(x_i - mu0 + k)

with a virtual cum_0 = 0 (the running min/max fold in a lit-0 start via
least/greatest with the windowed extremum). Alarm when s+ > h (upward)
or s- > h (downward).

Exactness: all chart arithmetic is INTEGER — deviations are scaled by
n_cal so mu0 never divides (dev_i = n_cal*x_i - S_cal - n_cal*k), and
k/h come from one double sqrt rounded half-away-from-zero to integer
cents (both engines identical). Exported normalized statistics divide
the integers back to double cents at the end.

Scale: daily aggregation bounds the chart at calendar size (~2.4k rows
at any SF); the only data-sized stage is the one orders scan. The
running-extremum windows run on the tiny daily frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

K_SIGMA = 0.5
H_SIGMA = 4.0

_CUSUM_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS x
  FROM orders GROUP BY 1
),
idx AS (
  SELECT day, x,
         row_number() OVER (ORDER BY day) AS rn,
         count(*) OVER () AS n_days
  FROM daily
),
calstats AS (
  SELECT CAST(floor(max(n_days) / 2.0) AS BIGINT) AS n_cal,
         sum(CASE WHEN rn <= floor(n_days / 2.0) THEN x END) AS s_cal,
         sum(CASE WHEN rn <= floor(n_days / 2.0)
             THEN CAST(x AS HUGEINT) * x END) AS ss_cal
  FROM idx
),
params AS (
  SELECT n_cal, s_cal,
         sqrt((CAST(ss_cal AS DOUBLE) - CAST(s_cal AS DOUBLE) * s_cal / n_cal)
              / n_cal) AS sigma,
         CAST(round({K_SIGMA} * sqrt((CAST(ss_cal AS DOUBLE)
              - CAST(s_cal AS DOUBLE) * s_cal / n_cal) / n_cal)) AS BIGINT)
           AS k_cents,
         CAST(round({H_SIGMA} * sqrt((CAST(ss_cal AS DOUBLE)
              - CAST(s_cal AS DOUBLE) * s_cal / n_cal) / n_cal)) AS BIGINT)
           AS h_cents
  FROM calstats
),
dev AS (
  SELECT i.day, i.rn, p.n_cal, p.k_cents, p.h_cents, p.sigma,
         sum(CAST(p.n_cal AS HUGEINT) * i.x - p.s_cal
             - CAST(p.n_cal AS HUGEINT) * p.k_cents)
           OVER (ORDER BY i.rn ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cum_up,
         sum(CAST(p.n_cal AS HUGEINT) * i.x - p.s_cal
             + CAST(p.n_cal AS HUGEINT) * p.k_cents)
           OVER (ORDER BY i.rn ROWS BETWEEN UNBOUNDED PRECEDING
                 AND CURRENT ROW) AS cum_dn
  FROM idx i CROSS JOIN params p
),
charts AS (
  SELECT day, rn, n_cal, k_cents, h_cents, sigma,
         cum_up - least(CAST(0 AS HUGEINT),
             min(cum_up) OVER (ORDER BY rn ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW)) AS s_up,
         greatest(CAST(0 AS HUGEINT),
             max(cum_dn) OVER (ORDER BY rn ROWS BETWEEN UNBOUNDED
                 PRECEDING AND CURRENT ROW)) - cum_dn AS s_dn
  FROM dev
)
SELECT CAST(max(rn) AS BIGINT) AS n_days,
       CAST(max(n_cal) AS BIGINT) AS n_cal,
       round(max(sigma), 9) AS sigma_cents,
       CAST(max(k_cents) AS BIGINT) AS k_cents,
       CAST(max(h_cents) AS BIGINT) AS h_cents,
       CAST(sum(CASE WHEN s_up > CAST(n_cal AS HUGEINT) * h_cents
                THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms_up,
       CAST(sum(CASE WHEN s_dn > CAST(n_cal AS HUGEINT) * h_cents
                THEN 1 ELSE 0 END) AS BIGINT) AS n_alarms_down,
       min(CASE WHEN s_up > CAST(n_cal AS HUGEINT) * h_cents THEN day END)
         AS first_alarm_up,
       min(CASE WHEN s_dn > CAST(n_cal AS HUGEINT) * h_cents THEN day END)
         AS first_alarm_down,
       CAST(max(s_up) AS DOUBLE) / max(n_cal) AS max_s_up_cents,
       CAST(max(s_dn) AS DOUBLE) / max(n_cal) AS max_s_down_cents
FROM charts
"""


@register("cusum_drift", oracle=_CUSUM_ORACLE)
def cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: calibrated two-sided CUSUM chart summary over daily
    revenue — alarm counts, first alarm days, peak statistics."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("x")
    )
    wd = Window.orderBy("day")
    idx = daily.select(
        "day",
        "x",
        F.row_number().over(wd).alias("rn"),
        F.count("*").over(Window.partitionBy()).alias("n_days"),
    )
    cal = idx.agg(
        F.floor(F.max("n_days") / 2.0).cast("bigint").alias("n_cal"),
        F.sum(
            F.when(F.col("rn") <= F.floor(F.col("n_days") / 2.0), F.col("x"))
        ).alias("s_cal"),
        F.sum(
            F.when(
                F.col("rn") <= F.floor(F.col("n_days") / 2.0),
                F.col("x").cast("decimal(38,0)") * F.col("x"),
            )
        ).alias("ss_cal"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    var = (d("ss_cal") - d("s_cal") * F.col("s_cal") / F.col("n_cal")) / F.col(
        "n_cal"
    )
    params = cal.select(
        "n_cal",
        "s_cal",
        F.sqrt(var).alias("sigma"),
        F.round(K_SIGMA * F.sqrt(var)).cast("bigint").alias("k_cents"),
        F.round(H_SIGMA * F.sqrt(var)).cast("bigint").alias("h_cents"),
    )
    _dec = "decimal(38,0)"
    dev = idx.join(F.broadcast(params)).select(
        "day",
        "rn",
        "n_cal",
        "k_cents",
        "h_cents",
        "sigma",
        F.sum(
            F.col("n_cal").cast(_dec) * F.col("x")
            - F.col("s_cal")
            - F.col("n_cal").cast(_dec) * F.col("k_cents")
        )
        .over(wd.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_up"),
        F.sum(
            F.col("n_cal").cast(_dec) * F.col("x")
            - F.col("s_cal")
            + F.col("n_cal").cast(_dec) * F.col("k_cents")
        )
        .over(wd.rowsBetween(Window.unboundedPreceding, 0))
        .alias("cum_dn"),
    )
    run = Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, 0)
    zero = F.lit(0).cast(_dec)
    charts = dev.select(
        "day",
        "rn",
        "n_cal",
        "k_cents",
        "h_cents",
        "sigma",
        (F.col("cum_up") - F.least(zero, F.min("cum_up").over(run))).alias(
            "s_up"
        ),
        (F.greatest(zero, F.max("cum_dn").over(run)) - F.col("cum_dn")).alias(
            "s_dn"
        ),
    )
    hlim = F.col("n_cal").cast(_dec) * F.col("h_cents")
    return charts.agg(
        F.max("rn").cast("bigint").alias("n_days"),
        F.max("n_cal").cast("bigint").alias("n_cal"),
        F.round(F.max("sigma"), 9).alias("sigma_cents"),
        F.max("k_cents").cast("bigint").alias("k_cents"),
        F.max("h_cents").cast("bigint").alias("h_cents"),
        F.sum(F.when(F.col("s_up") > hlim, 1).otherwise(0))
        .cast("bigint")
        .alias("n_alarms_up"),
        F.sum(F.when(F.col("s_dn") > hlim, 1).otherwise(0))
        .cast("bigint")
        .alias("n_alarms_down"),
        F.min(F.when(F.col("s_up") > hlim, F.col("day"))).alias(
            "first_alarm_up"
        ),
        F.min(F.when(F.col("s_dn") > hlim, F.col("day"))).alias(
            "first_alarm_down"
        ),
        (F.max("s_up").cast("double") / F.max("n_cal")).alias(
            "max_s_up_cents"
        ),
        (F.max("s_dn").cast("double") / F.max("n_cal")).alias(
            "max_s_down_cents"
        ),
    )
