"""Forecast backtest scorecard — MAE/bias of the three standard
baseline forecasters (naive, weekly seasonal-naive, trailing-7-day
moving average) over the daily revenue series, evaluated on a shared
expanding-window backtest (beyond-reference, SURVEY §2.11 ML-eval
family: time_series_cv_folds cuts the TRAIN/TEST windows, this scores
actual FORECASTERS inside them — the two halves of the
Hyndman-Athanasopoulos backtest loop; any real model must beat these
baselines or it ships nothing).

Semantics: daily revenue in exact integer CENTS (decimal(18,2) sum
x100 -> bigint). Day index = dense order over observed days. Eval set
= days with index >= 8 (all three forecasters defined — identical
support, so the MAEs are comparable). Forecasts:
  naive           y[t-1]
  seasonal_naive  y[t-7]   (weekly period)
  moving_avg7     mean(y[t-7..t-1]) — carried as the exact 7-day SUM;
                  its error |7*y - sum7| is integer, divided by 7 only
                  at export (no float accumulates across rows).
MAE and bias are integer error sums divided ONCE by (100*n) — the
trend.py discipline: cross-engine float nondeterminism cannot arise
because no double is ever summed.

Scale: one orders scan -> one date hash agg (map-side partials)
collapses the corpus to the CALENDAR-BOUNDED daily frame; the lag/sum
window is single-partition over that constant-size frame (the
revenue_trend posture — day count grows with the calendar, not the
corpus), then one 3-method stack unpivot and a 3-row agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

SEASON = 7
MIN_IDX = 8  # first day index where all three forecasters are defined

_BACKTEST_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT row_number() OVER (ORDER BY day) AS idx, cents,
         lag(cents, 1) OVER (ORDER BY day) AS naive_p,
         lag(cents, {SEASON}) OVER (ORDER BY day) AS snaive_p,
         sum(cents) OVER (ORDER BY day
           ROWS BETWEEN {SEASON} PRECEDING AND 1 PRECEDING) AS sum7
  FROM daily
),
ev AS (SELECT * FROM lagged WHERE idx >= {MIN_IDX}),
err AS (
  SELECT method, n, sae, se, den FROM (
    SELECT 'moving_avg7' AS method, count(*) AS n,
           sum(abs({SEASON} * cents - sum7)) AS sae,
           sum({SEASON} * cents - sum7) AS se,
           {SEASON} AS den
    FROM ev
    UNION ALL
    SELECT 'naive', count(*), sum(abs(cents - naive_p)),
           sum(cents - naive_p), 1 FROM ev
    UNION ALL
    SELECT 'seasonal_naive', count(*), sum(abs(cents - snaive_p)),
           sum(cents - snaive_p), 1 FROM ev
  )
)
SELECT method, CAST(n AS BIGINT) AS n_days,
       CAST(sae AS DOUBLE) / (100.0 * den * n) AS mae,
       CAST(se AS DOUBLE) / (100.0 * den * n) AS bias
FROM err
ORDER BY method
"""


@register("forecast_backtest_mae", oracle=_BACKTEST_ORACLE)
def forecast_backtest_mae(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(method, n_days, mae, bias) — expanding-backtest error of the
    naive / seasonal-naive / 7-day-moving-average forecasters."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    w = Window.orderBy("day")
    lagged = daily.select(
        F.row_number().over(w).alias("idx"),
        "cents",
        F.lag("cents", 1).over(w).alias("naive_p"),
        F.lag("cents", SEASON).over(w).alias("snaive_p"),
        F.sum("cents").over(w.rowsBetween(-SEASON, -1)).alias("sum7"),
    ).filter(F.col("idx") >= MIN_IDX)
    errs = lagged.select(
        F.expr(
            f"stack(3, "
            f"'moving_avg7', abs({SEASON} * cents - sum7), "
            f"{SEASON} * cents - sum7, {SEASON}L, "
            f"'naive', abs(cents - naive_p), cents - naive_p, 1L, "
            f"'seasonal_naive', abs(cents - snaive_p), cents - snaive_p, 1L"
            f") AS (method, ae, e, den)"
        )
    )
    return (
        errs.groupBy("method", "den")
        .agg(
            F.count("*").alias("n"),
            F.sum("ae").alias("sae"),
            F.sum("e").alias("se"),
        )
        .select(
            "method",
            F.col("n").cast("bigint").alias("n_days"),
            (F.col("sae").cast("double") / (100.0 * F.col("den") * F.col("n"))).alias(
                "mae"
            ),
            (F.col("se").cast("double") / (100.0 * F.col("den") * F.col("n"))).alias(
                "bias"
            ),
        )
        .orderBy("method")
    )
