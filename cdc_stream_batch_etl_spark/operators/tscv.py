"""Expanding-window time-series cross-validation folds — the temporal
train/test splitter (the standard forecasting-CV scheme, e.g.
Hyndman & Athanasopoulos, "Forecasting: Principles and Practice" §5.10
"time series cross-validation"; beyond-reference, SURVEY §2.11 ML-eval
family next to stratified_kfold and train_test_split).

stratified_kfold shuffles rows — exactly what leaks the future into a
forecaster's training set. Temporal CV splits by TIME: the day axis is
cut into K+1 equal blocks; fold k trains on blocks 1..k and tests on
block k+1, so every fold's test window strictly follows its training
window and later folds train on more history (the expanding window).
The report row per fold carries the window boundaries and volumes a
backtest harness needs: day counts, date spans, and exact train/test
revenue (the target mass per window — imbalance here means the fold's
metric is not comparable).

Determinism: the day blocks are ntile(K+1) over the total order
(order_date) on the DAILY aggregate — distinct days, no ties; all
measures are integer counts, date min/max picks, and decimal(18,2)
sums. Revenue is decimal INSIDE the plan; the export casts to double
in both legs (repo convention: no DecimalType leaves a registered
query — the driver's value-hash is type-kind-sensitive, and Spark
exports Decimal objects where DuckDB exports float64; the values are
exact decimals <= 12 significant digits so the double cast is
deterministic). This was the r11 hash-fail — see VERDICT r11 §What's
wrong #1.

Scale: one orders scan → one date-keyed hash agg (map-side partials)
collapses the corpus to ~2,400 daily rows; the ntile window runs on
that CALENDAR-BOUNDED frame (days don't grow with corpus volume, so
the single-partition sort is a constant-size report step — the
revenue_trend posture), then a 5-row conditional aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

K_FOLDS = 5

_TSCV_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS revenue
  FROM orders GROUP BY 1
),
blocked AS (
  SELECT day, revenue, ntile({K_FOLDS + 1}) OVER (ORDER BY day) AS blk
  FROM daily
),
folds AS (SELECT CAST(f AS BIGINT) AS fold FROM unnest(range(1, {K_FOLDS + 1})) AS t(f))
SELECT fold,
       count(*) FILTER (WHERE blk <= fold) AS train_days,
       count(*) FILTER (WHERE blk = fold + 1) AS test_days,
       min(day) FILTER (WHERE blk <= fold) AS train_start,
       max(day) FILTER (WHERE blk <= fold) AS train_end,
       min(day) FILTER (WHERE blk = fold + 1) AS test_start,
       max(day) FILTER (WHERE blk = fold + 1) AS test_end,
       CAST(CAST(sum(revenue) FILTER (WHERE blk <= fold) AS DECIMAL(18,2)) AS DOUBLE) AS train_revenue,
       CAST(CAST(sum(revenue) FILTER (WHERE blk = fold + 1) AS DECIMAL(18,2)) AS DOUBLE) AS test_revenue
FROM blocked CROSS JOIN folds
GROUP BY fold
ORDER BY fold
"""


@register("time_series_cv_folds", oracle=_TSCV_ORACLE)
def time_series_cv_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(fold, train_days, test_days, train/test date spans, train/test
    revenue) — K expanding-window temporal CV folds over daily revenue."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("decimal(18,2)")
        .alias("revenue")
    )
    blocked = daily.withColumn(
        "blk", F.ntile(K_FOLDS + 1).over(Window.orderBy("day"))
    )
    folds = F.explode(
        F.array(*[F.lit(k).cast("bigint") for k in range(1, K_FOLDS + 1)])
    ).alias("fold")
    train = F.col("blk") <= F.col("fold")
    test = F.col("blk") == F.col("fold") + 1
    return (
        blocked.select("day", "revenue", "blk", folds)
        .groupBy("fold")
        .agg(
            F.count(F.when(train, 1)).alias("train_days"),
            F.count(F.when(test, 1)).alias("test_days"),
            F.min(F.when(train, F.col("day"))).alias("train_start"),
            F.max(F.when(train, F.col("day"))).alias("train_end"),
            F.min(F.when(test, F.col("day"))).alias("test_start"),
            F.max(F.when(test, F.col("day"))).alias("test_end"),
            F.sum(F.when(train, F.col("revenue")))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("train_revenue"),
            F.sum(F.when(test, F.col("revenue")))
            .cast("decimal(18,2)")
            .cast("double")
            .alias("test_revenue"),
        )
        .orderBy("fold")
    )
