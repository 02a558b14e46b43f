"""Split-conformal prediction interval for the daily-revenue forecaster
(beyond-reference, SURVEY §2.11 forecasting family next to
forecast_backtest_mae: the backtest scores POINT accuracy; conformal
answers the question production actually asks — "what band around
tomorrow's forecast is guaranteed to contain the truth 90 % of the
time", with the distribution-free split-conformal guarantee
P(covered) >= 1 - alpha whenever calibration and test are exchangeable).

Semantics: the series is daily order revenue on the integer cent grid
(decimal(18,2) sums * 100). The forecaster is the seasonal-naive
backtest baseline: fc(d) = value 7 ROWS earlier in day order (row-lag,
not calendar-lag — identical in both engines and well-defined on gappy
series). Scored days (rows 8..n) split in half by day order:
calibration first, test second. The conformal quantile is the EXACT
order statistic q_hat = ceil(0.9 * (n_cal + 1))-th smallest calibration
|residual| (Vovk's finite-sample rule — no interpolation), and each
test day is covered iff its |residual| <= q_hat.

Exactness: residuals are integer cents; q_hat is an integer picked by
rank, so selection is engine-exact. Only the exported rates divide
(bigint -> double, identical expression shape both engines). The ceil
index is computed as floor((9*(n_cal+1) + 9)/10) = ceil(0.9*(n_cal+1))
in pure integer arithmetic — no float ceil enters the rank.

Scale: the daily aggregation bounds everything downstream by the
calendar (~2.4k rows at any SF); the only data-sized stage is the one
map-side-combining orders scan. The lag/rank windows run on the tiny
daily frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: miscoverage level: 1 - alpha = 0.9 target coverage.
ALPHA_NUM, ALPHA_DEN = 9, 10  # 0.9 as an exact integer ratio
LAG = 7

_CONFORMAL_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS cents
  FROM orders GROUP BY 1
),
lagged AS (
  SELECT day, cents,
         lag(cents, {LAG}) OVER (ORDER BY day) AS fc,
         row_number() OVER (ORDER BY day) AS rn
  FROM daily
),
scored AS (
  SELECT day, cents, fc, abs(cents - fc) AS resid,
         row_number() OVER (ORDER BY day) AS srn,
         count(*) OVER () AS n_scored
  FROM lagged WHERE fc IS NOT NULL
),
split AS (
  SELECT *,
         CAST(floor(n_scored / 2.0) AS BIGINT) AS n_cal
  FROM scored
),
cal AS (
  SELECT resid,
         row_number() OVER (ORDER BY resid, day) AS rrank,
         max(n_cal) OVER () AS n_cal
  FROM split WHERE srn <= n_cal
),
q AS (
  SELECT max(n_cal) AS n_cal,
         max(CASE WHEN rrank =
               CAST(floor(({ALPHA_NUM} * (n_cal + 1) + {ALPHA_DEN} - 1)
                          / {ALPHA_DEN}.0) AS BIGINT)
             THEN resid END) AS q_hat_cents
  FROM cal
),
test AS (
  SELECT count(*) AS n_test,
         sum(CASE WHEN s.resid <= q.q_hat_cents THEN 1 ELSE 0 END)
           AS n_covered,
         sum(s.resid) AS sum_abs_resid
  FROM split s CROSS JOIN q WHERE s.srn > s.n_cal
)
SELECT CAST(q.n_cal AS BIGINT) AS n_cal,
       CAST(t.n_test AS BIGINT) AS n_test,
       CAST(q.q_hat_cents AS BIGINT) AS q_hat_cents,
       CAST(t.n_covered AS BIGINT) AS n_covered,
       CAST(t.n_covered AS DOUBLE) / t.n_test AS coverage,
       CAST(t.sum_abs_resid AS DOUBLE) / t.n_test / 100 AS test_mae_dollars,
       CAST(2 * q.q_hat_cents AS DOUBLE) / 100 AS interval_width_dollars
FROM q CROSS JOIN test t
"""


@register("conformal_forecast_intervals", oracle=_CONFORMAL_ORACLE)
def conformal_forecast_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: exact split-conformal 90 % interval half-width (order-
    statistic calibration residual), realized test coverage, and test
    MAE for the seasonal-naive daily-revenue forecaster."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    wd = Window.orderBy("day")
    scored = (
        daily.select(
            "day", "cents", F.lag("cents", LAG).over(wd).alias("fc")
        )
        .filter(F.col("fc").isNotNull())
        .select(
            "day",
            F.abs(F.col("cents") - F.col("fc")).alias("resid"),
            F.row_number().over(wd).alias("srn"),
        )
        .withColumn("n_scored", F.count("*").over(Window.partitionBy()))
        .withColumn(
            "n_cal", F.floor(F.col("n_scored") / 2.0).cast("bigint")
        )
    )
    cal = scored.filter(F.col("srn") <= F.col("n_cal")).select(
        "resid",
        "n_cal",
        F.row_number().over(Window.orderBy("resid", "day")).alias("rrank"),
    )
    # ceil(0.9*(n_cal+1)) in pure integer arithmetic
    qidx = F.floor(
        (ALPHA_NUM * (F.col("n_cal") + 1) + ALPHA_DEN - 1) / float(ALPHA_DEN)
    ).cast("bigint")
    # q carries ONLY q_hat_cents — n_cal re-reads from the scored frame
    # after the join (same value; avoids a duplicate column name)
    q = cal.agg(
        F.max(F.when(F.col("rrank") == qidx, F.col("resid"))).alias(
            "q_hat_cents"
        )
    )
    test = (
        scored.filter(F.col("srn") > F.col("n_cal"))
        .join(F.broadcast(q))
        .agg(
            F.max("n_cal").cast("bigint").alias("n_cal"),
            F.count("*").cast("bigint").alias("n_test"),
            F.max("q_hat_cents").cast("bigint").alias("q_hat_cents"),
            F.sum(
                F.when(F.col("resid") <= F.col("q_hat_cents"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_covered"),
            F.sum("resid").alias("sum_abs_resid"),
        )
    )
    return test.select(
        "n_cal",
        "n_test",
        "q_hat_cents",
        "n_covered",
        (F.col("n_covered").cast("double") / F.col("n_test")).alias("coverage"),
        (
            F.col("sum_abs_resid").cast("double") / F.col("n_test") / 100
        ).alias("test_mae_dollars"),
        ((2 * F.col("q_hat_cents")).cast("double") / 100).alias(
            "interval_width_dollars"
        ),
    )
