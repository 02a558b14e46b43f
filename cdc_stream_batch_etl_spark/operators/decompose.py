"""Classical additive decomposition of daily revenue — trend (centered
7-day moving average), weekday seasonality, residual (the
moving-average decomposition every forecasting text opens with;
beyond-reference, SURVEY §2.11 time-series family: revenue_trend fits
a line, weekday_seasonality profiles weekday means, this produces the
full per-day trend/seasonal/residual table an anomaly reviewer and a
forecaster actually consume — a residual spike is an incident, a
seasonal column is the input to weekday-corrected alerting).

Construction (all EXACT until the final read-out):
  - daily revenue in decimal(38,2) (the money.py discipline, widened
    so 7-day sums can never round);
  - trend·7 = the centered 7-day RANGE window sum over the epoch-day
    integer — a RANGE frame, so calendar gaps shrink the window and
    the full-window filter (count = 7) drops those days plus the 3-day
    edges, the textbook treatment;
  - dev·7 = 7·revenue − trend·7 (exact decimal);
  - weekday seasonal = mean of dev over that weekday MINUS the grand
    dev mean (re-centering makes the seasonal column sum to ~0, so
    trend + seasonal + residual = revenue by construction);
  - weekday = (epoch_day + 3) % 7 (1970-01-01 was a Thursday; 0 =
    Monday) — pure integer arithmetic, no cross-engine calendar
    function.

Determinism: every intermediate is an exact decimal integer-scaled
sum; the doubles (trend, seasonal, residual) are the identical literal
chain cast→divide→subtract in both engines — no rounding export
needed.

Scale: one hash agg to days (map-side partial over orders), then
windows over the DAY-count frame (~3 orders of magnitude smaller than
the fact table; a global sort of days is trivial at any corpus size —
the daily_revenue_rolling7 class), one 7-row weekday agg broadcast
back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_DECOMP_ORACLE = """
WITH daily AS (
  SELECT (CAST(o_orderdate AS DATE) - DATE '1970-01-01') AS d,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
  FROM orders GROUP BY 1
),
win AS (
  SELECT d, rev,
         CAST(sum(rev) OVER w AS DECIMAL(38,2)) AS trend7,
         count(*) OVER w AS n_win
  FROM daily
  WINDOW w AS (ORDER BY d RANGE BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
full_win AS (
  SELECT d, (d + 3) % 7 AS weekday, rev,
         trend7,
         CAST(7 * rev - trend7 AS DECIMAL(38,2)) AS dev7
  FROM win WHERE n_win = 7
),
seas AS (
  SELECT weekday,
         CAST(sum(dev7) AS DECIMAL(38,2)) AS sum_dev7,
         CAST(count(*) AS BIGINT) AS n_w
  FROM full_win GROUP BY weekday
),
grand AS (
  SELECT CAST(sum(sum_dev7) AS DECIMAL(38,2)) AS tot_dev7,
         CAST(sum(n_w) AS BIGINT) AS n_all
  FROM seas
)
SELECT CAST(f.d AS BIGINT) AS epoch_day,
       CAST(f.weekday AS BIGINT) AS weekday,
       CAST(f.rev AS DOUBLE) AS revenue,
       CAST(f.trend7 AS DOUBLE) / 7.0e0 AS trend,
       CAST(s.sum_dev7 AS DOUBLE) / (7.0e0 * s.n_w)
         - CAST(g.tot_dev7 AS DOUBLE) / (7.0e0 * g.n_all) AS seasonal,
       CAST(f.dev7 AS DOUBLE) / 7.0e0
         - (CAST(s.sum_dev7 AS DOUBLE) / (7.0e0 * s.n_w)
            - CAST(g.tot_dev7 AS DOUBLE) / (7.0e0 * g.n_all)) AS residual
FROM full_win f
JOIN seas s USING (weekday)
CROSS JOIN grand g
ORDER BY epoch_day
"""


@register("revenue_decomposition", oracle=_DECOMP_ORACLE)
def revenue_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(epoch_day, weekday, revenue, trend, seasonal, residual) for
    every day with a full centered 7-day window: the classical additive
    decomposition of daily order revenue."""
    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(
            F.datediff(
                F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date")
            ).alias("d")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("decimal(38,2)")
            .alias("rev")
        )
        # persisted: a DAY-count frame (thousands of rows at any corpus
        # size) consumed by the window, the seasonal agg and the final
        # join — unpersisted, each reference re-scans orders (3 fact
        # scans in the plan). Caller-must-clear contract (vocab.py).
        .persist()
    )
    w = Window.orderBy("d").rangeBetween(-3, 3)
    win = daily.select(
        "d",
        "rev",
        F.sum("rev").over(w).cast("decimal(38,2)").alias("trend7"),
        F.count("*").over(w).alias("n_win"),
    ).filter(F.col("n_win") == 7)
    full = win.select(
        "d",
        ((F.col("d") + 3) % 7).alias("weekday"),
        "rev",
        "trend7",
        (F.lit(7) * F.col("rev") - F.col("trend7"))
        .cast("decimal(38,2)")
        .alias("dev7"),
    )
    seas = full.groupBy("weekday").agg(
        F.sum("dev7").cast("decimal(38,2)").alias("sum_dev7"),
        F.count("*").cast("bigint").alias("n_w"),
    )
    grand = seas.agg(
        F.sum("sum_dev7").cast("decimal(38,2)").alias("tot_dev7"),
        F.sum("n_w").cast("bigint").alias("n_all"),
    )
    seasonal = F.col("sum_dev7").cast("double") / (7.0 * F.col("n_w")) - F.col(
        "tot_dev7"
    ).cast("double") / (7.0 * F.col("n_all"))
    return (
        full.join(F.broadcast(seas), "weekday")
        .crossJoin(F.broadcast(grand))
        .select(
            F.col("d").cast("bigint").alias("epoch_day"),
            F.col("weekday").cast("bigint").alias("weekday"),
            F.col("rev").cast("double").alias("revenue"),
            (F.col("trend7").cast("double") / 7.0).alias("trend"),
            seasonal.alias("seasonal"),
            (F.col("dev7").cast("double") / 7.0 - seasonal).alias("residual"),
        )
        .orderBy("epoch_day")
    )
