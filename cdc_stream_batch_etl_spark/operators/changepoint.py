"""CUSUM change-point detection — when did a series shift level?

operators/drift.py answers WHETHER a value distribution moved between
two halves of the corpus; monitoring a training-data feed also needs
WHERE in time the level shifted (a source went down, a scraper change
doubled document sizes, a price migration). The classic scan statistic
is the CUSUM curve: deviations from the series mean, accumulated in
order — the day with the extreme |CUSUM| is the most likely single
change point (Page's cumulative-sum test in its offline scan form).

Determinism (full DuckDB oracle): the mean enters the deviation as a
RATIO — so the whole statistic is rescaled by n to stay in exact
integers (the operators/autocorr.py sufficient-statistics discipline):
  scaled_dev_k = n * x_k - T        (T = Σx, exact DECIMAL cents)
  scaled_cusum_k = Σ_{i<=k} scaled_dev_k = n * CUSUM_k
Rescaling by the positive constant n preserves the argmax, so the
change-point day is EXACTLY the classical one while every compared
quantity is an exact decimal; the argmax tie-breaks to the earliest
day. The magnitude is reported n-normalized (one exact-decimal /
bigint division rounded to 4 decimals — the twap_r treatment).

Scale: one corpus-sized hash-agg onto (type, day); everything after
runs on the calendar-sized daily frame (windows partitioned by type,
|days| rows per partition — the operators/resample.py argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_CUSUM_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(value AS DECIMAL(18,2))) AS x
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n,
         SUM(x) AS t
  FROM daily GROUP BY event_type
),
curve AS (
  SELECT d.event_type, d.day, tt.n,
         SUM(d.x * tt.n - tt.t) OVER (
           PARTITION BY d.event_type ORDER BY d.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sc
  FROM daily d JOIN tot tt USING (event_type)
),
ranked AS (
  SELECT event_type, day, n, sc,
         row_number() OVER (
           PARTITION BY event_type ORDER BY abs(sc) DESC, day ASC) AS rk
  FROM curve
)
SELECT event_type,
       day AS changepoint_day,
       CASE WHEN sc < 0 THEN 'up' ELSE 'down' END AS shift_direction,
       round(CAST(abs(sc) AS DOUBLE) / n, 4) AS cusum_magnitude_r
FROM ranked WHERE rk = 1
"""


@register("revenue_changepoint", oracle=_CUSUM_ORACLE)
def revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type most-likely level-shift day of the daily revenue
    series: argmax |CUSUM| in the n-rescaled exact-integer spelling.
    A negative extreme means the series ran BELOW its mean up to the
    change point, i.e. the level shifted UP afterwards."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.sum(F.col("value").cast("decimal(18,2)")).alias("x")
    )
    return cusum_changepoint(daily)


def cusum_changepoint(daily: DataFrame) -> DataFrame:
    """Core scan over any (event_type, day, x:decimal) series — split
    out so tests can plant a known level shift."""
    tot = daily.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"), F.sum("x").alias("t")
    )
    cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    curve = daily.join(F.broadcast(tot), "event_type").withColumn(
        "sc", F.sum(F.col("x") * F.col("n") - F.col("t")).over(cum)
    )
    rk = F.row_number().over(
        Window.partitionBy("event_type").orderBy(F.abs("sc").desc(), F.asc("day"))
    )
    return (
        curve.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.col("day").alias("changepoint_day"),
            F.when(F.col("sc") < 0, "up").otherwise("down").alias("shift_direction"),
            F.round(F.abs("sc").cast("double") / F.col("n"), 4).alias(
                "cusum_magnitude_r"
            ),
        )
    )
