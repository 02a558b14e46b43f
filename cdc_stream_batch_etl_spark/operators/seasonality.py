"""Weekday seasonality — revenue-weighted day-of-week indexes.

chisq_independence screens COUNT independence; planners want the
revenue-weighted version: "Tuesday runs at 0.93× the average day".
The index per (event_type, weekday) is

    idx = (cents_wd / days_wd) / (cents_total / days_total)
        = (cents_wd · days_total) / (days_wd · cents_total)

where days_wd counts the DISTINCT active dates of that weekday (so a
corpus spanning partial weeks doesn't bias the denominator). The
second form is the one computed: an exact BIGINT numerator and
denominator (cents × day-counts), then ONE float division per row,
round 6 — no float accumulation anywhere.

Scale: one corpus hash-agg onto (type, date) [exact cents per day],
then everything runs on the calendar-sized frame: a (type, weekday)
re-agg and window totals over |types|×7 rows. The resample.py class.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_SEASON_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
wd AS (
  SELECT event_type, CAST(isodow(day) AS INT) AS weekday,
         CAST(SUM(cents) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS days_active
  FROM daily GROUP BY 1, 2
),
tot AS (
  SELECT *,
         SUM(cents) OVER (PARTITION BY event_type) AS cents_total,
         SUM(days_active) OVER (PARTITION BY event_type) AS days_total
  FROM wd
)
SELECT event_type, weekday, cents, days_active,
       round(CAST(cents * days_total AS DOUBLE)
             / (CAST(days_active AS DOUBLE) * cents_total), 6)
         AS seasonality_r
FROM tot
ORDER BY event_type, weekday
"""


@register("weekday_seasonality", oracle=_SEASON_ORACLE)
def weekday_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (event_type, ISO weekday): exact cents, active-day count and
    the revenue-per-active-day index vs the type's average day."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("cents")
    )
    wd = daily.groupBy(
        "event_type",
        (F.weekday("day") + 1).cast("int").alias("weekday"),
    ).agg(
        F.sum("cents").cast("bigint").alias("cents"),
        F.count("*").cast("bigint").alias("days_active"),
    )
    grp = Window.partitionBy("event_type")
    tot = wd.select(
        "event_type",
        "weekday",
        "cents",
        "days_active",
        F.sum("cents").over(grp).alias("cents_total"),
        F.sum("days_active").over(grp).alias("days_total"),
    )
    return tot.select(
        "event_type",
        "weekday",
        "cents",
        "days_active",
        F.round(
            (F.col("cents") * F.col("days_total")).cast("double")
            / (F.col("days_active").cast("double") * F.col("cents_total")),
            6,
        ).alias("seasonality_r"),
    ).orderBy("event_type", "weekday")
