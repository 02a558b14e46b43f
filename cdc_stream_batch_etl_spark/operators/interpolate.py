"""Linear interpolation over calendar gaps — two-sided resample.

gap_filled_daily_revenue (operators/resample.py) carries the LAST
observation forward; forecasting and feature pipelines usually want
the linearly interpolated series instead — each missing day valued on
the straight line between its nearest active neighbours. This is the
two-sided twin: a backward fill joins the forward fill, and the gap
day's value is

    (prev_cents·(next_day − day) + next_cents·(day − prev_day))
    / (next_day − prev_day)

Determinism: daily revenue rides exact integer cents; the numerator is
pure BIGINT arithmetic; exactly ONE float division (then round 6) per
gap day — no float accumulation, no sum-order hazard, hash-exact vs
DuckDB. Edge days (before first / after last activity) are explicit
'edge' rows with NULL value, never silently extrapolated.

Fill spelling (engine-portable, no IGNORE NULLS): cumulative COUNT of
active rows assigns each gap run a group id; MAX over (key, grp)
propagates the run head's cents — same idiom as resample.py, applied
once per direction (the backward pass is the same two windows on a
descending ROWS frame).

Scale: identical profile to resample.py — ONE corpus-sized hash agg
onto (event_type, day); every window after it runs on the
calendar-sized grid (|types| × |days|, invariant to corpus rows),
partitioned by event_type. The backward pass is spelled as a
DESCENDING cumulative frame, not CURRENT ROW..UNBOUNDED FOLLOWING:
Spark's unbounded-following frame recomputes its aggregate per row
(O(n²) — the class pareto.py measured at 254 s on a data-sized
partition), while the reversed cumulative frame is incremental. Here
partitions are calendar-sized so either survives, but the engine-wide
design rule (operators/pareto.py) is: aggregates never ride UNBOUNDED
FOLLOWING frames. Cost: a second bucket-local sort of the tiny grid,
one exchange total for all four windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_INTERP_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
  FROM events GROUP BY 1, 2
),
bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
grid AS (
  SELECT t.event_type, CAST(d.day AS DATE) AS day
  FROM (SELECT DISTINCT event_type FROM daily) t
  CROSS JOIN (
    SELECT unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS day
    FROM bounds b
  ) d
),
j AS (
  SELECT g.event_type, g.day, d.cents,
         count(d.cents) OVER (PARTITION BY g.event_type ORDER BY g.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gf,
         max(CASE WHEN d.cents IS NOT NULL THEN g.day END)
           OVER (PARTITION BY g.event_type ORDER BY g.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
         count(d.cents) OVER (PARTITION BY g.event_type ORDER BY g.day DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gb,
         min(CASE WHEN d.cents IS NOT NULL THEN g.day END)
           OVER (PARTITION BY g.event_type ORDER BY g.day DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS next_day
  FROM grid g LEFT JOIN daily d
    ON d.event_type = g.event_type AND d.day = g.day
),
f AS (
  SELECT *,
         max(cents) OVER (PARTITION BY event_type, gf) AS prev_cents,
         max(cents) OVER (PARTITION BY event_type, gb) AS next_cents
  FROM j
)
SELECT event_type, day,
       CAST(CASE WHEN cents IS NOT NULL THEN 1 ELSE 0 END AS INT) AS active,
       CASE
         WHEN cents IS NOT NULL THEN 'observed'
         WHEN prev_day IS NULL OR next_day IS NULL THEN 'edge'
         ELSE 'interp'
       END AS method,
       round(CASE
         WHEN cents IS NOT NULL THEN CAST(cents AS DOUBLE) / 100
         WHEN prev_day IS NULL OR next_day IS NULL THEN NULL
         ELSE CAST(prev_cents * date_diff('day', day, next_day)
                   + next_cents * date_diff('day', prev_day, day) AS DOUBLE)
              / (date_diff('day', prev_day, next_day) * 100)
       END, 6) AS value_r
FROM f
ORDER BY event_type, day
"""


@register("interpolated_daily_revenue", oracle=_INTERP_ORACLE)
def interpolated_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (event_type, day) daily revenue with gap days linearly
    interpolated between nearest active neighbours (exact cents)."""
    return interpolate_daily(load_table(spark, sf_dir, "events"))


def interpolate_daily(ev: DataFrame) -> DataFrame:
    """Core interpolation over any (event_type, ts, value) frame — split
    out so tests can plant sparse series (driver testdata is dense at
    small SF, so the 'interp'/'edge' branches need planted holes)."""
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            (F.sum(F.col("value").cast("decimal(18,2)")) * 100)
            .cast("bigint")
            .alias("cents")
        )
        .persist()  # calendar-sized; caller-must-clear, resample.py contract
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    grid = (
        daily.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    bwd = (
        Window.partitionBy("event_type")
        .orderBy(F.desc("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    active_day = F.when(F.col("cents").isNotNull(), F.col("day"))
    j = (
        grid.join(daily, ["event_type", "day"], "left")
        .withColumn("gf", F.count("cents").over(fwd))
        .withColumn("prev_day", F.max(active_day).over(fwd))
        .withColumn("gb", F.count("cents").over(bwd))
        .withColumn("next_day", F.min(active_day).over(bwd))
    )
    f = j.withColumn(
        "prev_cents",
        F.max("cents").over(Window.partitionBy("event_type", "gf")),
    ).withColumn(
        "next_cents",
        F.max("cents").over(Window.partitionBy("event_type", "gb")),
    )
    num = F.col("prev_cents") * F.datediff(
        F.col("next_day"), F.col("day")
    ) + F.col("next_cents") * F.datediff(F.col("day"), F.col("prev_day"))
    den = F.datediff(F.col("next_day"), F.col("prev_day")) * 100
    edge = F.col("prev_day").isNull() | F.col("next_day").isNull()
    return f.select(
        "event_type",
        "day",
        F.col("cents").isNotNull().cast("int").alias("active"),
        F.when(F.col("cents").isNotNull(), F.lit("observed"))
        .when(edge, F.lit("edge"))
        .otherwise(F.lit("interp"))
        .alias("method"),
        F.round(
            F.when(
                F.col("cents").isNotNull(),
                F.col("cents").cast("double") / 100,
            )
            .when(edge, F.lit(None).cast("double"))
            .otherwise(num.cast("double") / den),
            6,
        ).alias("value_r"),
    ).orderBy("event_type", "day")
