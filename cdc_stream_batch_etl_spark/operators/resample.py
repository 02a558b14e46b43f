"""Calendar resample + gap fill — dense daily series with forward fill.

Reference anchor: the reference's batch layer materializes per-day
aggregates straight from SQL (airflow_etl_utils.py's daily GROUP BY
shapes) and its Redis "latest" keys implicitly carry the last observed
value forward between updates. A real analytics engine needs the
explicit operator: resample an event stream onto a dense calendar so
downstream consumers (charting, forecasting, SLA math, training-data
time features) never special-case missing days. This is the batch twin
of that carry-forward semantics (beyond-reference; SURVEY §2.6 window
family).

Semantics: one row per (event_type, day) over the GLOBAL [min, max]
event-date span — aligned series, same grid for every key:
  - ``revenue``          day's DECIMAL(18,2) sum (0.00 when inactive),
  - ``active``           1 if the key had any event that day,
  - ``carried_revenue``  forward fill: the most recent active day's
                         revenue at-or-before this day (0.0 before the
                         key's first activity),
  - ``days_since_active`` staleness: days since the last active day
                         (0 on active days; -1 before first activity).

Determinism (full DuckDB oracle): money sums go through DECIMAL(18,2)
(functions/money.py convention) so parallel agg order cannot perturb
them. Forward fill is the engine-portable two-window spelling — a
cumulative COUNT of non-null daily rows assigns each gap run a group id
(``grp``), and MAX over (key, grp) propagates the run's single non-null
head value — identical semantics in Spark and DuckDB, no reliance on
IGNORE NULLS window support. Staleness is a cumulative MAX of active
days. All windows order by ``day`` (unique per key) — no ties anywhere.

Scale: the dense grid is |event_types| x |days| rows — calendar-sized,
invariant to corpus row count (100 TB of events over 3 years x 100
types is a 110k-row grid). The only corpus-sized work is ONE hash
aggregation onto (event_type, day), which Spark executes with map-side
partial aggregation; every window after it runs on the calendar-sized
frame (broadcast-joined against the grid), partitioned by event_type
with at most |days| rows per partition. Nothing here is proportional
to the raw event count past the first shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_RESAMPLE_ORACLE = """
WITH bounds AS (
  SELECT CAST(min(ts) AS DATE) AS d0, CAST(max(ts) AS DATE) AS d1 FROM events
),
grid AS (
  SELECT t.event_type, CAST(d.day AS DATE) AS day
  FROM (SELECT DISTINCT event_type FROM events) t
  CROSS JOIN (
    SELECT unnest(generate_series(b.d0, b.d1, INTERVAL 1 DAY)) AS day
    FROM bounds b
  ) d
),
daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS rev
  FROM events GROUP BY 1, 2
),
j AS (
  SELECT g.event_type, g.day, d.rev,
         count(d.rev) OVER (
           PARTITION BY g.event_type ORDER BY g.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp,
         max(CASE WHEN d.rev IS NOT NULL THEN g.day END) OVER (
           PARTITION BY g.event_type ORDER BY g.day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_active
  FROM grid g LEFT JOIN daily d
    ON d.event_type = g.event_type AND d.day = g.day
)
SELECT event_type, day,
       COALESCE(rev, 0.0e0) AS revenue,
       CAST(CASE WHEN rev IS NOT NULL THEN 1 ELSE 0 END AS INT) AS active,
       COALESCE(max(rev) OVER (PARTITION BY event_type, grp), 0.0e0)
         AS carried_revenue,
       CAST(COALESCE(date_diff('day', last_active, day), -1) AS BIGINT)
         AS days_since_active
FROM j
ORDER BY event_type, day
"""


@register("gap_filled_daily_revenue", oracle=_RESAMPLE_ORACLE)
def gap_filled_daily_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense (event_type, day) daily revenue over the global event span,
    with forward-filled carry and staleness counters on gap days."""
    return resample_daily(load_table(spark, sf_dir, "events"))


def resample_daily(ev: DataFrame) -> DataFrame:
    """Core resample over any frame with (event_type, ts, value) columns
    — split out so tests can plant sparse series that exercise the gap
    runs (the driver testdata is dense at small SF)."""
    # ONE corpus scan: the daily hash-agg. Types and date bounds are then
    # derived from the agg's calendar-sized output (an active key has by
    # definition at least one daily row; the global span is the min/max of
    # active days), so no second pass over raw events exists anywhere in
    # the plan. The persist is bounded at |types| x |days| rows — a cache
    # a caller can always afford (bench.py clearCache()s between queries,
    # the established contract for the persist-reuse operators).
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("rev"))
        .persist()
    )
    bounds = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    # |types| x |days| grid: calendar-sized, broadcast both inputs.
    grid = (
        daily.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
        )
    )

    cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = (
        grid.join(daily, ["event_type", "day"], "left")
        .withColumn("grp", F.count("rev").over(cum))
        .withColumn(
            "last_active",
            F.max(F.when(F.col("rev").isNotNull(), F.col("day"))).over(cum),
        )
    )
    return (
        j.withColumn(
            "carried_revenue",
            F.coalesce(
                F.max("rev").over(Window.partitionBy("event_type", "grp")),
                F.lit(0.0),
            ),
        )
        .select(
            "event_type",
            "day",
            F.coalesce("rev", F.lit(0.0)).alias("revenue"),
            F.when(F.col("rev").isNotNull(), 1).otherwise(0).cast("int").alias("active"),
            "carried_revenue",
            F.coalesce(F.datediff("day", "last_active"), F.lit(-1))
            .cast("bigint")
            .alias("days_since_active"),
        )
        .orderBy("event_type", "day")
    )
