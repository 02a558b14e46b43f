"""Trailing-7-day exact distinct users per day (the DAU/WAU report) —
sliding-window COUNT(DISTINCT), the classic op that window functions
cannot express (COUNT(DISTINCT) OVER a RANGE frame is unsupported in
both engines) and naive plans re-scan 7× (beyond-reference, SURVEY
§2.11 analytics family next to daily_revenue_rolling7, which slides a
SUM — an invertible monoid; distinct is not invertible, hence this
shape).

Plan — the bounded-explode contribution pattern: collapse the fact
table to DISTINCT (user, day) pairs first (one hash agg with map-side
partials — at 100 TB this is the 1000×-smaller frame everything else
touches), then each user-day contributes to exactly 7 target days
(date_add 0..6 — a constant ×7 expansion of the COLLAPSED frame, not
the fact table), then one agg per target day counts distinct users.
users_1d rides along as the offset-0 conditional distinct, and
stickiness = DAU/WAU — the ratio product teams actually watch — is an
exact small-int division. Target days past the observed maximum are
clipped (ramp-out days would report partial windows); the max-day
scalar joins in as a broadcast single row, never a driver collect.

No range join, no day-spine cross join, no 7× re-scan: the window
"slides" by addition on the collapsed frame. The same shape scales to
trailing-28 MAU by changing one constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

WINDOW_DAYS = 7

_ROLLING_DAU_ORACLE = f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
mx AS (SELECT max(day) AS max_day FROM ud),
contrib AS (
  SELECT user_id, day + CAST(o AS INTEGER) AS tday, o
  FROM ud CROSS JOIN (SELECT unnest(range({WINDOW_DAYS})) AS o)
)
SELECT c.tday AS day,
       count(DISTINCT c.user_id) FILTER (WHERE c.o = 0) AS users_1d,
       count(DISTINCT c.user_id) AS users_7d,
       CAST(count(DISTINCT c.user_id) FILTER (WHERE c.o = 0) AS DOUBLE)
         / count(DISTINCT c.user_id) AS stickiness
FROM contrib c CROSS JOIN mx
WHERE c.tday <= mx.max_day
GROUP BY 1
ORDER BY 1
"""


@register("rolling_distinct_users", oracle=_ROLLING_DAU_ORACLE)
def rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(day, users_1d, users_7d, stickiness) — exact distinct users in
    [day-6, day] for every day up to the last observed activity day."""
    events = load_table(spark, sf_dir, "events")
    ud = events.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    mx = ud.agg(F.max("day").alias("max_day"))
    contrib = ud.select(
        "user_id",
        F.explode(F.array(*[F.lit(o) for o in range(WINDOW_DAYS)])).alias("o"),
        "day",
    ).select("user_id", "o", F.expr("date_add(day, o)").alias("tday"))
    # two-level distinct: collapse to one row per (target day, user)
    # first (min(o)=0 marks "active ON the day itself"), then a plain
    # agg — no multi-distinct Expand (3x row blowup), two clean
    # hash-partial aggs instead
    per_user_day = (
        contrib.join(F.broadcast(mx), contrib.tday <= mx.max_day)
        .groupBy("tday", "user_id")
        .agg(F.min("o").alias("min_o"))
    )
    users_1d = F.count(F.when(F.col("min_o") == 0, 1))
    users_7d = F.count("*")
    return (
        per_user_day.groupBy(F.col("tday").alias("day"))
        .agg(
            users_1d.alias("users_1d"),
            users_7d.alias("users_7d"),
            (users_1d.cast("double") / users_7d).alias("stickiness"),
        )
        .orderBy("day")
    )
