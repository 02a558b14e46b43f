"""Event-sequence analytics: conversion funnel and retention cohorts.

Beyond-reference user-behavior operators over the events table — the
analytics a pipeline team runs on the same event stream the reference
only counts (stream_processor.py:111-125 tracks per-customer activity
totals; it cannot answer "did the view lead to a click lead to a
purchase" or "how many of January's new users were still active in
March").

conversion_funnel — strictly-ordered stage progression per user
(view → click → purchase, each stage's event strictly after the prior
stage's). Plan: ONE groupBy(user_id) collecting each stage's sorted
timestamp array, then the funnel walk is pure scan-local array logic
(`filter(arr, t -> t > prev)[0]`) — no joins, no window sort, no
iterative passes; a user's cost is their event count. The wide
alternative (3-way self-join on user with range predicates) explodes on
power users; this shape is O(events) + one shuffle.

retention_cohorts — users bucketed by first-activity day (cohort), then
(cohort, day-offset) distinct-user counts. Two shuffles: min-ts per user
(map-side combined), then the cohort×offset count-distinct. The cohort
triangle is tiny (days × days); everything wide stays pre-aggregated.

Determinism: timestamps and day arithmetic are exact; offsets use
datediff on dates (UTC-pinned session, same as C8/C10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

STAGES = ("view", "click", "purchase")


_FUNNEL_ORACLE = """
WITH per_user AS (
  SELECT user_id,
         list(CASE WHEN event_type = 'view' THEN ts END ORDER BY ts)
           FILTER (event_type = 'view') AS views,
         list(CASE WHEN event_type = 'click' THEN ts END ORDER BY ts)
           FILTER (event_type = 'click') AS clicks,
         list(CASE WHEN event_type = 'purchase' THEN ts END ORDER BY ts)
           FILTER (event_type = 'purchase') AS purchases
  FROM events
  GROUP BY user_id
), walk AS (
  SELECT user_id,
         views[1] AS t_view,
         [t for t in clicks    if t > views[1]][1] AS t_click,
         [t for t in purchases if t > [t for t in clicks if t > views[1]][1]][1] AS t_purchase
  FROM per_user
)
SELECT user_id, t_view, t_click, t_purchase,
       CAST(CASE WHEN t_purchase IS NOT NULL THEN 3
                 WHEN t_click IS NOT NULL THEN 2
                 WHEN t_view IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS reached_stage
FROM walk
"""


@register("conversion_funnel", oracle=_FUNNEL_ORACLE)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user strict-order funnel walk over sorted per-stage timestamp
    arrays — the first click AFTER the first view, the first purchase
    AFTER that click. NULL stage timestamps mean the user never got
    there; reached_stage is the depth."""
    events = load_table(spark, sf_dir, "events")
    per_user = events.groupBy("user_id").agg(
        *[
            F.array_sort(
                F.collect_list(F.when(F.col("event_type") == s, F.col("ts")))
            ).alias(f"{s}s")
            for s in STAGES
        ]
    )
    t_view = F.expr("views[0]")
    t_click = F.expr("filter(clicks, t -> t > views[0])[0]")
    t_purchase = F.expr(
        "filter(purchases, t -> t > filter(clicks, t2 -> t2 > views[0])[0])[0]"
    )
    walk = per_user.select(
        "user_id",
        t_view.alias("t_view"),
        t_click.alias("t_click"),
        t_purchase.alias("t_purchase"),
    )
    return walk.withColumn(
        "reached_stage",
        F.when(F.col("t_purchase").isNotNull(), 3)
        .when(F.col("t_click").isNotNull(), 2)
        .when(F.col("t_view").isNotNull(), 1)
        .otherwise(0)
        .cast("bigint"),
    )


_COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM events GROUP BY user_id
)
SELECT f.cohort_day,
       datediff('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
       count(DISTINCT e.user_id) AS active_users
FROM events e JOIN firsts f ON e.user_id = f.user_id
GROUP BY 1, 2
"""


@register("retention_cohorts", oracle=_COHORT_ORACLE)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention triangle: first-activity day × day offset →
    distinct active users. The user→cohort map is the only joined state;
    events never join events."""
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    return (
        events.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias("day_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )
