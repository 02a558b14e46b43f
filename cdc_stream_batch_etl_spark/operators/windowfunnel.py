"""Strict ordered window funnel — max view→click→purchase depth per
user within a 24 h window of the anchor view.

conversion_funnel (operators/funnel.py) counts step REACH
(unordered, unwindowed); the product question it can't answer is
ClickHouse-windowFunnel parity: "did the user view, THEN click, THEN
purchase, all within W of the first step?" — chain strictly ordered,
span bounded by the anchor. The naive spelling is an EXISTS triple
self-join (quadratic-to-cubic per user); this module is the O(n)
windowed DP:

  lv  = latest view BEFORE this row           (running max — only rows
        strictly earlier in (ts, event_id) order enter the frame)
  a2  = at a click: lv, if (ts − lv) ≤ W      (the click completes a
        valid 2-chain anchored at lv — the LATEST view is the optimal
        anchor: any other valid anchor is earlier, so it has no more
        slack for the remaining steps)
  m2  = latest a2 BEFORE this row             (best 2-chain anchor
        available so far — max anchor == max remaining slack)
  l3  = at a purchase: (ts − m2) ≤ W

Maximizing the anchor at every level makes the greedy exact: a level-k
chain exists iff the max-anchor DP finds one (exchange argument —
replacing any chain's anchor with a later valid one preserves all
window constraints). Pinned against a brute-force chain enumeration on
planted paths in tests/test_windowfunnel.py (span exactly W, steps out of
order, anchor reuse across users).

Strictness ties: "before" is the lexicographic (ts, event_id) order,
so same-timestamp events have a deterministic order in both engines
(ClickHouse uses ts alone, which is nondeterministic under ties — a
documented deviation).

Determinism: all comparisons on integer epoch-µs; no floats anywhere.

Scale: ONE hash exchange on user_id; both running maxima ride the same
sort (UNBOUNDED PRECEDING frames — rows only enter, O(n), the frame
class rule from pareto.py). State per user is two scalars, so the
partition never materializes beyond the sort. Output is ≤ 4 rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: funnel window: 24 h in epoch microseconds
FUNNEL_W_US = 24 * 3600 * 1_000_000

_FUNNEL_ORACLE = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_us(ts) AS tu, event_type FROM events
),
w1 AS (
  SELECT *,
         max(CASE WHEN event_type = 'view' THEN tu END) OVER
           (PARTITION BY user_id ORDER BY tu, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS lv
  FROM e
),
w2 AS (
  SELECT *,
         CASE WHEN event_type = 'click' AND lv IS NOT NULL
                   AND tu - lv <= {FUNNEL_W_US} THEN lv END AS a2
  FROM w1
),
w3 AS (
  SELECT *,
         max(a2) OVER
           (PARTITION BY user_id ORDER BY tu, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS m2
  FROM w2
),
per_user AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS l1,
         max(CASE WHEN a2 IS NOT NULL THEN 1 ELSE 0 END) AS l2,
         max(CASE WHEN event_type = 'purchase' AND m2 IS NOT NULL
                       AND tu - m2 <= {FUNNEL_W_US} THEN 1 ELSE 0 END) AS l3
  FROM w3 GROUP BY user_id
)
SELECT CAST(CASE WHEN l3 = 1 THEN 3 WHEN l2 = 1 THEN 2
                 WHEN l1 = 1 THEN 1 ELSE 0 END AS BIGINT) AS funnel_level,
       CAST(count(*) AS BIGINT) AS n_users
FROM per_user
GROUP BY 1
ORDER BY funnel_level
"""


@register("window_funnel_levels", oracle=_FUNNEL_ORACLE)
def window_funnel_levels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users by deepest strictly-ordered view→click→purchase chain
    completed within 24 h of the anchor view."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.unix_micros("ts").alias("tu"), "event_type"
    )
    return funnel_levels(ev)


def funnel_levels(ev: DataFrame, window_us: int = FUNNEL_W_US) -> DataFrame:
    """Core windowed-DP funnel over (user_id, event_id, tu, event_type)
    — split out so tests can plant exact chains and compare against
    brute-force enumeration."""
    before = (
        Window.partitionBy("user_id")
        .orderBy("tu", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lv = F.max(F.when(F.col("event_type") == "view", F.col("tu"))).over(before)
    staged = ev.withColumn(
        "a2",
        F.when(
            (F.col("event_type") == "click")
            & lv.isNotNull()
            & (F.col("tu") - lv <= window_us),
            lv,
        ),
    )
    m2 = F.max("a2").over(before)
    per_user = (
        staged.withColumn("m2", m2)
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "view", 1).otherwise(0)).alias("l1"),
            F.max(F.when(F.col("a2").isNotNull(), 1).otherwise(0)).alias("l2"),
            F.max(
                F.when(
                    (F.col("event_type") == "purchase")
                    & F.col("m2").isNotNull()
                    & (F.col("tu") - F.col("m2") <= window_us),
                    1,
                ).otherwise(0)
            ).alias("l3"),
        )
    )
    level = (
        F.when(F.col("l3") == 1, 3)
        .when(F.col("l2") == 1, 2)
        .when(F.col("l1") == 1, 1)
        .otherwise(0)
        .cast("bigint")
    )
    return (
        per_user.select(level.alias("funnel_level"))
        .groupBy("funnel_level")
        .agg(F.count("*").cast("bigint").alias("n_users"))
        .orderBy("funnel_level")
    )
