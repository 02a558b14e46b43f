"""Top event paths — most common 3-step user journeys.

event_transitions (operators/markov.py) gives the first-order
transition matrix; product analytics asks the higher-order question —
"what are the most-travelled 3-step paths?" — which a bigram matrix
cannot answer (it forgets where the walk came from). One lead()-pair
per event turns each user's timeline into overlapping trigrams; the
global top-20 is the journey report.

Determinism: the per-user ordering is (ts, event_id) — event_id is
unique, so lead() sees one canonical sequence even under timestamp
ties, in both engines. The final top-20 orders by (n DESC, path ASC),
so boundary ties cut identically. Pure integer counts.

Scale: ONE shuffle on user_id (the window); lead is O(1) per row with
state bounded at 2 rows. The trigram hash-agg partial-aggregates
map-side; the top-20 is Spark's TakeOrdered (per-partition heaps + a
20-row driver merge — no global sort ever materializes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

TOP_N = 20

_PATHS_ORACLE = f"""
WITH seq AS (
  SELECT user_id, event_type AS step1,
         lead(event_type, 1) OVER w AS step2,
         lead(event_type, 2) OVER w AS step3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT step1, step2, step3, CAST(count(*) AS BIGINT) AS n
FROM seq
WHERE step3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY n DESC, step1, step2, step3
LIMIT {TOP_N}
"""


@register("top_event_paths", oracle=_PATHS_ORACLE)
def top_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-{TOP_N} 3-step event-type paths over per-user
    (ts, event_id)-ordered timelines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("step1"),
        F.lead("event_type", 1).over(w).alias("step2"),
        F.lead("event_type", 2).over(w).alias("step3"),
    ).filter(F.col("step3").isNotNull())
    return (
        seq.groupBy("step1", "step2", "step3")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.desc("n"), "step1", "step2", "step3")
        .limit(TOP_N)
    )
