"""Event-transition profile — the first-order Markov view of user
behavior streams.

Funnel analysis (operators/funnel.py) asks "did the user reach stage
k?"; the transition matrix asks the dual: FROM each event type, where
do users go next, and with what probability? Product analytics,
session-abandonment models, and synthetic-trace generators all consume
exactly this (prev, next, count, probability) table.

Ordering: transitions pair each event with the user's next event by
(ts, event_id) — the event_id tiebreak makes same-timestamp ordering
deterministic in both engines (the repo-wide total-order rule). The
probability is one integer/integer division per row — engine-exact.

Plan shape at 100 TB: lead() over a user-keyed window is ONE shuffle on
user_id with an in-partition sort (the user_sessions class); the
(prev, next) aggregate that follows is a tiny-cardinality hash-agg with
map-side combine. No self-join — the classic quadratic mistake for
transition counting is events⋈events on adjacency, which this spelling
never materializes.

Reference anchor: beyond-reference (the reference's analytics stop at
per-type counts, ref python/etl_stream.py); composes with
operators/funnel.py and sessions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), pairs AS (
  SELECT event_type AS prev_type, next_type, count(*) AS n_transitions
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type,
       CAST(n_transitions AS BIGINT) AS n_transitions,
       CAST(n_transitions AS DOUBLE)
         / sum(n_transitions) OVER (PARTITION BY prev_type) AS p_transition
FROM pairs
"""


@register("event_transitions", oracle=_ORACLE)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prev_type, next_type, n_transitions, p_transition): the user-level
    first-order transition matrix of the events stream."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.groupBy(
        F.col("event_type").alias("prev_type"), "next_type"
    ).agg(F.count("*").alias("n_transitions"))
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wp)
        ).alias("p_transition"),
    )
