"""Rolling exact quantile — per-entity sliding-window median.

The reference's stream processor keeps a per-entity ``deque(maxlen=N)``
of recent values and recomputes summary stats over it per event
(/root/reference/python/stream_processor.py:26-31,88-97 — the buffer
pattern behind its rolling averages). The engine generalizes that to an
ORDER-STATISTIC over the same sliding frame: the rolling median, the
robust centre anomaly detectors want (operators/mad.py is the global
batch version; this is its per-entity sliding twin).

Semantics: for every event, the median of the entity's last
``WINDOW_N`` values in (ts, event_id) order; emitted only for FULL
windows (the first WINDOW_N-1 events per entity have no defined
WINDOW_N-median).

Determinism (full DuckDB oracle): WINDOW_N is odd, so the median is an
EXACT element — sort the 5-element frame, take position 3. No
interpolation arithmetic exists to diverge between engines; ordering
ties are impossible because (ts, event_id) is unique per row. Both
engines spell it identically: windowed list collect → sort → index.

Scale: a ROWS-bounded frame (4 PRECEDING .. CURRENT) means the window
operator holds at most WINDOW_N values per in-flight row — O(1) state,
streamed in one pass per partition after ONE shuffle on user_id. The
per-entity series is processed sequentially (inherent to any ordered
per-key scan); a pathologically hot key serializes its own series only
— the standard mitigation (sub-bucketing the key by coarse time range,
then stitching boundaries) composes on top without changing this
operator. Output is corpus-sized minus the warmup rows; nothing
collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: Sliding frame length — MUST stay odd so the median is an exact
#: element (see Determinism above).
WINDOW_N = 5

_ROLLING_ORACLE = f"""
WITH w AS (
  SELECT event_id, user_id, value,
         list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN {WINDOW_N - 1} PRECEDING AND CURRENT ROW) AS win
  FROM events
)
SELECT event_id, user_id,
       list_sort(win)[{(WINDOW_N + 1) // 2}] AS rolling_median
FROM w
WHERE len(win) = {WINDOW_N}
"""


@register("rolling_median_value", oracle=_ROLLING_ORACLE)
def rolling_median_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling median of ``value`` over the last {WINDOW_N}
    events in (ts, event_id) order; full windows only."""
    ev = load_table(spark, sf_dir, "events")
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-(WINDOW_N - 1), Window.currentRow)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.collect_list("value").over(frame).alias("win"),
        )
        .filter(F.size("win") == WINDOW_N)
        .select(
            "event_id",
            "user_id",
            F.element_at(F.array_sort("win"), (WINDOW_N + 1) // 2).alias(
                "rolling_median"
            ),
        )
    )
