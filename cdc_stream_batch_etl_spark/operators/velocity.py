"""Trailing-window velocity — per-event rate over a value-based frame.

The anomaly family (operators/anomalies.py W6-W9) thresholds fixed
tumbling windows; fraud/abuse velocity checks need the TRAILING window
anchored at each event ("how many events did this user fire in the 60
minutes ending now"), which tumbling windows systematically miss at
boundaries. This is Spark's RANGE window frame — the one window surface
(value-based frames, vs the ROWS frames used everywhere else in the
engine) no other operator exhibits.

Semantics: for every event, the count and exact-decimal value sum of
the SAME user's events with ts in [ts - 1h, ts], plus a burst flag at
BURST_N. RANGE frames are defined on the ORDER-BY VALUE, so rows tied
on ts all see each other regardless of physical position — identical
tie semantics in Spark and DuckDB, which is what makes a per-row
value-frame query hash-exact cross-engine (a ROWS spelling would be
tie-order-dependent).

Determinism: the frame bound is exact integer microseconds on
unix_micros(ts); sums ride DECIMAL(18,2) (functions/money.py).

Scale: one shuffle on user_id; the running frame is maintained
incrementally per partition (Spark's WindowExec sliding frame — each
row enters/leaves the accumulator once, O(1) amortized per row, state
bounded by events-per-user-hour). Output is corpus-sized (a per-event
annotation — the rolling_median_value class); the hot-key note there
applies unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

WINDOW_US = 3_600_000_000  # trailing hour, inclusive
BURST_N = 5

_VELOCITY_ORACLE = f"""
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS n_trailing,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
         AS trailing_value,
       CAST(count(*) OVER w >= {BURST_N} AS INT) AS is_burst
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
             RANGE BETWEEN {WINDOW_US} PRECEDING AND CURRENT ROW)
"""


@register("trailing_window_rate", oracle=_VELOCITY_ORACLE)
def trailing_window_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event trailing-hour event count / value sum for the event's
    user (RANGE frame on exact µs), with a burst flag at BURST_N."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-WINDOW_US, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("bigint").alias("n_trailing"),
        F.sum(F.col("value").cast("decimal(18,2)"))
        .over(w)
        .cast("double")
        .alias("trailing_value"),
        (F.count("*").over(w) >= BURST_N).cast("int").alias("is_burst"),
    )
