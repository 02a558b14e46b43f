"""As-of (most-recent-prior) join — purchase attribution over the event
stream.

Beyond-reference operator (SURVEY.md §2.3 notes the reference has no
range/as-of joins; its closest analog is the stream-side latest-state
lookup J4, cdc_processor.py:81-82 — "enrich this event with the newest
state I've seen for its key"). The batch formulation: attribute every
non-purchase event to the same user's most recent prior-or-simultaneous
purchase.

Spark has no ASOF JOIN operator, and the naive spelling — a range
theta-join (`e.user_id = p.user_id AND e.ts >= p.ts`) + row_number — is a
BroadcastNestedLoop/cartesian blowup at scale (every event × every prior
purchase of that user). The scalable shape used here is the union-window
pattern:

  1. tag purchases (kind 0) and target events (kind 1) with a common
     schema and UNION them — no join at all;
  2. one window over (PARTITION BY user_id ORDER BY ts, kind) carrying
     ``last(purchase_*, ignoreNulls=true)`` — each target row picks up the
     latest purchase at-or-before its timestamp (kind 0 sorts first at
     equal ts, making the join inclusive, matching ASOF's ``e.ts >= p.ts``);
  3. filter back to kind 1.

Cost: exactly ONE hash shuffle on user_id + one sort — the same price as
a co-partitioned merge join, with no range explosion and no skew
amplification (a user with P purchases and E events costs P+E rows, not
P×E). At 100 TB this is the canonical event-attribution plan; the window
state is O(1) per key (only the running last purchase is carried).

Determinism: (user_id, ts) is unique in the testdata; the window order
adds event_id as a final tiebreak so equal-timestamp purchases would
resolve to max event_id in either engine.

Oracle: DuckDB's native ASOF LEFT JOIN — an independent implementation of
the same semantics (not a transliteration of the Spark plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_ASOF_ORACLE = """
SELECT e.event_id,
       e.user_id,
       e.ts,
       e.event_type,
       e.value,
       p.event_id AS purchase_event_id,
       p.value AS purchase_value,
       p.ts AS purchase_ts,
       epoch_us(e.ts) - epoch_us(p.ts) AS micros_since_purchase
FROM (SELECT * FROM events WHERE event_type <> 'purchase') e
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON e.user_id = p.user_id AND e.ts >= p.ts
"""


@register("asof_purchase_attribution", oracle=_ASOF_ORACLE)
def asof_purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")

    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("event_id"),
        F.lit(None).cast("string").alias("event_type"),
        F.lit(None).cast("double").alias("value"),
        F.col("event_id").alias("p_event_id"),
        F.col("value").alias("p_value"),
        F.col("ts").alias("p_ts"),
    )
    targets = ev.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        "event_id",
        "event_type",
        "value",
        F.lit(None).cast("long").alias("p_event_id"),
        F.lit(None).cast("double").alias("p_value"),
        F.lit(None).cast("timestamp").alias("p_ts"),
    )

    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind", "p_event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = purchases.unionByName(targets).select(
        "*",
        F.last("p_event_id", ignorenulls=True).over(w).alias("purchase_event_id"),
        F.last("p_value", ignorenulls=True).over(w).alias("purchase_value"),
        F.last("p_ts", ignorenulls=True).over(w).alias("purchase_ts"),
    )
    return carried.filter(F.col("kind") == 1).select(
        "event_id",
        "user_id",
        F.col("t").alias("ts"),
        "event_type",
        "value",
        "purchase_event_id",
        "purchase_value",
        "purchase_ts",
        (F.unix_micros(F.col("t")) - F.unix_micros(F.col("purchase_ts"))).alias(
            "micros_since_purchase"
        ),
    )
