"""SCD Type-2 history — the versioned-dimension view of the CDC stream.

The reference maintains only the *latest* state per entity (Redis
``customer:{id}`` upserts, cdc_processor.py:81-82 — our latest_state /
W10). The natural warehouse companion is the full slowly-changing-
dimension history: every change event becomes a version row with a
[valid_from, valid_to) interval, the open row being current state. This
is the standard CDC→lakehouse materialization (what a Debezium→Delta/
Hudi/Iceberg sink produces) and what time-travel joins ("state as of t")
read — the batch dual of operators/asof.py.

Uses the FIXTURES §3 stand-in mapping (events table = CDC stream,
user_id = entity key, event_type = op, value = payload).

Plan shape: ONE window over (PARTITION BY user_id ORDER BY ts, event_id)
computing lead(ts), row_number, and the is_current flag in a single pass
— one hash shuffle on the entity key, no joins, no state beyond the
window sort. At 100 TB this partitions by key exactly like the
latest-state dedup; versions of one entity are co-located, so a
downstream as-of lookup joins shuffle-free if both sides are bucketed by
the key (catalog.write_bucketed).

Determinism: (ts, event_id) total order per entity — same tiebreak rule
as the CDC merge (operators/cdc.py W10).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_SCD2_ORACLE = """
SELECT user_id,
       event_id,
       event_type AS op,
       value,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       CAST(row_number() OVER w AS BIGINT) AS version_num,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


@register("scd2_history", oracle=_SCD2_ORACLE)
def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id",
        "event_id",
        F.col("event_type").alias("op"),
        "value",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
        F.row_number().over(w).cast("bigint").alias("version_num"),
        F.lead("ts").over(w).isNull().alias("is_current"),
    )
