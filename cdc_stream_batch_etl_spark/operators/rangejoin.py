"""Interval (range) join via time-bucketing — purchase context windows.

Beyond-reference operator (SURVEY.md §2.3: the reference has no range
joins; its nearest shape is the per-event latest-state lookup,
cdc_processor.py:81-82). The batch question answered here: for every
purchase event, how much same-user activity happened in the hour leading
up to it — the feature a fraud/attribution model reads.

The naive spelling is a theta join
(``o.user_id = p.user_id AND o.ts BETWEEN p.ts - 1h AND p.ts``); Spark
executes the equi-part as a hash join and the range as a *post-join
filter*, so a heavy user with P purchases and E events materializes P×E
intermediate rows before filtering — quadratic in the hot key at 100 TB.

The scalable shape is the bucketed interval join:

1. truncate the probe side's timestamp to the bucket size (1 hour —
   chosen = the window length, so any window overlaps exactly 2 buckets);
2. explode each purchase into its 2 covering buckets (``date_trunc`` of
   window start and end — always distinct, since truncation commutes
   with whole-hour shifts);
3. equi-join on ``(user_id, bucket)`` — the range becomes part of the
   SHUFFLE KEY, so the per-key fan-out is bounded by one hour of that
   user's events, not their lifetime history;
4. apply the exact range predicate post-join (cheap: candidates are
   already within ±1 bucket), then hash-aggregate per purchase.

Cost: one shuffle keyed (user_id, hour) at 2× the purchase row count +
one aggregate — skew bounded by events-per-user-per-hour. This is the
standard re-expression of Databricks' range-join bin optimization as
plain DataFrame ops.

Determinism: the context sum runs in DECIMAL(18,2) (functions/money.py)
so both engines produce bit-identical doubles.

Oracle: DuckDB runs the naive theta join — an independent spelling of
the same semantics, not a transliteration of the bucketed plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.money import dsum
from ..registry import register

_CTX_ORACLE = """
WITH p AS (
  SELECT event_id AS purchase_id, user_id, ts AS p_ts
  FROM events WHERE event_type = 'purchase'
), o AS (
  SELECT user_id, ts, value FROM events WHERE event_type <> 'purchase'
)
SELECT p.purchase_id, p.user_id,
       CAST(count(o.ts) AS BIGINT) AS ctx_events,
       CAST(COALESCE(sum(CAST(o.value AS DECIMAL(18,2))), 0) AS DOUBLE) AS ctx_value
FROM p
LEFT JOIN o
  ON o.user_id = p.user_id
 AND o.ts >= p.p_ts - INTERVAL 1 HOUR
 AND o.ts < p.p_ts
GROUP BY 1, 2
"""

_WINDOW = "INTERVAL 1 HOUR"


@register("purchase_context_window", oracle=_CTX_ORACLE)
def purchase_context_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-purchase 1-hour look-back: count + exact-decimal value sum of
    the user's other events. Purchases with a quiet hour still appear
    (count 0, value 0.0)."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    others = events.filter(F.col("event_type") != "purchase").select(
        "user_id",
        F.col("ts").alias("o_ts"),
        "value",
    )

    # window length == bucket size → every window spans exactly 2 buckets
    others_b = others.withColumn("bucket", F.date_trunc("hour", F.col("o_ts")))
    purch_b = purchases.withColumn(
        "bucket",
        F.explode(
            F.array(
                F.date_trunc("hour", F.col("p_ts") - F.expr(_WINDOW)),
                F.date_trunc("hour", F.col("p_ts")),
            )
        ),
    )
    candidates = purch_b.join(others_b, ["user_id", "bucket"]).filter(
        (F.col("o_ts") >= F.col("p_ts") - F.expr(_WINDOW)) & (F.col("o_ts") < F.col("p_ts"))
    )
    ctx = candidates.groupBy("purchase_id").agg(
        F.count("*").alias("ctx_events"),
        dsum("value").alias("ctx_value"),
    )
    return purchases.join(ctx, "purchase_id", "left").select(
        "purchase_id",
        "user_id",
        F.coalesce("ctx_events", F.lit(0)).cast("bigint").alias("ctx_events"),
        F.coalesce("ctx_value", F.lit(0.0)).alias("ctx_value"),
    )
