"""CDC ingest core — stats, lifecycle counters, running aggregates,
latest-state maintenance, change-log projection.

The reference's CDC processor consumes Debezium events and maintains Redis
state per event (/root/reference/python/cdc_processor.py). Per SURVEY §7
step 4, the same DataFrame code is built batch-over-files first (the driver
`events` table stands in for the CDC stream, FIXTURES §3: op↔event_type,
entity↔user_id) and reused under readStream in `streaming/`.

Operators covered (SURVEY §2):
- A15 cdc stats per (op) + grand total   (cdc_processor.py:46-51)
- A16 entity lifecycle counters, pivoted (cdc_processor.py:86-89,127-131,...)
- A17 running revenue total              (cdc_processor.py:124-127)
- A18 per-entity running sums            (cdc_processor.py:203-205)
- W10 latest-state cache (latest-wins by event time, deterministic tiebreak)
       (cdc_processor.py:72-100)
- S9  per-customer order-id sets         (cdc_processor.py:118-121,145)
- S5/C13 envelope parse + rename, C12 JSON extraction (cdc_processor.py:26-43)

Scale notes: every query is a single partial+final hash aggregate or a
window-dedup partitioned by the entity key — the natural distribution at
100 TB. The latest-state dedup shuffles once on user_id; no collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.money import davg, dsum
from ..registry import register

_STATS_ORACLE = """
SELECT event_type AS op, count(*) AS event_count
FROM events
GROUP BY 1
"""


@register("cdc_stats", oracle=_STATS_ORACLE)
def cdc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.groupBy(F.col("event_type").alias("op")).agg(F.count("*").alias("event_count"))


_STATS_TOTAL_ORACLE = """
SELECT count(*) AS total_events,
       count(DISTINCT user_id) AS unique_entities,
       min(ts) AS first_event,
       max(ts) AS last_event
FROM events
"""


@register("cdc_stats_total", oracle=_STATS_TOTAL_ORACLE)
def cdc_stats_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.agg(
        F.count("*").alias("total_events"),
        F.countDistinct("user_id").alias("unique_entities"),
        F.min("ts").alias("first_event"),
        F.max("ts").alias("last_event"),
    )


_LIFECYCLE_ORACLE = """
SELECT user_id,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events
GROUP BY 1
"""


@register("entity_lifecycle", oracle=_LIFECYCLE_ORACLE)
def entity_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A16: created/updated/deleted counters per entity, pivoted to columns.
    Conditional sums instead of .pivot() so the output schema is fixed (a
    pivot would scan once to discover values)."""
    events = load_table(spark, sf_dir, "events")
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).cast("bigint").alias(f"n_{t}")
        for t in ("signup", "click", "view", "purchase", "error")
    ]
    return events.groupBy("user_id").agg(*aggs)


_REVENUE_ORACLE = """
SELECT CAST(coalesce(sum(CAST(value AS DECIMAL(18,2))), 0) AS DOUBLE) AS total_revenue,
       count(*) AS purchase_count
FROM events
WHERE event_type = 'purchase'
"""


@register("running_revenue", oracle=_REVENUE_ORACLE)
def running_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return events.filter(F.col("event_type") == "purchase").agg(
        dsum("value", coalesce_zero=True).alias("total_revenue"),
        F.count("*").alias("purchase_count"),
    )


_ENTITY_TOTALS_ORACLE = """
SELECT user_id,
       count(*) AS purchase_count,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(value) AS avg_value
FROM events
WHERE event_type = 'purchase'
GROUP BY 1
"""


@register("entity_running_totals", oracle=_ENTITY_TOTALS_ORACLE)
def entity_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.count("*").alias("purchase_count"),
            dsum("value").alias("total_value"),
            davg("value").alias("avg_value"),
        )
    )


_LATEST_ORACLE = """
SELECT user_id, event_id AS last_event_id, event_type AS last_event_type,
       ts AS last_ts, value AS last_value
FROM (
  SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


@register("latest_state", oracle=_LATEST_ORACLE)
def latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W10 latest-wins cache maintenance, batch form: dedup to the newest
    event per key by (ts, event_id) — the deterministic tiebreak SURVEY §7
    calls for (ts_ms then offset). The streaming form applies the same
    dedup per micro-batch in foreachBatch (streaming/cdc_stream.py)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("ts").alias("last_ts"),
            F.col("value").alias("last_value"),
        )
    )


_CHANGELOG_ORACLE = """
SELECT event_id,
       event_type AS operation,
       user_id AS entity_id,
       ts AS event_time,
       value AS amount,
       CAST(json_extract(props, 'k') AS INTEGER) AS prop_k
FROM events
"""


@register("change_log", oracle=_CHANGELOG_ORACLE)
def change_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/C13 envelope restructuring + C12 JSON decode: the reference's
    event → {operation, table, timestamp, ...} rename (cdc_processor.py:36-43)
    with `props` JSON field extraction (utils.py:81,144-147)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.col("event_type").alias("operation"),
        F.col("user_id").alias("entity_id"),
        F.col("ts").alias("event_time"),
        F.col("value").alias("amount"),
        F.get_json_object("props", "$.k").cast("int").alias("prop_k"),
    )


_ORDER_SETS_ORACLE = """
SELECT o_custkey AS customer_id,
       count(*) AS order_count,
       array_to_string(list_sort(list(DISTINCT o_orderkey)), ',') AS order_ids
FROM orders
GROUP BY 1
"""


@register("customer_order_sets", oracle=_ORDER_SETS_ORACLE)
def customer_order_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S9: the Redis per-customer order-id set (cdc_processor.py:118-121,145)
    as collect_set, sorted + joined for a deterministic, hashable value."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy(F.col("o_custkey").alias("customer_id")).agg(
        F.count("*").alias("order_count"),
        F.array_join(F.sort_array(F.collect_set("o_orderkey")), ",").alias("order_ids"),
    )
