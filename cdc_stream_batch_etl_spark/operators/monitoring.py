"""Pipeline-health metrics: the reference's weighted system health score
re-expressed over measurable batch-source properties.

Reference: generate_system_health_report
(/root/reference/airflow/dags/etl_monitoring.py:243-317) scores five
components at 20 points each — Debezium connector health, Kafka topic
ratio, Redis reachability, container health (20/10/0 banding), and batch
success rate — then bands the total (>=90 excellent / >=70 good /
>=50 warning / critical). The probes there are service pings; on a batch
engine the honest equivalents are data-observable properties of the same
five concerns:

- connector_points: ALL source tables present+non-empty (the all-or-
  nothing Debezium connector check, etl_monitoring.py:258-260)
- topic_points: fraction of non-empty source tables × 20 (the
  healthy_topics ratio, :262-264)
- freshness_points: newest event within the freshness horizon (the
  Redis-reachability proxy — a stale store and an unreachable store look
  identical to consumers, :266-268)
- integrity_points: orders null-FK ratio banded 20/10/0 (the
  healthy/degraded/down container banding, :270-274)
- success_points: non-error event fraction × 20 (batch_success_rate,
  :276-279)

Scale shape: five single-row aggregates (one per source scan, each a
partial+final agg with column-pruned reads) cross-joined into one report
row — every join side is exactly one row, so the plan is broadcast
trivia; nothing here scales with corpus size except the scans, which are
count/max-only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

# newest event must be within this horizon of the frozen clock
# (config.FROZEN_NOW_EVENTS) for the store to count as fresh
FRESHNESS_HORIZON = "2024-01-24 00:00:00"
SOURCE_TABLES = ("customer", "orders", "lineitem", "part", "events")

_ORACLE = f"""
WITH src AS (
  SELECT (SELECT count(*) FROM customer) AS n_customer,
         (SELECT count(*) FROM orders) AS n_orders,
         (SELECT count(*) FROM lineitem) AS n_lineitem,
         (SELECT count(*) FROM part) AS n_part,
         (SELECT count(*) FROM events) AS n_events,
         (SELECT max(ts) FROM events) AS max_event_ts,
         (SELECT count(*) FROM events WHERE event_type <> 'error') AS n_ok_events,
         (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS n_null_fk
), pts AS (
  SELECT CAST(
           (CASE WHEN n_customer > 0 THEN 1 ELSE 0 END) +
           (CASE WHEN n_orders > 0 THEN 1 ELSE 0 END) +
           (CASE WHEN n_lineitem > 0 THEN 1 ELSE 0 END) +
           (CASE WHEN n_part > 0 THEN 1 ELSE 0 END) +
           (CASE WHEN n_events > 0 THEN 1 ELSE 0 END) AS BIGINT) AS sources_available,
         n_events, n_ok_events, n_null_fk, n_orders, max_event_ts
  FROM src
)
SELECT CAST(5 AS BIGINT) AS sources_total,
       sources_available,
       CASE WHEN sources_available = 5 THEN 20.0 ELSE 0.0 END AS connector_points,
       ROUND(20.0 * sources_available / 5, 2) AS topic_points,
       CASE WHEN max_event_ts >= TIMESTAMP '{FRESHNESS_HORIZON}'
            THEN 20.0 ELSE 0.0 END AS freshness_points,
       CASE WHEN n_null_fk = 0 THEN 20.0
            WHEN CAST(n_null_fk AS DOUBLE) / n_orders < 0.01 THEN 10.0
            ELSE 0.0 END AS integrity_points,
       ROUND(20.0 * n_ok_events / n_events, 2) AS success_points,
       ROUND(CASE WHEN sources_available = 5 THEN 20.0 ELSE 0.0 END
             + ROUND(20.0 * sources_available / 5, 2)
             + CASE WHEN max_event_ts >= TIMESTAMP '{FRESHNESS_HORIZON}'
                    THEN 20.0 ELSE 0.0 END
             + CASE WHEN n_null_fk = 0 THEN 20.0
                    WHEN CAST(n_null_fk AS DOUBLE) / n_orders < 0.01 THEN 10.0
                    ELSE 0.0 END
             + ROUND(20.0 * n_ok_events / n_events, 2), 2) AS health_score,
       CASE WHEN (CASE WHEN sources_available = 5 THEN 20.0 ELSE 0.0 END
             + ROUND(20.0 * sources_available / 5, 2)
             + CASE WHEN max_event_ts >= TIMESTAMP '{FRESHNESS_HORIZON}'
                    THEN 20.0 ELSE 0.0 END
             + CASE WHEN n_null_fk = 0 THEN 20.0
                    WHEN CAST(n_null_fk AS DOUBLE) / n_orders < 0.01 THEN 10.0
                    ELSE 0.0 END
             + ROUND(20.0 * n_ok_events / n_events, 2)) >= 90 THEN 'excellent'
            WHEN (CASE WHEN sources_available = 5 THEN 20.0 ELSE 0.0 END
             + ROUND(20.0 * sources_available / 5, 2)
             + CASE WHEN max_event_ts >= TIMESTAMP '{FRESHNESS_HORIZON}'
                    THEN 20.0 ELSE 0.0 END
             + CASE WHEN n_null_fk = 0 THEN 20.0
                    WHEN CAST(n_null_fk AS DOUBLE) / n_orders < 0.01 THEN 10.0
                    ELSE 0.0 END
             + ROUND(20.0 * n_ok_events / n_events, 2)) >= 70 THEN 'good'
            WHEN (CASE WHEN sources_available = 5 THEN 20.0 ELSE 0.0 END
             + ROUND(20.0 * sources_available / 5, 2)
             + CASE WHEN max_event_ts >= TIMESTAMP '{FRESHNESS_HORIZON}'
                    THEN 20.0 ELSE 0.0 END
             + CASE WHEN n_null_fk = 0 THEN 20.0
                    WHEN CAST(n_null_fk AS DOUBLE) / n_orders < 0.01 THEN 10.0
                    ELSE 0.0 END
             + ROUND(20.0 * n_ok_events / n_events, 2)) >= 50 THEN 'warning'
            ELSE 'critical' END AS health_status
FROM pts
"""


@register("pipeline_health", oracle=_ORACLE)
def pipeline_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    counts = []
    for t in SOURCE_TABLES:
        counts.append(
            load_table(spark, sf_dir, t).agg(F.count("*").alias(f"n_{t}"))
        )
    events = load_table(spark, sf_dir, "events").agg(
        F.max("ts").alias("max_event_ts"),
        F.count(F.when(F.col("event_type") != "error", 1)).alias("n_ok_events"),
    )
    orders_fk = load_table(spark, sf_dir, "orders").agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_null_fk")
    )
    src = counts[0]
    for df in counts[1:] + [events, orders_fk]:
        src = src.crossJoin(df)  # every side is exactly one row

    avail = sum(
        F.when(F.col(f"n_{t}") > 0, 1).otherwise(0) for t in SOURCE_TABLES
    ).cast("bigint")
    connector = F.when(avail == 5, F.lit(20.0)).otherwise(0.0)
    topic = F.round(F.lit(20.0) * avail / F.lit(5), 2)
    fresh = F.when(
        F.col("max_event_ts") >= F.lit(FRESHNESS_HORIZON).cast("timestamp"),
        F.lit(20.0),
    ).otherwise(0.0)
    integrity = (
        F.when(F.col("n_null_fk") == 0, F.lit(20.0))
        .when(F.col("n_null_fk").cast("double") / F.col("n_orders") < 0.01, 10.0)
        .otherwise(0.0)
    )
    success = F.round(F.lit(20.0) * F.col("n_ok_events") / F.col("n_events"), 2)
    score = connector + topic + fresh + integrity + success
    return src.select(
        F.lit(5).cast("bigint").alias("sources_total"),
        avail.alias("sources_available"),
        connector.alias("connector_points"),
        topic.alias("topic_points"),
        fresh.alias("freshness_points"),
        integrity.alias("integrity_points"),
        success.alias("success_points"),
        F.round(score, 2).alias("health_score"),
        F.when(score >= 90, "excellent")
        .when(score >= 70, "good")
        .when(score >= 50, "warning")
        .otherwise("critical")
        .alias("health_status"),
    )


_SERVICE_ORACLE = f"""
WITH src AS (
  SELECT (SELECT count(*) FROM customer) AS n_customer,
         (SELECT count(*) FROM orders) AS n_orders,
         (SELECT count(*) FROM lineitem) AS n_lineitem,
         (SELECT count(*) FROM part) AS n_part,
         (SELECT count(*) FROM events) AS n_events,
         (SELECT max(ts) FROM events) AS max_event_ts,
         (SELECT count(*) FROM events WHERE event_type <> 'error') AS n_ok_events,
         (SELECT count(*) FROM orders WHERE o_custkey IS NULL) AS n_null_fk
), pts AS (
  SELECT *,
         CAST((CASE WHEN n_customer > 0 THEN 1 ELSE 0 END) +
              (CASE WHEN n_orders > 0 THEN 1 ELSE 0 END) +
              (CASE WHEN n_lineitem > 0 THEN 1 ELSE 0 END) +
              (CASE WHEN n_part > 0 THEN 1 ELSE 0 END) +
              (CASE WHEN n_events > 0 THEN 1 ELSE 0 END) AS BIGINT) AS avail
  FROM src
)
SELECT 'connector' AS service,
       CASE WHEN avail = 5 THEN 20.0 ELSE 0.0 END AS points,
       20.0 AS max_points,
       CAST(avail AS DOUBLE) AS detail,
       CASE WHEN avail = 5 THEN 'healthy' ELSE 'down' END AS status
FROM pts
UNION ALL
SELECT 'topics', ROUND(20.0 * avail / 5, 2), 20.0, CAST(avail AS DOUBLE) / 5,
       CASE WHEN avail = 5 THEN 'healthy' WHEN avail > 0 THEN 'degraded' ELSE 'down' END
FROM pts
UNION ALL
SELECT 'freshness',
       CASE WHEN max_event_ts >= TIMESTAMP '{FRESHNESS_HORIZON}' THEN 20.0 ELSE 0.0 END,
       20.0,
       CAST(floor(epoch(max_event_ts)) AS DOUBLE),
       CASE WHEN max_event_ts >= TIMESTAMP '{FRESHNESS_HORIZON}' THEN 'healthy' ELSE 'stale' END
FROM pts
UNION ALL
SELECT 'integrity',
       CASE WHEN n_null_fk = 0 THEN 20.0
            WHEN CAST(n_null_fk AS DOUBLE) / n_orders < 0.01 THEN 10.0
            ELSE 0.0 END,
       20.0,
       CAST(n_null_fk AS DOUBLE) / n_orders,
       CASE WHEN n_null_fk = 0 THEN 'healthy'
            WHEN CAST(n_null_fk AS DOUBLE) / n_orders < 0.01 THEN 'degraded'
            ELSE 'down' END
FROM pts
UNION ALL
SELECT 'batch_jobs', ROUND(20.0 * n_ok_events / n_events, 2), 20.0,
       CAST(n_ok_events AS DOUBLE) / n_events,
       CASE WHEN n_ok_events = n_events THEN 'healthy' ELSE 'degraded' END
FROM pts
"""


@register("service_health", oracle=_SERVICE_ORACLE)
def service_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-service breakdown of the weighted health score — the row-per-
    component view the reference's report dict carries
    (etl_monitoring.py:281-305: each probe's contribution listed next to
    the total). Same five data-observable probes as pipeline_health; one
    row each with points earned, the 20-point maximum, the raw detail
    metric, and the reference's healthy/degraded/down banding.

    Scale: identical cost to pipeline_health (the same five 1-row
    aggregates, computed ONCE); the five service rows are an
    explode(array(struct…)) projection of the single stats row — one
    scan per source table, not one per service×table. (The earlier
    union-of-five-selects shape re-derived the whole stats subtree per
    leg: 35 scans/65 exchanges in PLANS.md vs pipeline_health's 7/13.)"""
    counts = []
    for t in SOURCE_TABLES:
        counts.append(load_table(spark, sf_dir, t).agg(F.count("*").alias(f"n_{t}")))
    events = load_table(spark, sf_dir, "events").agg(
        F.max("ts").alias("max_event_ts"),
        F.count(F.when(F.col("event_type") != "error", 1)).alias("n_ok_events"),
    )
    orders_fk = load_table(spark, sf_dir, "orders").agg(
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("n_null_fk")
    )
    src = counts[0]
    for df in counts[1:] + [events, orders_fk]:
        src = src.crossJoin(df)

    avail = sum(
        F.when(F.col(f"n_{t}") > 0, 1).otherwise(0) for t in SOURCE_TABLES
    ).cast("bigint")
    fresh_ok = F.col("max_event_ts") >= F.lit(FRESHNESS_HORIZON).cast("timestamp")
    fk_ratio = F.col("n_null_fk").cast("double") / F.col("n_orders")
    ok_ratio = F.col("n_ok_events").cast("double") / F.col("n_events")

    def row(service, points, detail, status):
        return F.struct(
            F.lit(service).alias("service"),
            points.cast("double").alias("points"),
            F.lit(20.0).alias("max_points"),
            detail.cast("double").alias("detail"),
            status.alias("status"),
        )

    services = F.array(
        row(
            "connector",
            F.when(avail == 5, 20.0).otherwise(0.0),
            avail,
            F.when(avail == 5, "healthy").otherwise("down"),
        ),
        row(
            "topics",
            F.round(F.lit(20.0) * avail / 5, 2),
            avail.cast("double") / 5,
            F.when(avail == 5, "healthy").when(avail > 0, "degraded").otherwise("down"),
        ),
        row(
            "freshness",
            F.when(fresh_ok, 20.0).otherwise(0.0),
            F.unix_timestamp("max_event_ts"),
            F.when(fresh_ok, "healthy").otherwise("stale"),
        ),
        row(
            "integrity",
            F.when(F.col("n_null_fk") == 0, 20.0).when(fk_ratio < 0.01, 10.0).otherwise(0.0),
            fk_ratio,
            F.when(F.col("n_null_fk") == 0, "healthy")
            .when(fk_ratio < 0.01, "degraded")
            .otherwise("down"),
        ),
        row(
            "batch_jobs",
            F.round(F.lit(20.0) * ok_ratio, 2),
            ok_ratio,
            F.when(F.col("n_ok_events") == F.col("n_events"), "healthy").otherwise("degraded"),
        ),
    )
    return src.select(F.explode(services).alias("r")).select("r.*")
