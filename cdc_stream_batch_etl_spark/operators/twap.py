"""Time-weighted average — interval-weighted value per event type.

The reference's monitoring layer averages raw readings per window
(stream_processor.py:88-97) — which over-weights bursts: 1000 readings
in a hot minute count 1000x one reading that then holds for an hour.
The standard fix for irregularly-sampled series (CDC state metrics,
price feeds, sensor gauges) is the TIME-weighted mean: each value is
weighted by how long it remained current, Σ(value·Δt)/Σ(Δt). This is
the value-weighted twin of operators/cdcdiff.py's dwell times.

Determinism (full DuckDB oracle): Δt is exact BIGINT microseconds
(epoch-µs subtraction); value rides DECIMAL(18,2) and the product
value×Δt accumulates in DECIMAL — exact, order-independent sums in
both engines (the operators/autocorr.py sufficient-statistics rule).
The only float op is the final ratio of the two exact sums, reported
at 6 decimals (``twap_r``) because the engines' decimal->double
CONVERSIONS double-round differently by 1 ulp past 2^53.

Scale — the skew trap this module exists to dodge: the obvious spelling
(lead(ts) OVER (PARTITION BY event_type)) serializes EACH TYPE's entire
history through one task — with ~5 types, five tasks process 100 TB.
Instead the successor timestamp is computed with DAY-bounded partitions
(each task holds one (type, day) slice) and the per-day LAST event gets
its Δt from the NEXT day's first-event timestamp — a calendar-sized
stitch frame (|types| x |days| rows) whose own window is trivially
small. The result is bit-identical to the global-lead semantics the
oracle spells directly, while every corpus-sized stage partitions by
(type, day)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_TWAP_ORACLE = """
WITH seq AS (
  SELECT event_type,
         CAST(value AS DECIMAL(12,2)) AS v,
         lead(epoch_us(ts)) OVER (
           PARTITION BY event_type ORDER BY ts, event_id) - epoch_us(ts)
           AS dt_us
  FROM events
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_intervals,
       CAST(SUM(CAST(dt_us AS DECIMAL(16,0))) AS DOUBLE) / 1000000.0
         AS total_seconds,
       round(CAST(SUM(v * CAST(dt_us AS DECIMAL(16,0))) AS DOUBLE)
             / CAST(SUM(CAST(dt_us AS DECIMAL(16,0))) AS DOUBLE), 6) AS twap_r
FROM seq WHERE dt_us IS NOT NULL
GROUP BY event_type
"""


@register("time_weighted_value", oracle=_TWAP_ORACLE)
def time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type time-weighted mean of ``value``: each reading weighted
    by the exact µs until the type's next reading (last reading open-
    ended, excluded) — global-lead semantics via day-bounded windows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        "ts",
        F.to_date("ts").alias("day"),
        F.unix_micros("ts").alias("us"),
        # DECIMAL(12,2) x DECIMAL(16,0) -> DECIMAL(29,2) product: exact,
        # under Spark's 38-digit cap with sum headroom (autocorr.py rule).
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    # Successor within the (type, day) slice — corpus-sized, skew-free.
    w_day = Window.partitionBy("event_type", "day").orderBy("ts", "event_id")
    led = ev.withColumn("next_us", F.lead("us").over(w_day))

    # Stitch: per-day first-event µs, shifted back one day — calendar-
    # sized frame, so ITS single-type window is a few-thousand-row sort.
    w_cal = Window.partitionBy("event_type").orderBy("day")
    day_first = (
        ev.groupBy("event_type", "day")
        .agg(F.min("us").alias("first_us"))
        .withColumn("next_day_first_us", F.lead("first_us").over(w_cal))
        .select("event_type", "day", "next_day_first_us")
    )

    dt = (
        led.join(F.broadcast(day_first), ["event_type", "day"])
        .withColumn(
            "dt_us",
            (F.coalesce("next_us", "next_day_first_us") - F.col("us")).cast(
                "decimal(16,0)"
            ),
        )
        .filter(F.col("dt_us").isNotNull())
    )
    return dt.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_intervals"),
        (F.sum("dt_us").cast("double") / F.lit(1000000.0)).alias("total_seconds"),
        # The decimal sums are hash-identical cross-engine (verified);
        # the decimal->double CONVERSION is not (DuckDB converts the
        # scaled int128 then divides by 10^scale — double-rounds by 1
        # ulp once the scaled value passes 2^53). Report the ratio at 6
        # decimals, the repo's ts_similarity sq_dist_r treatment.
        F.round(
            F.sum(F.col("v") * F.col("dt_us")).cast("double")
            / F.sum("dt_us").cast("double"),
            6,
        ).alias("twap_r"),
    )
