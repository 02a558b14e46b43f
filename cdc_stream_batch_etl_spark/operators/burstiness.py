"""Inter-arrival burstiness per event type — Goh & Barabási's
burstiness index over the event stream (Goh & Barabási, EPL 2008;
beyond-reference, SURVEY §2.11 time-series family next to
event_autocorr and anomaly_velocity).

For each user and event type, consecutive same-type events define
inter-arrival gaps; per type this reports the gap count, mean, standard
deviation, coefficient of variation, and the burstiness index
B = (σ−μ)/(σ+μ) ∈ [−1, 1]: B ≈ −1 is periodic (monitoring heartbeats),
B ≈ 0 is Poisson (independent arrivals), B → 1 is bursty (human
activity, incident storms). Capacity planning and anomaly-detector
tuning read exactly this number — a velocity alert threshold calibrated
on Poisson arrivals misfires on bursty types.

Determinism: gaps are INTEGER microseconds; Σd and Σd² accumulate in
decimal(38,0) (order-independent exact sums — the four_step playbook;
d² ≤ 1e24, corpus sums fit 38 digits), and the double read-out chain
(cast → mean → variance → sqrt → ratios) is the same literal IEEE
expression in both engines, so no rounding export is needed. Variance
is clamped at 0 before sqrt (the cancellation guard, both engines),
and the zero-mean case (every gap for a type exactly 0 µs — all
same-type events at identical timestamps) is guarded explicitly: cv
and burstiness are NULL when Σd = 0, mirroring the variance clamp, so
no 0/0 NaN whose representation differs cross-engine can ever reach
the compare (r10 ADVICE item).

Scale: one lag() window on (user_id, event_type) — a single hash
shuffle on user_id with in-partition sort, the event_transitions
class — then a |types|-row hash agg with map-side partials.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_BURST_ORACLE = """
WITH gaps AS (
  SELECT event_type,
         epoch_us(ts) - epoch_us(lag(ts) OVER (
           PARTITION BY user_id, event_type ORDER BY ts, event_id)) AS d
  FROM events
),
sums AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(CAST(d AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sd,
         CAST(sum(CAST(d AS DECIMAL(38,0)) * CAST(d AS DECIMAL(38,0)))
              AS DECIMAL(38,0)) AS sd2
  FROM gaps WHERE d IS NOT NULL
  GROUP BY event_type
)
SELECT event_type, n_gaps,
       CAST(sd AS DOUBLE) / n_gaps AS mean_gap_us,
       sqrt(greatest(CAST(sd2 AS DOUBLE) / n_gaps
                     - (CAST(sd AS DOUBLE) / n_gaps)
                       * (CAST(sd AS DOUBLE) / n_gaps), 0.0e0)) AS std_gap_us,
       CASE WHEN sd = 0 THEN NULL ELSE
         sqrt(greatest(CAST(sd2 AS DOUBLE) / n_gaps
                       - (CAST(sd AS DOUBLE) / n_gaps)
                         * (CAST(sd AS DOUBLE) / n_gaps), 0.0e0))
           / (CAST(sd AS DOUBLE) / n_gaps) END AS cv,
       CASE WHEN sd = 0 THEN NULL ELSE
         (sqrt(greatest(CAST(sd2 AS DOUBLE) / n_gaps
                        - (CAST(sd AS DOUBLE) / n_gaps)
                          * (CAST(sd AS DOUBLE) / n_gaps), 0.0e0))
          - CAST(sd AS DOUBLE) / n_gaps)
         / (sqrt(greatest(CAST(sd2 AS DOUBLE) / n_gaps
                          - (CAST(sd AS DOUBLE) / n_gaps)
                            * (CAST(sd AS DOUBLE) / n_gaps), 0.0e0))
            + CAST(sd AS DOUBLE) / n_gaps) END AS burstiness
FROM sums
ORDER BY event_type
"""


@register("event_burstiness", oracle=_BURST_ORACLE)
def event_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_gaps, mean_gap_us, std_gap_us, cv, burstiness) —
    per-type inter-arrival dispersion over same-user same-type gaps."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
        ).alias("d"),
    ).filter(F.col("d").isNotNull())
    dd = F.col("d").cast("decimal(38,0)")
    sums = gaps.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n_gaps"),
        F.sum(dd).cast("decimal(38,0)").alias("sd"),
        F.sum(dd * dd).cast("decimal(38,0)").alias("sd2"),
    )
    mean = F.col("sd").cast("double") / F.col("n_gaps")
    var = F.greatest(
        F.col("sd2").cast("double") / F.col("n_gaps") - mean * mean, F.lit(0.0)
    )
    std = F.sqrt(var)
    # Σd = 0 ⟺ mean = 0 (gaps are non-negative): cv and burstiness would
    # evaluate 0/0 → NaN, whose cross-engine bits the determinism argument
    # does not cover; NULL is the defined value for "no dispersion scale".
    zero_mean = F.col("sd") == F.lit(0).cast("decimal(38,0)")
    return sums.select(
        "event_type",
        "n_gaps",
        mean.alias("mean_gap_us"),
        std.alias("std_gap_us"),
        F.when(zero_mean, F.lit(None).cast("double"))
        .otherwise(std / mean)
        .alias("cv"),
        F.when(zero_mean, F.lit(None).cast("double"))
        .otherwise((std - mean) / (std + mean))
        .alias("burstiness"),
    ).orderBy("event_type")
