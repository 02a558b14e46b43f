"""Robust anomaly detection — median/MAD outliers per event type.

The anomaly detectors the reference ships (stream_processor.py
high-value / bulk / velocity probes → operators/anomalies.py) use fixed
thresholds; their production hardening is a SELF-CALIBRATING rule that
heavy tails cannot arm or blind: flag events whose modified z-score

    z = 0.6745 · (value − median) / MAD,   MAD = median(|value − median|)

exceeds 3.5 (the Iglewicz–Hoaglin rule; mean/σ-based z-scores fail here
because one whale purchase inflates σ and hides every other outlier —
the same motivation as winsorize_values, taken from clamping to
detection).

Determinism (full DuckDB oracle): both median passes are the proven
exact-percentile pair (`F.percentile` ↔ `quantile_cont`, the
winsorize.py idiom); the z expression is identical IEEE arithmetic on
identical doubles in both engines. Zero-MAD groups (≥50% of values at
the median) yield NULL z and never flag — spelled identically via the
mad > 0 guard.

Plan: the grouped-exact-percentile + broadcast-back idiom, twice: one
sort-agg pass for each type's median, broadcast (|types| rows) onto the
fact scan for deviations, one sort-agg for the MAD, broadcast again,
pure-codegen filter. No corpus window, no global sort — at 100 TB the
cost is two fact scans and two tiny broadcasts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: Iglewicz–Hoaglin modified-z-score cut.
Z_CUT = 3.5
#: Φ⁻¹(0.75) — scales MAD to σ-equivalent units for normal data.
MAD_SCALE = 0.6745

_MAD_ORACLE = f"""
WITH med AS (
  SELECT event_type, quantile_cont(value, 0.5) AS med
  FROM events GROUP BY event_type
), mad AS (
  SELECT e.event_type, quantile_cont(abs(e.value - m.med), 0.5) AS mad
  FROM events e JOIN med m USING (event_type)
  GROUP BY e.event_type
)
SELECT e.event_id, e.event_type, e.value, m.med, d.mad,
       {MAD_SCALE} * (e.value - m.med) / d.mad AS robust_z
FROM events e
JOIN med m USING (event_type)
JOIN mad d USING (event_type)
WHERE d.mad > 0
  AND abs({MAD_SCALE} * (e.value - m.med) / d.mad) > {Z_CUT}
"""


@register("robust_anomalies", oracle=_MAD_ORACLE)
def robust_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose modified z-score (median/MAD) exceeds 3.5 within
    their type — the self-calibrating outlier sweep."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "value"
    )
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    with_med = ev.join(F.broadcast(med), "event_type")
    mad = with_med.groupBy("event_type").agg(
        F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias("mad")
    )
    z = F.lit(MAD_SCALE) * (F.col("value") - F.col("med")) / F.col("mad")
    return (
        with_med.join(F.broadcast(mad), "event_type")
        .filter((F.col("mad") > 0) & (F.abs(z) > Z_CUT))
        .select("event_id", "event_type", "value", "med", "mad", z.alias("robust_z"))
    )
