"""Winsorization — percentile-clamping event values per type.

Heavy-tailed metrics (purchase values, token counts, latencies) wreck
means, z-scores, and any threshold tuned on them; the standard
pre-aggregation guard clamps each value into its group's [p05, p95]
band. Downstream consumers here: the anomaly detectors' thresholds
(operators/anomalies.py) and the EWMA drift model (streaming/drift.py)
are both mean/variance-based — winsorized inputs are how a production
deployment keeps one whale purchase from arming/blinding them.

Plan: the grouped-exact-percentile + broadcast-back idiom
(segments.py:92-104, lengthdist.py): one sort-agg pass computes each
event_type's exact p05/p95 (never approx — oracle determinism), the
per-type threshold table (|event types| rows) broadcasts back onto a
second scan, and the clamp is a pure codegen'd expression. Two scans,
one tiny broadcast, NO window over the corpus and no global sort — the
100 TB spelling of a per-group quantile clamp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

P_LO = 0.05
P_HI = 0.95

_WINSORIZE_ORACLE = f"""
WITH th AS (
  SELECT event_type,
         quantile_cont(value, {P_LO}) AS p_lo,
         quantile_cont(value, {P_HI}) AS p_hi
  FROM events
  GROUP BY event_type
)
SELECT e.event_id, e.event_type, e.value,
       th.p_lo, th.p_hi,
       CASE WHEN e.value < th.p_lo THEN th.p_lo
            WHEN e.value > th.p_hi THEN th.p_hi
            ELSE e.value END AS value_winsorized,
       (e.value < th.p_lo OR e.value > th.p_hi) AS clamped
FROM events e JOIN th USING (event_type)
"""


@register("winsorize_values", oracle=_WINSORIZE_ORACLE)
def winsorize_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every event with its type's exact [p05, p95] band, the clamped
    value, and whether clamping fired."""
    ev = load_table(spark, sf_dir, "events")
    th = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(P_LO)).alias("p_lo"),
        F.percentile("value", F.lit(P_HI)).alias("p_hi"),
    )
    clamped = (
        F.when(F.col("value") < F.col("p_lo"), F.col("p_lo"))
        .when(F.col("value") > F.col("p_hi"), F.col("p_hi"))
        .otherwise(F.col("value"))
    )
    return (
        ev.select("event_id", "event_type", "value")
        .join(F.broadcast(th), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            "p_lo",
            "p_hi",
            clamped.alias("value_winsorized"),
            ((F.col("value") < F.col("p_lo")) | (F.col("value") > F.col("p_hi"))).alias(
                "clamped"
            ),
        )
    )
