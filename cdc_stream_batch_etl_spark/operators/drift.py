"""Distribution-drift profiling — the data-quality gate a training-data
pipeline runs between ingest batches.

Splits the events stream at a fixed cut timestamp and compares the
`value` distribution of the early vs late era per event_type, over
fixed-width buckets. Emits one row per (event_type, bucket) with the
raw counts, the two era proportions, and the per-bucket chi-square and
total-variation terms. Callers sum the term columns for the scalar
drift statistic; the operator deliberately emits per-bucket rows so
every number is a deterministic scalar function of integer counts —
no cross-row float summation whose order could differ between engines
(the repo-wide float-parity rule, functions/money.py).

PSI's log-ratio term is intentionally NOT emitted: ln() is a libm call
whose last-ulp rounding differs across engines, which would break the
exact-hash oracle gate. Chi-square (p-q)^2/(p+q) and TVD |p-q|/2 carry
the same drift signal using only IEEE-exact +,-,*,/.

Plan shape at 100 TB: one scan of events, one shuffle keyed on
(event_type, bucket) with map-side partial counts, then integer window
totals per event_type — the bucket cardinality (types x ~11 buckets) is
tiny, so the window stage is negligible.

Reference anchor: beyond-reference (the reference's etl_monitoring.py
checks only row counts/freshness, ref etl_monitoring.py:281-305; drift
is the corpus-scale extension of that gate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: Era cut: midpoint of the fixture's 2024-01 window; at production scale
#: this is the previous-batch boundary.
CUT_TS = "2024-01-16 00:00:00"
BUCKET_WIDTH = 32.0

_DRIFT_ORACLE = f"""
WITH b AS (
  SELECT event_type,
         CAST(floor(value / {BUCKET_WIDTH}) AS BIGINT) AS bucket,
         count(*) FILTER (WHERE ts <  TIMESTAMP '{CUT_TS}') AS n_early,
         count(*) FILTER (WHERE ts >= TIMESTAMP '{CUT_TS}') AS n_late
  FROM events
  GROUP BY 1, 2
), t AS (
  SELECT *,
         sum(n_early) OVER (PARTITION BY event_type) AS tot_early,
         sum(n_late)  OVER (PARTITION BY event_type) AS tot_late
  FROM b
), p AS (
  SELECT event_type, bucket, n_early, n_late,
         CAST(n_early AS DOUBLE) / tot_early AS p_early,
         CAST(n_late  AS DOUBLE) / tot_late  AS p_late
  FROM t
)
SELECT event_type, bucket, n_early, n_late, p_early, p_late,
       CASE WHEN p_early + p_late > 0.0
            THEN (p_early - p_late) * (p_early - p_late) / (p_early + p_late)
            ELSE 0.0 END AS chi2_term,
       abs(p_early - p_late) / 2.0 AS tvd_term
FROM p
"""


@register("value_drift", oracle=_DRIFT_ORACLE)
def value_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(event_type, bucket) early-vs-late distribution drift terms."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit(CUT_TS).cast("timestamp")
    b = (
        ev.groupBy(
            "event_type",
            F.floor(F.col("value") / BUCKET_WIDTH).cast("bigint").alias("bucket"),
        )
        .agg(
            F.count(F.when(F.col("ts") < cut, 1)).alias("n_early"),
            F.count(F.when(F.col("ts") >= cut, 1)).alias("n_late"),
        )
    )
    w = Window.partitionBy("event_type")
    p = b.select(
        "event_type",
        "bucket",
        "n_early",
        "n_late",
        (F.col("n_early").cast("double") / F.sum("n_early").over(w)).alias("p_early"),
        (F.col("n_late").cast("double") / F.sum("n_late").over(w)).alias("p_late"),
    )
    diff = F.col("p_early") - F.col("p_late")
    tot = F.col("p_early") + F.col("p_late")
    return p.select(
        "event_type",
        "bucket",
        "n_early",
        "n_late",
        "p_early",
        "p_late",
        F.when(tot > 0.0, diff * diff / tot).otherwise(F.lit(0.0)).alias("chi2_term"),
        (F.abs(diff) / 2.0).alias("tvd_term"),
    )
