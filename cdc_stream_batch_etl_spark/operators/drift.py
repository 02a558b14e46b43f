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


_PSI_ORACLE = f"""
WITH b AS (
  SELECT event_type,
         CAST(floor(value / {BUCKET_WIDTH}) AS BIGINT) AS bucket,
         count(*) FILTER (WHERE ts <  TIMESTAMP '{CUT_TS}') AS n_early,
         count(*) FILTER (WHERE ts >= TIMESTAMP '{CUT_TS}') AS n_late
  FROM events
  GROUP BY 1, 2
),
t AS (
  SELECT *,
         sum(n_early) OVER (PARTITION BY event_type) AS tot_early,
         sum(n_late)  OVER (PARTITION BY event_type) AS tot_late,
         count(*)     OVER (PARTITION BY event_type) AS n_buckets
  FROM b
),
terms AS (
  SELECT event_type, bucket, n_buckets,
         CAST(n_early + 1 AS DOUBLE) / (tot_early + n_buckets) AS p,
         CAST(n_late + 1 AS DOUBLE) / (tot_late + n_buckets) AS q
  FROM t
),
folded AS (
  SELECT event_type,
         CAST(max(n_buckets) AS BIGINT) AS n_buckets,
         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list((p - q) * ln(p / q) ORDER BY bucket)),
               (a, b) -> a + b), 9) AS psi
  FROM terms GROUP BY event_type
)
SELECT event_type, n_buckets, psi,
       CASE WHEN psi < 0.1 THEN 'stable'
            WHEN psi < 0.25 THEN 'moderate'
            ELSE 'shifted' END AS band
FROM folded
ORDER BY event_type
"""


@register("psi_drift", oracle=_PSI_ORACLE)
def psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per event type between the early and
    late eras — the scalar drift score model-monitoring systems alarm
    on (banking scorecard convention: < 0.1 stable, 0.1-0.25 moderate,
    >= 0.25 shifted), next to value_drift's per-bucket chi-square/TV
    terms. Laplace-smoothed cell proportions (n+1)/(tot+B) keep
    PSI = Σ (p−q)·ln(p/q) finite on era-empty buckets.

    Determinism: proportions are exact integer ratios; the ln terms
    fold in bucket order (the centroids idiom) and psi exports at 9
    decimals; the band thresholds compare the ROUNDED psi, so both
    engines band identically.

    Scale: the value_drift hash-agg (one shuffle on (type, bucket)) +
    per-type folds over the bucket list."""
    ev = load_table(spark, sf_dir, "events")
    cut = F.lit(CUT_TS).cast("timestamp")
    b = ev.groupBy(
        "event_type",
        F.floor(F.col("value") / BUCKET_WIDTH).cast("bigint").alias("bucket"),
    ).agg(
        F.count(F.when(F.col("ts") < cut, 1)).alias("n_early"),
        F.count(F.when(F.col("ts") >= cut, 1)).alias("n_late"),
    )
    w = Window.partitionBy("event_type")
    terms = b.select(
        "event_type",
        "bucket",
        F.count("*").over(w).alias("n_buckets"),
        (
            (F.col("n_early") + 1).cast("double")
            / (F.sum("n_early").over(w) + F.count("*").over(w))
        ).alias("p"),
        (
            (F.col("n_late") + 1).cast("double")
            / (F.sum("n_late").over(w) + F.count("*").over(w))
        ).alias("q"),
    )
    fold = F.expr(
        "aggregate(array_sort(collect_list(struct(bucket, term))), 0.0D, "
        "(acc, e) -> acc + e.term)"
    )
    folded = (
        terms.withColumn(
            "term", (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q"))
        )
        .groupBy("event_type")
        .agg(
            F.max("n_buckets").cast("bigint").alias("n_buckets"),
            F.round(fold, 9).alias("psi"),
        )
    )
    return folded.select(
        "event_type",
        "n_buckets",
        "psi",
        F.when(F.col("psi") < 0.1, "stable")
        .when(F.col("psi") < 0.25, "moderate")
        .otherwise("shifted")
        .alias("band"),
    ).orderBy("event_type")
