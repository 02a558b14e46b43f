"""Two-sample Kolmogorov-Smirnov drift test per event type — the exact
distribution-shift detector between the first and second temporal half
of the stream (beyond-reference, SURVEY §2.11 monitoring family next to
value_drift's binned L1 terms and psi_drift's PSI: KS is the
scale-free, bin-free classic — max ECDF gap — with a closed-form
significance threshold, the test data teams reach for when PSI's bin
sensitivity is the complaint).

Semantics: events are split at the temporal MIDPOINT (2*ts_us <=
min_us+max_us — integer arithmetic, no division, no timestamp math);
per event_type the KS statistic is the max over the value grid of
|ECDF_early(v) - ECDF_late(v)|, with values quantized to a cent grid
(g = floor(value*100) — exact IEEE multiply+floor in both engines;
"exact-on-grid" is the declared contract, the same grid honesty as
binned_quantiles_by_type). The critical value is the large-sample
two-sided alpha=0.05 threshold c(alpha)*sqrt((na+nb)/(na*nb)) with
c=1.358 (Smirnov's asymptotic formula) — sqrt is IEEE-correctly-
rounded so the comparison is cross-engine exact (the ln/pow hazard
that keeps A-ES keys out of this repo does not apply to sqrt).

Scale: one events scan -> one (event_type, grid) hash agg with
map-side partials (the frame is bounded by grid cardinality x types,
NOT row count — the whole reason to quantize), then ONE window pass
partitioned by event_type that produces both the running cumsum
(ordered frame) and the per-type totals (FULL-partition frame — the
frame-class guard's one exemption: Spark's UnboundedWindowFunction-
Frame evaluates it once per partition, O(n), unlike sliding-start
suffix frames), and a |types|-row final agg. No totals-side rescan,
no global sort, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: Smirnov asymptotic two-sided critical coefficient at alpha = 0.05.
KS_C_ALPHA = 1.358

_KS_ORACLE = f"""
WITH bounds AS (
  SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx FROM events
),
sided AS (
  SELECT event_type,
         CAST(floor(value * 100) AS BIGINT) AS g,
         CASE WHEN 2 * epoch_us(ts) <= mn + mx THEN 1 ELSE 0 END AS early
  FROM events CROSS JOIN bounds
),
grid AS (
  SELECT event_type, g,
         sum(early) AS ca,
         sum(1 - early) AS cb
  FROM sided GROUP BY 1, 2
),
cum AS (
  SELECT event_type,
         abs(CAST(sum(ca) OVER w AS DOUBLE) / sum(ca) OVER t
             - CAST(sum(cb) OVER w AS DOUBLE) / sum(cb) OVER t) AS gap,
         sum(ca) OVER t AS na, sum(cb) OVER t AS nb
  FROM grid
  WINDOW w AS (PARTITION BY event_type ORDER BY g
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         t AS (PARTITION BY event_type ORDER BY g
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
)
SELECT event_type,
       CAST(na AS BIGINT) AS n_early,
       CAST(nb AS BIGINT) AS n_late,
       max(gap) AS ks_stat,
       {KS_C_ALPHA} * sqrt(CAST(na + nb AS DOUBLE) / (na * nb)) AS ks_crit,
       CAST(CASE WHEN max(gap) > {KS_C_ALPHA}
                      * sqrt(CAST(na + nb AS DOUBLE) / (na * nb))
                 THEN 1 ELSE 0 END AS BIGINT) AS drifted
FROM cum
GROUP BY event_type, na, nb
ORDER BY event_type
"""


@register("ks_drift", oracle=_KS_ORACLE)
def ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_early, n_late, ks_stat, ks_crit, drifted) — exact
    two-sample KS on the cent grid between the temporal halves."""
    ev = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    bounds = ev.agg(F.min(us).alias("mn"), F.max(us).alias("mx"))
    sided = ev.join(F.broadcast(bounds)).select(
        "event_type",
        F.floor(F.col("value") * 100).cast("bigint").alias("g"),
        F.when(2 * us <= F.col("mn") + F.col("mx"), 1).otherwise(0).alias("early"),
    )
    grid = sided.groupBy("event_type", "g").agg(
        F.sum("early").alias("ca"),
        F.sum(1 - F.col("early")).alias("cb"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("g")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # per-type totals ride the SAME window partitioning/sort on the
    # FULL-partition frame — Spark's UnboundedWindowFunctionFrame
    # computes it once per partition (O(n); the frame-class guard's one
    # exemption — only sliding-start frames recompute per row), so this
    # stays one shuffle, one WindowExec, no totals rescan
    t = (
        Window.partitionBy("event_type")
        .orderBy("g")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    na, nb = F.sum("ca").over(t), F.sum("cb").over(t)
    cum = grid.select(
        "event_type",
        na.alias("na"),
        nb.alias("nb"),
        F.abs(
            F.sum("ca").over(w).cast("double") / na
            - F.sum("cb").over(w).cast("double") / nb
        ).alias("gap"),
    )
    crit = F.lit(KS_C_ALPHA) * F.sqrt(
        (F.col("na") + F.col("nb")).cast("double") / (F.col("na") * F.col("nb"))
    )
    return (
        cum.groupBy("event_type", "na", "nb")
        .agg(F.max("gap").alias("ks_stat"))
        .select(
            "event_type",
            F.col("na").cast("bigint").alias("n_early"),
            F.col("nb").cast("bigint").alias("n_late"),
            "ks_stat",
            crit.alias("ks_crit"),
            F.when(F.col("ks_stat") > crit, 1).otherwise(0).cast("bigint").alias("drifted"),
        )
        .orderBy("event_type")
    )
