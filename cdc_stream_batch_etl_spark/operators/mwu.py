"""Mann-Whitney U drift test per event type — the rank-based (median-
sensitive) companion to ks_drift's max-ECDF-gap test (beyond-reference,
SURVEY §2.11 monitoring family next to ks_drift / psi_drift /
value_drift: KS answers "did the SHAPE move anywhere", MWU answers
"did one half stochastically dominate the other" — the test of choice
when the drift of interest is a location shift, and the one that keeps
its power under heavy tails where a mean-based z-test dies).

Semantics: the same temporal-midpoint split as ks_drift (2*ts_us <=
min_us+max_us — integer arithmetic, one global boundary for all types)
and the same cent grid (g = floor(value*100) — "exact-on-grid" is the
declared contract). Per event_type, U is computed from the tie-averaged
rank sum of the early sample over the pooled grid; significance is the
large-sample normal approximation WITH the tie correction
    var = na*nb/12 * ((N+1) - T/(N(N-1))),   T = Σ_g (t_g³ − t_g)
(Lehmann, "Nonparametrics", eq. 1.28) and the two-sided alpha=0.05
boundary |z| > 1.959963984540054 (the same literal as wilson.py's Z).

Exactness: ranks never materialize as floats — the DOUBLED rank sum
R2 = Σ_g ca_g·(2·cumlt_g + t_g + 1) is an integer (avg tie rank is a
half-integer, so 2× it is integral), so u_stat = (R2 − na(na+1))/2 is
exact to the half-step in both engines; T is summed in decimal(38,0)
(hugeint in DuckDB) because Σ t³ reaches N³ when ties concentrate.
Only z takes IEEE division/sqrt — identical expression shape in both
legs, so the doubles agree bit-for-bit.

Scale: one events scan → one (event_type, grid) hash agg with map-side
partials (frame bounded by grid cardinality × types, not row count),
then ONE window pass partitioned by event_type producing the running
cumsum (the ks_drift plan shape — one shuffle, one WindowExec); the
per-type totals (na, nb, tie correction) fold into the |types|-row
final aggregation — no full-partition aggregate frame (the
tests/test_plans.py frame-class guard). No per-row Python, no global
sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: Two-sided alpha = 0.05 normal boundary (same literal as wilson.py).
Z_ALPHA = 1.959963984540054

_MWU_ORACLE = f"""
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
         count(*) AS t
  FROM sided GROUP BY 1, 2
),
cum AS (
  SELECT event_type, ca, t,
         sum(t) OVER w - t AS cumlt,
         sum(ca) OVER tt AS na,
         sum(t - ca) OVER tt AS nb,
         sum(CAST(t AS HUGEINT) * t * t - t) OVER tt AS tsum
  FROM grid
  WINDOW w AS (PARTITION BY event_type ORDER BY g
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         tt AS (PARTITION BY event_type ORDER BY g
                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
),
stats AS (
  SELECT event_type,
         CAST(na AS BIGINT) AS n_early,
         CAST(nb AS BIGINT) AS n_late,
         CAST(sum(ca * (2 * cumlt + t + 1)) AS HUGEINT) AS r2,
         CAST(max(tsum) AS DOUBLE) AS tsum
  FROM cum
  GROUP BY event_type, na, nb
),
scored AS (
  SELECT event_type, n_early, n_late,
         CAST(r2 - CAST(n_early AS HUGEINT) * (n_early + 1) AS DOUBLE) / 2
           AS u_stat,
         (CAST(r2 - CAST(n_early AS HUGEINT) * (n_early + 1)
               - CAST(n_early AS HUGEINT) * n_late AS DOUBLE) / 2)
         / sqrt(
             (CAST(n_early AS DOUBLE) * CAST(n_late AS DOUBLE) / 12.0)
             * (CAST(n_early + n_late + 1 AS DOUBLE)
                - tsum / (CAST(n_early + n_late AS DOUBLE)
                          * CAST(n_early + n_late - 1 AS DOUBLE)))
           ) AS z
  FROM stats
)
SELECT event_type, n_early, n_late, u_stat, z,
       CAST(CASE WHEN abs(z) > {Z_ALPHA} THEN 1 ELSE 0 END AS BIGINT)
         AS drifted
FROM scored
ORDER BY event_type
"""


@register("mann_whitney_drift", oracle=_MWU_ORACLE)
def mann_whitney_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, n_early, n_late, u_stat, z, drifted) — tie-corrected
    Mann-Whitney U between the temporal halves, exact on the cent grid."""
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
        F.count("*").alias("t"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("g")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # totals (na, nb, tsum) fold into the SAME final aggregation as r2 —
    # no second window frame at all (the repo bans any aggregate touching
    # Window.unboundedFollowing, tests/test_plans.py frame-class guard;
    # the full-partition totals are plain per-type sums anyway)
    cum = grid.select(
        "event_type",
        "ca",
        "t",
        (F.sum("t").over(w) - F.col("t")).alias("cumlt"),
    )
    stats = cum.groupBy("event_type").agg(
        F.sum(
            F.col("ca").cast("decimal(38,0)")
            * (2 * F.col("cumlt") + F.col("t") + 1)
        ).alias("r2"),
        F.sum("ca").alias("na"),
        F.sum(F.col("t") - F.col("ca")).alias("nb"),
        F.sum(
            F.col("t").cast("decimal(38,0)") * F.col("t") * F.col("t") - F.col("t")
        )
        .cast("double")
        .alias("tsum"),
    )
    n_early = F.col("na").cast("bigint")
    n_late = F.col("nb").cast("bigint")
    u2 = F.col("r2") - n_early.cast("decimal(38,0)") * (n_early + 1)
    z = (
        (u2 - n_early.cast("decimal(38,0)") * n_late).cast("double") / 2
    ) / F.sqrt(
        (n_early.cast("double") * n_late.cast("double") / 12.0)
        * (
            (n_early + n_late + 1).cast("double")
            - F.col("tsum")
            / ((n_early + n_late).cast("double") * (n_early + n_late - 1).cast("double"))
        )
    )
    return (
        stats.select(
            "event_type",
            n_early.alias("n_early"),
            n_late.alias("n_late"),
            (u2.cast("double") / 2).alias("u_stat"),
            z.alias("z"),
            F.when(F.abs(z) > Z_ALPHA, 1).otherwise(0).cast("bigint").alias("drifted"),
        )
        .orderBy("event_type")
    )
