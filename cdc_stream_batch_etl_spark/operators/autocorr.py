"""Per-series lag-1 autocorrelation over the event stream — the
day-over-day persistence profile of each event type (traffic shaping,
anomaly baselining: a type whose daily volume autocorrelates near 1 is
predictable; near 0 is bursty).

Reference anchor: the reference's monitoring layer tracks per-minute
event velocity (etl_monitoring.py anomaly probes); this is the batch
companion — does yesterday's volume predict today's?

Determinism (full DuckDB oracle): Pearson r is NOT computed with the
engines' ``corr()`` (a streaming double accumulation whose value depends
on row order — a cross-engine coin flip at the last ulp). Instead the
five sufficient statistics (n, Σx, Σy, Σxy, Σx², Σy²) are summed in
EXACT DECIMAL(38,0) arithmetic over the integer daily counts (Spark's
non-ANSI sum(bigint) wraps silently on overflow while DuckDB promotes
to HUGEINT — at ~1e9 events/day/type Σy² exceeds int64, so both sides
accumulate in 128-bit-class exact types: decimal(38,0) here, explicit
HUGEINT casts in the oracle), and only the final closed form

    r = (nΣxy − ΣxΣy) / (sqrt(nΣx² − (Σx)²) · sqrt(nΣy² − (Σy)²))

runs in double — the same literal IEEE expression in both engines on
identical integers. Constant series (zero variance) yield NULL via a
0-denominator guard.

Scale: one (event_type, day) hash-agg over the fact scan (partial
map-side combine; day cardinality is bounded by the calendar), one
event_type-keyed window for the lag, one tiny final agg. No joins, no
driver collection; at 100 TB the only full-data exchange is the first
aggregation, keyed on (event_type, day) — far finer than event_type
alone, so a hot type cannot skew a single reducer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_AUTOCORR_ORACLE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d, count(*) AS c
  FROM events GROUP BY event_type, CAST(ts AS DATE)
), pairs AS (
  SELECT event_type,
         lag(c) OVER (PARTITION BY event_type ORDER BY d) AS x,
         c AS y
  FROM daily
), stats AS (
  SELECT event_type,
         count(*) AS n,
         sum(CAST(x AS HUGEINT)) AS sx, sum(CAST(y AS HUGEINT)) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM pairs WHERE x IS NOT NULL
  GROUP BY event_type
)
SELECT event_type,
       CAST(n AS BIGINT) AS n_days,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE)))
       END AS lag1_autocorr
FROM stats
"""


@register("event_autocorr", oracle=_AUTOCORR_ORACLE)
def event_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 Pearson autocorrelation of daily event counts per type,
    via exact-integer sufficient statistics (see module docstring)."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count("*").alias("c"))
    w = Window.partitionBy("event_type").orderBy("d")
    pairs = (
        daily.select(
            "event_type",
            F.lag("c").over(w).alias("x"),
            F.col("c").alias("y"),
        )
        .filter(F.col("x").isNotNull())
    )
    # decimal(19,0) operands → decimal(38,0) products/sums: exact far
    # past int64 (see module docstring); n stays bigint (bounded by the
    # calendar) and is widened per-expression below.
    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    stats = pairs.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(yd).alias("sy"),
        F.sum(xd * yd).alias("sxy"),
        F.sum(xd * xd).alias("sxx"),
        F.sum(yd * yd).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    vx = n * F.col("sxx") - sx * sx
    vy = n * F.col("syy") - sy * sy
    r = (n * F.col("sxy") - sx * sy).cast("double") / (
        F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))
    )
    return stats.select(
        "event_type",
        n.cast("bigint").alias("n_days"),
        F.when((vx > 0) & (vy > 0), r).alias("lag1_autocorr"),
    )
