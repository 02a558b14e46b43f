"""Group-wise trend fitting — per-nation OLS slope of daily revenue.

The "is this segment growing?" primitive: for each customer nation, fit
revenue_day = intercept + slope · day by ordinary least squares and
report the fitted line. The reference's analytics layer stops at level
aggregates (daily revenue, order_analytics — batch_processor.py:40-60);
the trend is the first derivative its dashboards would ask for next.

Determinism (full DuckDB oracle): like event_autocorr, the engines'
`regr_slope` is an order-dependent double accumulation — not used.
The sufficient statistics are exact: x = integer day index
(datediff from a fixed epoch), y = exact DECIMAL daily revenue. On the
Spark side x is widened to decimal(19,0) before the products so
Σx/Σx²/Σxy accumulate in decimal(38,·) — Spark's non-ANSI sum(bigint)
would wrap silently on int64 overflow at extreme day counts, while
decimal sums stay exact to 38 digits (DuckDB's sums promote to
HUGEINT/decimal(38,·) on their own). All order-independent.
Only the final closed form

    slope     = (nΣxy − ΣxΣy) / (nΣx² − (Σx)²)
    intercept = (Σy − slope·Σx) / n

runs in double, the same literal IEEE expression both engines.

Scale: one (nation, day) hash-agg over the orders scan (calendar-bounded
group count), nation broadcast by hint (customer join left to AQE —
it grows with the corpus), then a per-nation 6-column agg. No window,
no sort; the only full-data exchange is the first aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: Fixed day-index epoch — any date at/before the data's start works;
#: pinned so the intercept is interpretable and both engines agree.
EPOCH = "1995-01-01"

_TREND_ORACLE = f"""
WITH daily AS (
  SELECT n.n_name AS nation,
         datediff('day', DATE '{EPOCH}', CAST(o.o_orderdate AS DATE)) AS x,
         sum(CAST(o.o_totalprice AS DECIMAL(18,2))) AS y
  FROM orders o
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  GROUP BY n.n_name, datediff('day', DATE '{EPOCH}', CAST(o.o_orderdate AS DATE))
), stats AS (
  SELECT nation,
         count(*) AS n,
         sum(x) AS sx, sum(x * x) AS sxx,
         sum(y) AS sy, sum(x * y) AS sxy
  FROM daily GROUP BY nation
)
SELECT nation,
       CAST(n AS BIGINT) AS n_days,
       CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
       (CAST(sy AS DOUBLE)
        - (CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
         / CAST(n AS DOUBLE) AS intercept
FROM stats WHERE n > 1
"""


@register("revenue_trend", oracle=_TREND_ORACLE)
def revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation OLS slope/intercept of daily order revenue, from
    exact-arithmetic sufficient statistics (see module docstring)."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    daily = (
        o.join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.datediff(F.to_date("o_orderdate"), F.lit(EPOCH).cast("date")).alias("x"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("y"))
    )
    xd = F.col("x").cast("decimal(19,0)")
    stats = daily.groupBy("nation").agg(
        F.count("*").alias("n"),
        F.sum(xd).alias("sx"),
        F.sum(xd * xd).alias("sxx"),
        F.sum("y").alias("sy"),
        F.sum(xd * F.col("y")).alias("sxy"),
    )
    nn, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    slope = (nn * F.col("sxy") - sx * sy).cast("double") / (
        nn * F.col("sxx") - sx * sx
    ).cast("double")
    intercept = (sy.cast("double") - slope * sx.cast("double")) / nn.cast("double")
    return stats.filter(nn > 1).select(
        "nation",
        nn.cast("bigint").alias("n_days"),
        slope.alias("slope"),
        intercept.alias("intercept"),
    )
