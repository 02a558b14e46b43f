"""Shewhart individuals/moving-range (I-MR) control chart over daily
revenue (beyond-reference, SURVEY §2.11 monitoring family third leg:
revenue_changepoint finds the single best HISTORICAL break offline,
cusum_drift accumulates small sustained shifts sequentially — the
Shewhart chart is the memoryless detector in between, flagging any
single day that leaves the +-3-sigma band, with sigma estimated the
textbook I-MR way from the mean moving range so a slow trend doesn't
inflate the limits the way a global stddev would).

Semantics: series = daily revenue in integer cents, x_1..x_n by day.
MRbar = mean of the n-1 moving ranges |x_t - x_{t-1}|; the d2 control
constant for subgroup size 2 is DECLARED as exactly 1.128 (the
tabulated value), so 3*sigma_hat = 3/1.128 * MRbar = (125/47) * MRbar
— an exact rational. Limits: UCL/LCL = xbar +- (125/47)*MRbar; a day
violates when x_t falls strictly outside.

Exactness: the violation predicate never divides — multiply through by
47*m*n (m = n-1 ranges, S = sum x, MR_S = sum of ranges, all BIGINT):

    above:  47*m*n*x_t > 47*m*S + 125*n*MR_S
    below:  47*m*n*x_t < 47*m*S - 125*n*MR_S

in decimal(38,0)/HUGEINT (~1e22 peak at sf1000 — far inside 38
digits). Exported doubles (xbar, mrbar, sigma, UCL, LCL) are built
from the two exact int/int divisions (S/n, MR_S/m — both numerators
< 2^53 at any plausible SF) with the identical IEEE expression shape
in both engines (the spearman_corr_matrix convention).

Scale: daily aggregation bounds the chart frame at calendar size
(~2.4k rows at any SF); the only data-sized stage is the one orders
scan feeding a map-side-combining date hash-agg. The lag and the
summary run on the tiny daily frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: 3/d2 for subgroup size 2: d2 = 1.128 exactly, so 3/d2 = 125/47.
LIM_NUM = 125
LIM_DEN = 47

_SHEWHART_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS x
  FROM orders GROUP BY 1
),
mr AS (
  SELECT day, x,
         abs(x - lag(x) OVER (ORDER BY day)) AS r
  FROM daily
),
s AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(count(*) - 1 AS BIGINT) AS m,
         CAST(sum(x) AS BIGINT) AS sx,
         CAST(sum(r) AS BIGINT) AS smr
  FROM mr
),
flagged AS (
  SELECT mr.day, mr.x, s.n, s.m, s.sx, s.smr,
         CAST({LIM_DEN} AS HUGEINT) * s.m * s.n * mr.x
           > CAST({LIM_DEN} AS HUGEINT) * s.m * s.sx
             + CAST({LIM_NUM} AS HUGEINT) * s.n * s.smr AS above,
         CAST({LIM_DEN} AS HUGEINT) * s.m * s.n * mr.x
           < CAST({LIM_DEN} AS HUGEINT) * s.m * s.sx
             - CAST({LIM_NUM} AS HUGEINT) * s.n * s.smr AS below
  FROM mr CROSS JOIN s
)
SELECT CAST(max(n) AS BIGINT) AS n_days,
       CAST(max(sx) AS DOUBLE) / max(n) AS xbar_cents,
       CAST(max(smr) AS DOUBLE) / max(m) AS mrbar_cents,
       CAST(max(smr) AS DOUBLE) / max(m) / 1.128 AS sigma_cents,
       CAST(max(sx) AS DOUBLE) / max(n)
         + {LIM_NUM} * (CAST(max(smr) AS DOUBLE) / max(m)) / {LIM_DEN}
         AS ucl_cents,
       CAST(max(sx) AS DOUBLE) / max(n)
         - {LIM_NUM} * (CAST(max(smr) AS DOUBLE) / max(m)) / {LIM_DEN}
         AS lcl_cents,
       CAST(sum(CASE WHEN above THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
       CAST(sum(CASE WHEN below THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
       min(CASE WHEN above THEN day END) AS first_above,
       min(CASE WHEN below THEN day END) AS first_below
FROM flagged
"""


@register("shewhart_imr_chart", oracle=_SHEWHART_ORACLE)
def shewhart_imr_chart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: I-MR chart summary over daily revenue — moving-range
    sigma, 3-sigma limits, violation counts and first-violation days."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("x")
    )
    mr = daily.select(
        "day",
        "x",
        F.abs(F.col("x") - F.lag("x").over(Window.orderBy("day"))).alias("r"),
    )
    s = mr.agg(
        F.count("*").cast("bigint").alias("n"),
        (F.count("*") - 1).cast("bigint").alias("m"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("r").cast("bigint").alias("smr"),
    )
    _dec = "decimal(38,0)"
    hi = (
        F.lit(LIM_DEN).cast(_dec) * F.col("m") * F.col("n") * F.col("x")
        > F.lit(LIM_DEN).cast(_dec) * F.col("m") * F.col("sx")
        + F.lit(LIM_NUM).cast(_dec) * F.col("n") * F.col("smr")
    )
    lo = (
        F.lit(LIM_DEN).cast(_dec) * F.col("m") * F.col("n") * F.col("x")
        < F.lit(LIM_DEN).cast(_dec) * F.col("m") * F.col("sx")
        - F.lit(LIM_NUM).cast(_dec) * F.col("n") * F.col("smr")
    )
    flagged = mr.join(F.broadcast(s)).select(
        "day", "x", "n", "m", "sx", "smr", hi.alias("above"), lo.alias("below")
    )
    xbar = F.max("sx").cast("double") / F.max("n")
    mrbar = F.max("smr").cast("double") / F.max("m")
    return flagged.agg(
        F.max("n").cast("bigint").alias("n_days"),
        xbar.alias("xbar_cents"),
        mrbar.alias("mrbar_cents"),
        (mrbar / 1.128).alias("sigma_cents"),
        (xbar + F.lit(LIM_NUM) * mrbar / LIM_DEN).alias("ucl_cents"),
        (xbar - F.lit(LIM_NUM) * mrbar / LIM_DEN).alias("lcl_cents"),
        F.sum(F.when(F.col("above"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_above"),
        F.sum(F.when(F.col("below"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_below"),
        F.min(F.when(F.col("above"), F.col("day"))).alias("first_above"),
        F.min(F.when(F.col("below"), F.col("day"))).alias("first_below"),
    )
