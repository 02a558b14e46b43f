"""Quantile-regression trend via integer pinball-loss grid search
(beyond-reference, SURVEY §2.11 stats family next to theil_sen_trend /
conformal_forecast_intervals: Theil-Sen fits the MEDIAN trend robustly;
quantile regression fits the q10/q50/q90 trend LINES — the spread
between the fitted tails is the drift-aware dispersion band a capacity
planner actually wants, and the grid-search formulation keeps it exact
where iterative LP solvers would hang cross-engine floats).

Semantics: series = daily revenue in integer cents, x_t at day index
t = 1..n. Candidate slopes are the integer grid j*Q cents/day for
j in -G..G (G = 10), Q = max(1, (max x - min x) // (n * G)) — the
grid spans the series' total drift range symmetrically. For each tau
in {10, 50, 90} percent and each slope: residuals e_t = x_t - slope*t;
the optimal intercept for pinball loss at fixed slope is the type-1
tau-quantile of the residuals (order statistic k = ceil(tau*n/100),
no interpolation); the loss is the integer pinball sum

    loss(tau, slope) = sum_t [ e_t >= q ? tau*(e_t - q)
                                        : (tau - 100)*(e_t - q) ]

(scaled x100 by using integer percent — never a float). The reported
line per tau is the argmin over the grid, ties to the smaller slope.

Exactness: every quantity through the argmin — Q, residuals, order
statistics, losses — is BIGINT/decimal(38) integer arithmetic; ceil
via (a+b-1)//b in true integer division (div / // — the saltplan
convention). Only the final exported loss is cast to double.

Scale: daily aggregation bounds the frame at calendar size; the grid
cross join multiplies the ~2.4k-day frame by a CONSTANT 3*(2G+1) = 63
(tau, slope) combos — ~150k rows at any SF, trivially parallel. The
only data-sized stage is the one orders scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

G = 10
TAUS = (10, 50, 90)

_TAU_VALUES = ", ".join(f"({t})" for t in TAUS)
_J_VALUES = ", ".join(f"({j})" for j in range(-G, G + 1))

_QREG_ORACLE = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS day,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS x
  FROM orders GROUP BY 1
),
idx AS (
  SELECT x, CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS t,
         CAST(count(*) OVER () AS BIGINT) AS n,
         max(x) OVER () AS xmax, min(x) OVER () AS xmin
  FROM daily
),
q AS (
  SELECT GREATEST(CAST(1 AS BIGINT), (max(xmax) - max(xmin)) // (max(n) * {G}))
           AS step, max(n) AS n
  FROM idx
),
grid AS (
  SELECT CAST(j.j AS BIGINT) * q.step AS slope, q.step, q.n
  FROM (SELECT * FROM (VALUES {_J_VALUES}) v(j)) j CROSS JOIN q
),
combos AS (
  SELECT tau.tau, g.slope, g.step, g.n
  FROM (SELECT * FROM (VALUES {_TAU_VALUES}) v(tau)) tau CROSS JOIN grid g
),
resid AS (
  SELECT c.tau, c.slope, c.step, c.n, i.t,
         i.x - c.slope * i.t AS e
  FROM combos c CROSS JOIN idx i
),
ranked AS (
  SELECT *, CAST(row_number() OVER (PARTITION BY tau, slope ORDER BY e)
                 AS BIGINT) AS rk
  FROM resid
),
quant AS (
  SELECT tau, slope, e AS q_int
  FROM ranked
  WHERE rk = (tau * n + 99) // 100
),
losses AS (
  SELECT r.tau, r.slope, r.step, r.n, qt.q_int,
         sum(CASE WHEN r.e >= qt.q_int
             THEN CAST(r.tau AS HUGEINT) * (r.e - qt.q_int)
             ELSE CAST(r.tau - 100 AS HUGEINT) * (r.e - qt.q_int)
             END) AS loss
  FROM resid r JOIN quant qt ON r.tau = qt.tau AND r.slope = qt.slope
  GROUP BY r.tau, r.slope, r.step, r.n, qt.q_int
),
best AS (
  SELECT *, row_number() OVER (PARTITION BY tau ORDER BY loss, slope) AS pick
  FROM losses
)
SELECT CAST(tau AS BIGINT) AS tau,
       slope AS slope_cents_per_day,
       q_int AS intercept_cents,
       CAST(loss AS DOUBLE) / 100 AS pinball_loss_cents,
       n AS n_days, step AS grid_step_cents
FROM best WHERE pick = 1
ORDER BY tau
"""


@register("time_series_quantile_trend", oracle=_QREG_ORACLE)
def time_series_quantile_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3 rows (tau = 10/50/90): grid-searched quantile-regression line
    over daily revenue — slope, intercept, exact pinball loss."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    daily = orders.groupBy(F.to_date("o_orderdate").alias("day")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("x")
    )
    # Single linear pipeline (r12): the former q -> grid -> combos ->
    # resid chain was three nested broadcast exchanges (each a separate
    # blocking job) and the quantile re-entered via a fourth broadcast
    # join that re-evaluated resid. Every per-series scalar (n, xmax,
    # xmin — hence step) is already ON each idx row via the wall window,
    # so the (tau, j) grid is two explodes (no joins), and the tau-
    # quantile re-attaches via a second window over the SAME (tau,
    # slope) partitioning — one exchange serves row_number, the
    # quantile pick and the pinball groupBy. Identical integer
    # arithmetic throughout; no persist needed (every frame has exactly
    # one consumer).
    wd = Window.orderBy("day")
    wall = Window.partitionBy()
    idx = daily.select(
        "x",
        F.row_number().over(wd).cast("bigint").alias("t"),
        F.count("*").over(wall).cast("bigint").alias("n"),
        F.max("x").over(wall).alias("xmax"),
        F.min("x").over(wall).alias("xmin"),
    )
    step = F.greatest(
        F.lit(1).cast("bigint"), F.expr(f"(xmax - xmin) div (n * {G})")
    )
    combos = (
        idx.select("t", "x", "n", step.alias("step"))
        .withColumn("tau", F.explode(F.array(*[F.lit(t) for t in TAUS])))
        .withColumn(
            "j",
            F.explode(
                F.sequence(
                    F.lit(-G).cast("bigint"), F.lit(G).cast("bigint")
                )
            ),
        )
        .select(
            "tau",
            (F.col("j") * F.col("step")).alias("slope"),
            "step",
            "n",
            "t",
            "x",
        )
    )
    resid = combos.select(
        "tau",
        "slope",
        "step",
        "n",
        "t",
        (F.col("x") - F.col("slope") * F.col("t")).alias("e"),
    )
    wq = Window.partitionBy("tau", "slope").orderBy("e")
    wqa = Window.partitionBy("tau", "slope")
    ranked = resid.withColumn(
        "rk", F.row_number().over(wq).cast("bigint")
    )
    with_q = ranked.withColumn(
        "q_int",
        F.max(
            F.when(F.col("rk") == F.expr("(tau * n + 99) div 100"), F.col("e"))
        ).over(wqa),
    )
    _dec = "decimal(38,0)"
    losses = with_q.groupBy("tau", "slope", "step", "n", "q_int").agg(
        F.sum(
            F.when(
                F.col("e") >= F.col("q_int"),
                F.col("tau").cast(_dec) * (F.col("e") - F.col("q_int")),
            ).otherwise(
                (F.col("tau") - 100).cast(_dec)
                * (F.col("e") - F.col("q_int"))
            )
        ).alias("loss")
    )
    best = losses.withColumn(
        "pick",
        F.row_number().over(Window.partitionBy("tau").orderBy("loss", "slope")),
    ).filter(F.col("pick") == 1)
    return best.select(
        F.col("tau").cast("bigint").alias("tau"),
        F.col("slope").alias("slope_cents_per_day"),
        F.col("q_int").alias("intercept_cents"),
        (F.col("loss").cast("double") / 100).alias("pinball_loss_cents"),
        F.col("n").alias("n_days"),
        F.col("step").alias("grid_step_cents"),
    ).orderBy("tau")
