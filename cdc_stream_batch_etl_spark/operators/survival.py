"""Kaplan-Meier repurchase survival — time-to-next-order with
censoring (Kaplan & Meier, JASA 1958; beyond-reference, SURVEY §2.11:
the survival-analysis family's debut, the rigorous form of the
question customer_order_gaps and retention_cohorts approximate).

"How long until a customer orders again?" read off raw gap averages
is censoring-biased: customers whose next order hasn't happened YET
contribute nothing, so the estimate skews fast. KM handles that: every
consecutive-order gap is an EVENT at its week, every customer's tail
wait (last order → end of data) is a CENSORED observation, and the
survivor curve multiplies per-week factors (1 − d_t/n_t) where n_t
counts everyone still at risk — censored subjects leave the risk set
without counting as events. The output is the curve a retention model
or a marketing-timing decision reads: per event week, the risk-set
size, events, censored exits, hazard, and S(t).

Determinism: gaps and the risk set are exact integers (weeks via
integer div); the hazard is one division; S(t) is a PREFIX PRODUCT
folded in week order over the one report-sized factor array (the
centroids sorted-fold idiom with ×: Spark seeds aggregate at 1.0,
DuckDB list_reduce seeds at the first factor — 1.0·f rounds to f
exactly, so the chains agree bitwise).

Scale: one orders scan → one customer-keyed window (lead) builds
gaps; observations collapse to ≤ a few hundred week rows (the
calendar bounds them — tscv's constant-frame argument), and the
suffix-sum risk set + prefix-product curve run on that report-sized
frame. The O(n²) slice-fold evaluates ≤ 350² lambda steps on ONE row
— constant work, plan-visible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_KM_ORACLE = """
WITH o AS (
  SELECT o_custkey, o_orderdate,
         lead(o_orderdate) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey) AS nxt
  FROM orders
),
horizon AS (SELECT max(o_orderdate) AS max_d FROM orders),
obs AS (
  SELECT CASE WHEN nxt IS NOT NULL
              THEN date_diff('day', CAST(o_orderdate AS DATE), CAST(nxt AS DATE)) // 7
              ELSE date_diff('day', CAST(o_orderdate AS DATE), CAST(max_d AS DATE)) // 7
              END AS t,
         CAST(nxt IS NOT NULL AS INTEGER) AS ev
  FROM o CROSS JOIN horizon
),
perweek AS (
  SELECT t, CAST(sum(ev) AS BIGINT) AS d,
         CAST(count(*) - sum(ev) AS BIGINT) AS c,
         CAST(count(*) AS BIGINT) AS m
  FROM obs GROUP BY t
),
risk AS (
  SELECT t, d, c,
         CAST(sum(m) OVER (ORDER BY t DESC) AS BIGINT) AS n_risk
  FROM perweek
),
factors AS (
  SELECT t, d, c, n_risk,
         1.0 - CAST(d AS DOUBLE) / n_risk AS factor
  FROM risk WHERE d > 0
),
packed AS (
  SELECT list(struct_pack(t := t, d := d, c := c, n_risk := n_risk,
                          factor := factor) ORDER BY t) AS arr
  FROM factors
)
SELECT s.t AS t_weeks, s.n_risk, s.d AS d_events, s.c AS n_censored,
       CAST(s.d AS DOUBLE) / s.n_risk AS hazard,
       s.s AS survival
FROM (
  SELECT unnest(list_transform(arr, (x, i) -> struct_pack(
           t := x.t, d := x.d, c := x.c, n_risk := x.n_risk,
           s := list_reduce(list_transform(arr[1:i], y -> y.factor),
                            (a, b) -> a * b)))) AS s
  FROM packed
)
ORDER BY t_weeks
"""


@register("repurchase_survival_km", oracle=_KM_ORACLE)
def repurchase_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(t_weeks, n_risk, d_events, n_censored, hazard, survival) — the
    Kaplan-Meier curve of weeks-to-next-order with tail censoring."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    o = orders.select(
        "o_custkey",
        "o_orderdate",
        F.lead("o_orderdate").over(w).alias("nxt"),
    )
    horizon = orders.agg(F.max("o_orderdate").alias("max_d"))
    obs = o.crossJoin(F.broadcast(horizon)).select(
        F.when(
            F.col("nxt").isNotNull(),
            F.expr("datediff(nxt, o_orderdate) div 7"),
        )
        .otherwise(F.expr("datediff(max_d, o_orderdate) div 7"))
        .alias("t"),
        F.col("nxt").isNotNull().cast("int").alias("ev"),
    )
    perweek = obs.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d"),
        (F.count("*") - F.sum("ev")).cast("bigint").alias("c"),
        F.count("*").cast("bigint").alias("m"),
    )
    # at-risk = suffix sum of observations — report-sized single
    # partition, calendar-bounded (the tscv constant-frame argument)
    risk = perweek.withColumn(
        "n_risk",
        F.sum("m")
        .over(Window.orderBy(F.desc("t")).rowsBetween(Window.unboundedPreceding, 0))
        .cast("bigint"),
    )
    factors = risk.filter(F.col("d") > 0).select(
        "t",
        "d",
        "c",
        "n_risk",
        (F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk")).alias("factor"),
    )
    packed = factors.agg(
        F.expr(
            "array_sort(collect_list(struct(t, d, c, n_risk, factor))) AS arr"
        )
    )
    unpacked = packed.select(
        F.explode(
            F.expr(
                """
                transform(arr, (x, i) -> struct(
                  x.t AS t, x.d AS d, x.c AS c, x.n_risk AS n_risk,
                  aggregate(slice(arr, 1, i + 1), cast(1.0 as double),
                            (a, y) -> a * y.factor) AS s))
                """
            )
        ).alias("s")
    )
    return unpacked.select(
        F.col("s.t").alias("t_weeks"),
        F.col("s.n_risk").alias("n_risk"),
        F.col("s.d").alias("d_events"),
        F.col("s.c").alias("n_censored"),
        (F.col("s.d").cast("double") / F.col("s.n_risk")).alias("hazard"),
        F.col("s.s").alias("survival"),
    ).orderBy("t_weeks")
