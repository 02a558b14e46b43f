"""Interval coverage by sweep-line — the in-flight order backlog.

"How many orders were open on each day" is interval-stabbing coverage:
order k covers every day of [orderdate, last shipdate]. The naive plan
joins the day grid against every interval (|days| x |orders| work — an
O(N) blowup per calendar day that no cluster survives at 100 TB). The
engine's plan is the classic SWEEP-LINE reduction: each interval emits
two DELTAS (+1 at start, -1 the day after end), deltas hash-aggregate
per day, and a prefix sum over the CALENDAR reconstructs the coverage
curve. Corpus-sized work collapses to one join + two hash-aggs; the
only ordered pass runs on the |days|-sized delta series.

The DuckDB oracle deliberately spells the NAIVE semantics (a
day-stabbing range predicate per grid day): the hash match proves the
sweep-line algebra equals direct interval stabbing — the same
algebraic-equivalence bar as operators/increment.py.

Normalization (both engines, identically): the driver's synthetic
lineitem has ~20% of orders whose max shipdate precedes the orderdate;
an order is defined open at least on its order day, so the interval
end is clamped to GREATEST(end, start). Orders with no lineitems have
no ship evidence and are excluded (inner join).

Determinism: everything is dates, BIGINT counts, and an integer prefix
sum — no floats anywhere.

Scale: the per-order interval agg partitions by orderkey; the delta
agg by day (calendar cardinality); the final cumulative sum is a
single-partition window over the |days|-row frame — thousands of rows
at any corpus size (the operators/resample.py argument). Nothing else
is ordered, nothing collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_BACKLOG_ORACLE = """
WITH iv AS (
  SELECT o.o_orderkey,
         CAST(o.o_orderdate AS DATE) AS s,
         GREATEST(CAST(max(l.l_shipdate) AS DATE),
                  CAST(o.o_orderdate AS DATE)) AS e
  FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
),
bounds AS (SELECT min(s) AS d0, max(e) AS d1 FROM iv),
grid AS (
  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
)
SELECT g.day,
       CAST((SELECT count(*) FROM iv WHERE iv.s <= g.day AND iv.e >= g.day)
            AS BIGINT) AS open_orders,
       CAST((SELECT count(*) FROM iv WHERE iv.s = g.day) AS BIGINT) AS started,
       CAST((SELECT count(*) FROM iv WHERE iv.e = g.day) AS BIGINT) AS completed
FROM grid g
ORDER BY g.day
"""


@register("order_backlog_timeline", oracle=_BACKLOG_ORACLE)
def order_backlog_timeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense daily timeline of the open-order backlog (sweep-line
    prefix sum), with per-day started/completed counters."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("s")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship")
    )
    iv = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("o_orderkey", "s")
        .agg(F.max("ship").alias("maxship"))
        .select("o_orderkey", "s", F.greatest("maxship", "s").alias("e"))
        .persist()  # interval frame: |orders|-sized, reused by 3 branches
    )
    # Sweep deltas: +1 on start day, -1 the day AFTER end; started /
    # completed counters ride the same rows (0-filled on the other leg).
    deltas = (
        iv.select(
            F.col("s").alias("day"),
            F.lit(1).alias("d"),
            F.lit(1).alias("st"),
            F.lit(0).alias("co"),
        )
        .unionByName(
            iv.select(
                F.date_add("e", 1).alias("day"),
                F.lit(-1).alias("d"),
                F.lit(0).alias("st"),
                F.lit(0).alias("co"),
            )
        )
        .unionByName(
            iv.select(
                F.col("e").alias("day"),
                F.lit(0).alias("d"),
                F.lit(0).alias("st"),
                F.lit(1).alias("co"),
            )
        )
        .groupBy("day")
        .agg(
            F.sum("d").alias("net"),
            F.sum("st").alias("started"),
            F.sum("co").alias("completed"),
        )
    )
    bounds = iv.agg(F.min("s").alias("d0"), F.max("e").alias("d1"))
    grid = bounds.select(
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day")
    )
    cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        grid.join(deltas, "day", "left")
        .select(
            "day",
            F.coalesce("net", F.lit(0)).alias("net"),
            F.coalesce("started", F.lit(0)).cast("bigint").alias("started"),
            F.coalesce("completed", F.lit(0)).cast("bigint").alias("completed"),
        )
        .withColumn("open_orders", F.sum("net").over(cum).cast("bigint"))
        .select("day", "open_orders", "started", "completed")
        .orderBy("day")
    )
