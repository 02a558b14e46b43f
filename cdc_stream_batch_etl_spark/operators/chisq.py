"""Chi-square independence screen — event_type × weekday contingency.

Completes the statistical data-quality family (benford.py screens
digit distributions, value_drift screens population shift): a feed
whose event mix depends on weekday in a way it historically didn't —
or suddenly doesn't when it should — shows up as large per-cell
chi-square contributions in the (event_type, weekday) contingency
table. Per-cell output (observed, expected, contribution) is the
surface auditors read; no table-level statistic is emitted because a
float SUM over cells is parallel-order-dependent — the per-cell values
are each the result of exact-integer inputs and a fixed two-operation
float expression, so they stay hash-exact cross-engine.

Determinism: cell/row/column/grand totals are pure BIGINT counts
(window sums over the |types|×7 aggregated frame — exact). Expected
count and contribution are computed in double with the IDENTICAL
expression shape in both engines (one multiply, one divide — no
accumulation), then round 6.

Weekday portability: Spark ``weekday(ts)`` is 0=Monday..6; DuckDB
``isodow`` is 1=Monday..7 — the +1 shift makes them equal.

Scale: one scan of events, ONE corpus-sized hash agg onto
(event_type, weekday); the window sums and the arithmetic run on the
|types|×7 cell frame. Nothing downstream of the first shuffle is
proportional to corpus rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_CHISQ_ORACLE = """
WITH cells AS (
  SELECT event_type, CAST(isodow(ts) AS INT) AS weekday,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
tot AS (
  SELECT *,
         SUM(n) OVER (PARTITION BY event_type) AS rt,
         SUM(n) OVER (PARTITION BY weekday) AS ct,
         SUM(n) OVER () AS gt
  FROM cells
)
SELECT event_type, weekday, n,
       round(CAST(rt AS DOUBLE) * ct / gt, 6) AS expected_r,
       round(pow(n - CAST(rt AS DOUBLE) * ct / gt, 2)
             / (CAST(rt AS DOUBLE) * ct / gt), 6) AS chi_r
FROM tot
ORDER BY event_type, weekday
"""


@register("chisq_independence", oracle=_CHISQ_ORACLE)
def chisq_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell observed/expected/chi-square contribution for the
    event_type × weekday contingency table."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type",
        (F.weekday("ts") + 1).cast("int").alias("weekday"),
    ).agg(F.count("*").cast("bigint").alias("n"))
    tot = cells.select(
        "event_type",
        "weekday",
        "n",
        F.sum("n").over(Window.partitionBy("event_type")).alias("rt"),
        F.sum("n").over(Window.partitionBy("weekday")).alias("ct"),
        F.sum("n").over(Window.partitionBy()).alias("gt"),
    )
    expected = F.col("rt").cast("double") * F.col("ct") / F.col("gt")
    return tot.select(
        "event_type",
        "weekday",
        "n",
        F.round(expected, 6).alias("expected_r"),
        F.round(
            F.pow(F.col("n") - expected, 2) / expected, 6
        ).alias("chi_r"),
    ).orderBy("event_type", "weekday")
