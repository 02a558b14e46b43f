"""ANALYZE-style column statistics — the optimizer's food.

Postgres keeps its planner fed via ANALYZE (the reference leans on it
implicitly for every query it pushes down, SURVEY §4); Spark's CBO
(`spark.sql.cbo.enabled` + `ANALYZE TABLE ... COMPUTE STATISTICS FOR
COLUMNS`) eats the same diet: per-column null counts, NDV, min/max.
This operator is that collection pass as a first-class query over the
orders table — ONE scan computing every statistic for every column
simultaneously (the multi-aggregate single-pass shape ANALYZE jobs
use), then ``stack`` (Spark's unpivot generator — a relational surface
no other operator exhibits) turns the 1-row wide frame into one row
per column.

Determinism (full DuckDB oracle): counts and NDVs are exact integers;
min/max of numerics are exact doubles read from storage (no
arithmetic); avg string length = two exact BIGINT sums divided once
(same two literals both engines). Exact ``count(DISTINCT)`` per column
is the honest test-scale spelling — at 100 TB an ANALYZE job swaps in
approx_count_distinct / the KMV rung (operators/sketches.py) per
column, trading the expand-operator blowup for sketch error; the
single-scan shape is unchanged.

Scale: one scan + one (expanded) aggregation, no joins, no windows;
the unpivot runs on a 1-row frame. The expand cost (|cols| copies of
each row feeding the distinct aggregates) is the known price of exact
multi-column NDV — the documented sketch swap removes it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_STATS_ORACLE = """
WITH base AS (SELECT * FROM orders)
SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
       CAST(count(*) - count(o_orderkey) AS BIGINT) AS n_nulls,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS ndv,
       CAST(min(o_orderkey) AS DOUBLE) AS min_num,
       CAST(max(o_orderkey) AS DOUBLE) AS max_num,
       CAST(NULL AS DOUBLE) AS avg_len_r
FROM base
UNION ALL
SELECT 'o_custkey', count(*),
       CAST(count(*) - count(o_custkey) AS BIGINT),
       CAST(count(DISTINCT o_custkey) AS BIGINT),
       CAST(min(o_custkey) AS DOUBLE), CAST(max(o_custkey) AS DOUBLE),
       CAST(NULL AS DOUBLE)
FROM base
UNION ALL
SELECT 'o_totalprice', count(*),
       CAST(count(*) - count(o_totalprice) AS BIGINT),
       CAST(count(DISTINCT o_totalprice) AS BIGINT),
       min(o_totalprice), max(o_totalprice), CAST(NULL AS DOUBLE)
FROM base
UNION ALL
SELECT 'o_orderstatus', count(*),
       CAST(count(*) - count(o_orderstatus) AS BIGINT),
       CAST(count(DISTINCT o_orderstatus) AS BIGINT),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       round(CAST(SUM(CAST(len(o_orderstatus) AS BIGINT)) AS DOUBLE)
             / count(o_orderstatus), 6)
FROM base
UNION ALL
SELECT 'o_orderpriority', count(*),
       CAST(count(*) - count(o_orderpriority) AS BIGINT),
       CAST(count(DISTINCT o_orderpriority) AS BIGINT),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE),
       round(CAST(SUM(CAST(len(o_orderpriority) AS BIGINT)) AS DOUBLE)
             / count(o_orderpriority), 6)
FROM base
"""

_NUMERIC = ("o_orderkey", "o_custkey", "o_totalprice")
_STRINGS = ("o_orderstatus", "o_orderpriority")


@register("table_stats", oracle=_STATS_ORACLE)
def table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column statistics of ``orders`` from ONE scan: nulls, exact
    NDV, numeric min/max, string mean length — unpivoted via stack."""
    orders = load_table(spark, sf_dir, "orders")
    aggs = [F.count("*").alias("n_rows")]
    for c in _NUMERIC + _STRINGS:
        aggs += [
            F.sum(F.col(c).isNull().cast("bigint")).alias(f"nulls_{c}"),
            F.countDistinct(c).cast("bigint").alias(f"ndv_{c}"),
        ]
    for c in _NUMERIC:
        aggs += [
            F.min(c).cast("double").alias(f"min_{c}"),
            F.max(c).cast("double").alias(f"max_{c}"),
        ]
    for c in _STRINGS:
        aggs += [
            F.sum(F.length(c).cast("bigint")).alias(f"lensum_{c}"),
            F.count(c).alias(f"cnt_{c}"),
        ]
    wide = orders.agg(*aggs)

    def leg(c: str) -> str:
        if c in _NUMERIC:
            return (
                f"'{c}', nulls_{c}, ndv_{c}, min_{c}, max_{c}, "
                "CAST(NULL AS DOUBLE)"
            )
        return (
            f"'{c}', nulls_{c}, ndv_{c}, CAST(NULL AS DOUBLE), "
            f"CAST(NULL AS DOUBLE), "
            f"round(CAST(lensum_{c} AS DOUBLE) / cnt_{c}, 6)"
        )

    cols = _NUMERIC + _STRINGS
    stack = ", ".join(leg(c) for c in cols)
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(column_name, n_nulls, ndv, min_num, max_num, avg_len_r)"
        ),
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "ndv", "min_num", "max_num", "avg_len_r")
