"""Relational data-quality gate — the profile a pipeline asserts on ingest.

The reference's validation layer spot-checks row counts and referential
integrity after each batch (reference scripts/validate_pipeline.py shape;
SURVEY §5); a distributed pipeline profiles every load the same way:
null counts, key cardinality, and value bounds per column, compared
against expectations before the data is allowed downstream. This is the
relational sibling of text/datacard.py's corpus_datacard.

One WIDE row, natively typed (no per-column string casts — cross-engine
string formatting of floats/dates is exactly the flakiness a correctness
gate must not depend on). Plan: a single scan feeding one scalar
aggregate — every metric is an agg expression, so the whole profile is
one pass with map-side partials and a 1-row result. At 100 TB this is
the cheapest possible full-table statement (count/min/max/null fold per
column); the only caveat is count(DISTINCT) which Spark executes as an
expand+two-stage agg — acceptable for a key column, and the expand is
per-distinct-agg, not per-row^2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_QUALITY_REPORT_ORACLE = """
SELECT CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS orderkey_distinct,
       CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS orderkey_nulls,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS custkey_distinct,
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS custkey_nulls,
       min(o_totalprice) AS totalprice_min,
       max(o_totalprice) AS totalprice_max,
       CAST(sum(CASE WHEN o_totalprice IS NULL OR o_totalprice < 0
                     THEN 1 ELSE 0 END) AS BIGINT) AS totalprice_bad,
       CAST(min(o_orderdate) AS DATE) AS orderdate_min,
       CAST(max(o_orderdate) AS DATE) AS orderdate_max,
       CAST(count(DISTINCT o_orderstatus) AS BIGINT) AS status_distinct,
       CAST(sum(CASE WHEN o_orderstatus NOT IN ('O','F','P')
                     THEN 1 ELSE 0 END) AS BIGINT) AS status_unexpected
FROM orders
"""


@register("data_quality_report", oracle=_QUALITY_REPORT_ORACLE)
def data_quality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row quality profile of orders: nulls, key cardinalities, value
    bounds, and domain violations — the ingest gate's input."""
    o = load_table(spark, sf_dir, "orders")
    nulls = lambda c: F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))  # noqa: E731
    return o.agg(
        F.count("*").alias("n_rows"),
        F.countDistinct("o_orderkey").alias("orderkey_distinct"),
        nulls("o_orderkey").cast("bigint").alias("orderkey_nulls"),
        F.countDistinct("o_custkey").alias("custkey_distinct"),
        nulls("o_custkey").cast("bigint").alias("custkey_nulls"),
        F.min("o_totalprice").alias("totalprice_min"),
        F.max("o_totalprice").alias("totalprice_max"),
        F.sum(
            F.when(F.col("o_totalprice").isNull() | (F.col("o_totalprice") < 0), 1)
            .otherwise(0)
        )
        .cast("bigint")
        .alias("totalprice_bad"),
        F.min(F.to_date("o_orderdate")).alias("orderdate_min"),
        F.max(F.to_date("o_orderdate")).alias("orderdate_max"),
        F.countDistinct("o_orderstatus").alias("status_distinct"),
        F.sum(
            F.when(~F.col("o_orderstatus").isin("O", "F", "P"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("status_unexpected"),
    )
