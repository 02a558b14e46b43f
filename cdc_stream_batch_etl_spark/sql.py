"""Raw-SQL surface: the reference's query style, executed by Catalyst.

The reference pushes SQL strings to Postgres (utils.py:43-50); a migrating
user can paste those queries here (table names per the FIXTURES.md §3
mapping) and run them unchanged — Spark SQL is ANSI-compatible for the
whole construct inventory the reference uses (left joins, group-by
aggregates, COALESCE, BETWEEN, CASE, ORDER BY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import register_views


def run_sql(spark: SparkSession, sf_dir: str, query: str) -> DataFrame:
    """Run one ANSI SQL query against the testdata tables (registered as
    temp views). Filters/projections still push into the parquet scans —
    spark.sql and the DataFrame API share the same optimizer."""
    register_views(spark, sf_dir)
    return spark.sql(query)
