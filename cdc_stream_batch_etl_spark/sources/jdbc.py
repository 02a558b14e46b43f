"""JDBC source — the production wiring for the reference's Postgres scans
(SURVEY §2.1 S1: utils.py:43-50 `execute_query` pushes whole SQL strings
to Postgres).

Spark mapping: `spark.read.jdbc` with predicate/projection pushdown from
Catalyst — the reference's hand-written SQL WHERE clauses become DataFrame
filters that Spark pushes into the remote scan automatically. For the
large-table case the reader is range-partitioned on the primary key so N
executors issue N disjoint range scans in parallel (the reference reads
every table on one connection).

No database exists in the test container — this builder is config-only
(exercised for option construction); the query graphs it feeds are tested
against parquet through catalog.load_table, which presents the identical
DataFrame surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

DEFAULT_FETCH_SIZE = 10_000


def jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 32,
    user: str | None = None,
    password: str | None = None,
) -> DataFrame:
    """Parallel JDBC scan of one table.

    With partition_column + bounds, Spark issues num_partitions disjoint
    `WHERE col BETWEEN ...` range scans — size bounds from
    `SELECT min(pk), max(pk)` before calling (cheap, index-only in PG).
    Without them, a single-connection scan (only for small dimensions).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("fetchsize", str(DEFAULT_FETCH_SIZE))
    )
    if user is not None:
        reader = reader.option("user", user)
    if password is not None:
        reader = reader.option("password", password)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()
