"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``cdc_stream_batch_etl_spark``; this module just
exposes its registry.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cdc_stream_batch_etl_spark import registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (customer segmentation: J1 + A1-A4 + A9 + C1-C4) on
    sf0.001; driver checks rows>0."""
    registry.load_all()
    return registry.QUERIES["customer_segments"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    registry.load_all()
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    registry.load_all()
    return dict(registry.ORACLES)
