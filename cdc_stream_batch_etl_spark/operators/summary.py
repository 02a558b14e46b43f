"""Batch-summary operators: frequency tables and scalar rollups over the
transformed outputs (reference generate_batch_summary,
/root/reference/python/batch_processor.py:195-234: value_counts → A10,
mean/sum scalars → A11, per-segment spend → A13 airflow_etl_utils.py:
250-258), plus the O4 seeded random pick.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .segments import _ORACLE as _SEGMENTS_ORACLE
from .segments import customer_segments
from .products import _ORACLE as _PRODUCTS_ORACLE
from .products import product_insights

_SEG_HIST_ORACLE = f"""
WITH seg AS ({_SEGMENTS_ORACLE})
SELECT customer_segment,
       count(*) AS customer_count,
       CAST(sum(CAST(total_spent AS DECIMAL(18,2))) AS DOUBLE) AS segment_revenue,
       CAST(sum(CAST(total_spent AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_spent
FROM seg
GROUP BY 1
"""


@register("segment_histogram", oracle=_SEG_HIST_ORACLE)
def segment_histogram(
    spark: SparkSession, sf_dir: str, source_df: DataFrame | None = None
) -> DataFrame:
    """A10/A13 + A11: customers per segment with revenue scalars —
    a re-aggregation of the segmentation output, exactly as the reference
    re-counts its transformed frame (batch_processor.py:211-214).

    Standalone (driver/oracle) it recomputes ``customer_segments``; pass
    ``source_df`` (the runner's materialized output) to make it a single
    scan + one exchange over a 1500-row table instead of re-running the
    6-scan upstream — at 100× the upstream recompute dominates."""
    seg = source_df if source_df is not None else customer_segments(spark, sf_dir)
    return seg.groupBy("customer_segment").agg(
        F.count("*").alias("customer_count"),
        F.sum(F.col("total_spent").cast("decimal(18,2)")).cast("double").alias("segment_revenue"),
        (
            F.sum(F.col("total_spent").cast("decimal(18,2)")).cast("double") / F.count("*")
        ).alias("avg_spent"),
    )


_STOCK_HIST_ORACLE = f"""
WITH p AS ({_PRODUCTS_ORACLE})
SELECT stock_status, performance_category, count(*) AS product_count
FROM p
GROUP BY 1, 2
"""


@register("stock_status_histogram", oracle=_STOCK_HIST_ORACLE)
def stock_status_histogram(
    spark: SparkSession, sf_dir: str, source_df: DataFrame | None = None
) -> DataFrame:
    """A10: value_counts over the product labels (batch_processor.py:220-221).

    ``source_df`` short-circuits the ``product_insights`` recompute (8
    scans / 2 SMJ) down to one scan of the runner's materialized output."""
    src = source_df if source_df is not None else product_insights(spark, sf_dir)
    return src.groupBy("stock_status", "performance_category").agg(
        F.count("*").alias("product_count")
    )


@register("random_pick")  # seeded RNG is engine-specific: rows-only check
def random_pick(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O4: ORDER BY RANDOM() LIMIT 1 (data_generator.py:157,166), seeded
    for run-to-run determinism within Spark (rand(seed) has no DuckDB
    equivalent, so no SQL oracle)."""
    from ..catalog import load_table

    customer = load_table(spark, sf_dir, "customer")
    return customer.orderBy(F.rand(42)).limit(1)
