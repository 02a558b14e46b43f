"""Projection / predicate operators F1-F4, F8-F10 — the reference's
ingest-time and query-time filters as pushdown-friendly DataFrame filters.

Each of these compiles to a parquet scan with PushedFilters + pruned
ReadSchema (asserted in tests/test_plans.py) — the property that matters at
100 TB, where a filter that doesn't reach the scan reads the whole table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..config import DEFAULT_CONFIG
from ..registry import register

_T = DEFAULT_CONFIG.thresholds

_SMALL_ORDER_ORACLE = f"""
SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
FROM orders
WHERE o_totalprice >= {_T.small_order}
"""


@register("small_order_filter", oracle=_SMALL_ORDER_ORACLE)
def small_order_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8: drop small orders at ingest (airflow_etl_utils.py:130-132,
    total < 10.0 rescaled) with explicit projection (F1)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(F.col("o_totalprice") >= _T.small_order).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus"
    )


_OP_FILTER_ORACLE = """
SELECT event_id, user_id, ts, value
FROM events
WHERE event_type = 'signup' AND value IS NOT NULL
"""


@register("event_op_filter", oracle=_OP_FILTER_ORACLE)
def event_op_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F4 + F9: keep only creates with non-null payload
    (stream_processor.py:50-51 `op == 'c' and after is not None`)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.filter((F.col("event_type") == "signup") & F.col("value").isNotNull())
        .select("event_id", "user_id", "ts", "value")
    )


_TIME_RANGE_ORACLE = """
SELECT event_id, user_id, event_type, ts, value
FROM events
WHERE ts >= TIMESTAMP '2024-01-10 00:00:00' AND ts <= TIMESTAMP '2024-01-17 00:00:00'
"""


@register("time_range_filter", oracle=_TIME_RANGE_ORACLE)
def time_range_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F2: the 24h batch-window predicate (batch_processor.py:38,244-246)
    as a pushdown-able BETWEEN over event time."""
    events = load_table(spark, sf_dir, "events")
    return events.filter(
        F.col("ts").between("2024-01-10 00:00:00", "2024-01-17 00:00:00")
    ).select("event_id", "user_id", "event_type", "ts", "value")


_DISJUNCTIVE_ORACLE = """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice, o.o_orderdate, c.c_mktsegment
FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
WHERE (o.o_orderdate BETWEEN TIMESTAMP '1996-01-01' AND TIMESTAMP '1996-12-31')
   OR (o.o_totalprice > 450000)
"""


@register("disjunctive_filter", oracle=_DISJUNCTIVE_ORACLE)
def disjunctive_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3: disjunctive range predicate applied post-join, preserving the
    reference's filter-after-left-join semantics (batch_processor.py:67-68)."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    joined = orders.alias("o").join(
        customer.alias("c"), F.col("o.o_custkey") == F.col("c.c_custkey"), "left"
    )
    return joined.filter(
        (F.col("o.o_orderdate").between("1996-01-01", "1996-12-31"))
        | (F.col("o.o_totalprice") > 450000)
    ).select("o.o_orderkey", "o.o_custkey", "o.o_totalprice", "o.o_orderdate", "c.c_mktsegment")
