"""Property-based parity (hypothesis) of the label chains against literal
pandas transliterations of the reference's mask-overwrite code
(/root/reference/python/batch_processor.py:113-128, 157-173). The SURVEY
§2.5 hard part: pandas sequential mask assignment inverts naive `when`
ordering — these tests explore the full threshold/value space mechanically
so the derived precedence is proven, not asserted."""

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.functions.labels import (
    customer_segment,
    performance_category,
    stock_status,
)

money = st.floats(min_value=0, max_value=1000, allow_nan=False, width=32)
counts = st.integers(min_value=0, max_value=50)


def _ref_customer_segment(df, p80_spent, p60_spent, p80_orders):
    """Literal transliteration of batch_processor.py:113-128."""
    df = df.copy()
    df["customer_segment"] = "Bronze"
    df.loc[
        (df.total_spent >= p80_spent) & (df.total_orders >= p80_orders),
        "customer_segment",
    ] = "Gold"
    df.loc[
        ((df.total_spent >= p60_spent) | (df.total_orders >= p80_orders))
        & (df.customer_segment != "Gold"),
        "customer_segment",
    ] = "Silver"
    return df["customer_segment"]


def _ref_performance(df, p80_rev, p80_turn):
    """Literal transliteration of batch_processor.py:157-167 (sequential
    overwrites: revenue → turnover → both)."""
    df = df.copy()
    df["performance_category"] = "Low Performer"
    df.loc[df.total_revenue >= p80_rev, "performance_category"] = "High Revenue"
    df.loc[df.turnover_rate >= p80_turn, "performance_category"] = "Fast Moving"
    df.loc[
        (df.total_revenue >= p80_rev) & (df.turnover_rate >= p80_turn),
        "performance_category",
    ] = "Star"
    return df["performance_category"]


def _ref_stock(df):
    """Literal transliteration of batch_processor.py:170-173."""
    df = df.copy()
    df["stock_status"] = "Normal"
    df.loc[df.stock_quantity <= 10, "stock_status"] = "Low Stock"
    df.loc[df.stock_quantity <= 0, "stock_status"] = "Out of Stock"
    df.loc[df.stock_quantity >= 500, "stock_status"] = "Overstock"
    return df["stock_status"]


@given(
    rows=st.lists(st.tuples(money, counts), min_size=1, max_size=20),
    p80_spent=money,
    p60_spent=money,
    p80_orders=counts,
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_customer_segment_matches_pandas_reference(spark, rows, p80_spent, p60_spent, p80_orders):
    pdf = pd.DataFrame(rows, columns=["total_spent", "total_orders"])
    expected = _ref_customer_segment(pdf, p80_spent, p60_spent, p80_orders).tolist()
    got = [
        r.seg
        for r in spark.createDataFrame(pdf)
        .withColumn(
            "seg",
            customer_segment(
                F.col("total_spent"),
                F.col("total_orders"),
                F.lit(p80_spent),
                F.lit(p60_spent),
                F.lit(p80_orders),
            ),
        )
        .collect()
    ]
    assert got == expected


@given(
    rows=st.lists(st.tuples(money, money), min_size=1, max_size=20),
    p80_rev=money,
    p80_turn=money,
)
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_performance_matches_pandas_reference(spark, rows, p80_rev, p80_turn):
    pdf = pd.DataFrame(rows, columns=["total_revenue", "turnover_rate"])
    expected = _ref_performance(pdf, p80_rev, p80_turn).tolist()
    got = [
        r.cat
        for r in spark.createDataFrame(pdf)
        .withColumn(
            "cat",
            performance_category(
                F.col("total_revenue"), F.col("turnover_rate"), F.lit(p80_rev), F.lit(p80_turn)
            ),
        )
        .collect()
    ]
    assert got == expected


@given(qtys=st.lists(st.integers(min_value=-10, max_value=600), min_size=1, max_size=30))
@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_stock_status_matches_pandas_reference(spark, qtys):
    pdf = pd.DataFrame({"stock_quantity": qtys})
    expected = _ref_stock(pdf).tolist()
    got = [
        r.s
        for r in spark.createDataFrame(pdf)
        .withColumn("s", stock_status(F.col("stock_quantity")))
        .collect()
    ]
    assert got == expected
