"""The reference's SQL, pasted: its customer-extract query
(/root/reference/python/batch_processor.py:24-41 shape) rewritten only
for table/column names must run unchanged through run_sql and agree with
the DataFrame operator."""

from cdc_stream_batch_etl_spark.operators.segments import customer_segments
from cdc_stream_batch_etl_spark.sql import run_sql

REFERENCE_STYLE_SQL = """
    SELECT
        c.c_custkey,
        c.c_name,
        c.c_mktsegment,
        COUNT(o.o_orderkey) as total_orders,
        COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 0) as total_spent,
        MAX(o.o_orderdate) as last_order_date
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
    ORDER BY c.c_custkey DESC
"""


def test_reference_sql_runs_unchanged(spark, sf_dir):
    via_sql = {
        r.c_custkey: (r.total_orders, float(r.total_spent), r.last_order_date)
        for r in run_sql(spark, sf_dir, REFERENCE_STYLE_SQL).collect()
    }
    via_df = {
        r.c_custkey: (r.total_orders, float(r.total_spent), r.last_order_date)
        for r in customer_segments(spark, sf_dir)
        .select("c_custkey", "total_orders", "total_spent", "last_order_date")
        .collect()
    }
    assert via_sql == via_df


def test_sql_pushdown(spark, sf_dir):
    from cdc_stream_batch_etl_spark.plans.inspect import plan_string

    df = run_sql(
        spark, sf_dir, "SELECT o_orderkey FROM orders WHERE o_totalprice > 50000"
    )
    plan = plan_string(df, "formatted")
    assert "PushedFilters" in plan and "o_totalprice" in plan.split("PushedFilters")[1].split("\n")[0]
