"""Co-located join contract: tables bucketed on the join key must join
and aggregate WITHOUT shuffling either side — the write-once,
join-many-times trade that replaces the reference's FK indexes at scale."""

import pytest
from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.catalog import load_table, write_bucketed
from cdc_stream_batch_etl_spark.plans.inspect import plan_string


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    write_bucketed(orders, "b_orders", "o_orderkey", 8, sort_key="o_orderkey")
    write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem",
        "o_orderkey",
        8,
        sort_key="o_orderkey",
    )
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


@pytest.fixture()
def no_broadcast(spark):
    """At test SF everything fits a broadcast, which sidesteps bucketing;
    disable it to exercise the sort-merge path a 100 TB join would take."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_no_shuffle(spark, bucketed_tables, no_broadcast):
    joined = (
        spark.table("b_orders")
        .join(spark.table("b_lineitem"), "o_orderkey")
        .select("o_orderkey", "o_totalprice", "l_extendedprice")
    )
    plan = plan_string(joined, "simple")
    assert "Exchange" not in plan, f"co-located join still shuffles:\n{plan}"
    assert "SortMergeJoin" in plan
    assert joined.count() > 0


def test_bucketed_groupby_no_shuffle(spark, bucketed_tables):
    agg = (
        spark.table("b_lineitem")
        .groupBy("o_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("qty"))
    )
    plan = plan_string(agg, "simple")
    assert "Exchange" not in plan, f"bucket-key groupBy still shuffles:\n{plan}"


def test_customer_orders_join_degrades_without_broadcast(spark, sf_dir, no_broadcast):
    """Scale contract for the de-hinted dimension joins (r6 VERDICT's one
    at-scale defect): customer/supplier/part grow linearly with SF, so no
    query may FORCE them broadcast. With broadcast disabled — the state
    AQE reaches when the dimension outgrows autoBroadcastJoinThreshold at
    100 TB — the customer⋈orders join must degrade to a shuffled join
    (sort-merge or shuffled-hash), never plan a BroadcastExchange (which
    at that scale is an executor/driver OOM, not a plan)."""
    from cdc_stream_batch_etl_spark.operators.tpch import shipping_priority

    df = shipping_priority(spark, sf_dir)
    plan = plan_string(df, "simple")
    assert "BroadcastExchange" not in plan, (
        f"forced broadcast survives the threshold=-1 regime:\n{plan}"
    )
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    assert df.count() >= 0  # and the degraded plan actually executes


def test_unbucketed_join_does_shuffle(spark, sf_dir):
    """Control: the same join over raw parquet shuffles (or broadcasts at
    this tiny SF) — proving the bucketing is what removed the exchange."""
    orders = load_table(spark, sf_dir, "orders")
    lineitem = load_table(spark, sf_dir, "lineitem")
    joined = orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"), "o_orderkey"
    )
    plan = plan_string(joined, "simple")
    assert "Exchange" in plan or "Broadcast" in plan
