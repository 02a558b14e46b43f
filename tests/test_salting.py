"""Salted join / two-phase agg must be row-identical to their unsalted
forms (the rewrite changes physical spread, never semantics)."""

import pyspark.sql.functions as F
import pytest

from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.functions.salting import salted_join, two_phase_agg


def test_salted_join_matches_plain_join(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")

    plain = orders.join(customer, "c_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, "c_custkey").select("o_orderkey", "c_name")

    assert plain.count() == salted.count()
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0


def test_salted_join_rejects_dim_replicating_how(spark, sf_dir):
    orders = load_table(spark, sf_dir, "orders").withColumnRenamed(
        "o_custkey", "c_custkey"
    )
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    for how in ("right", "full", "full_outer", "cross"):
        with pytest.raises(ValueError, match="fact-preserving"):
            salted_join(orders, customer, "c_custkey", how=how)
    # the left-family joins still work
    anti = salted_join(orders, customer.limit(0), "c_custkey", how="left_anti")
    assert anti.count() == orders.count()


def test_two_phase_agg_matches_plain_agg(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    aggs = {
        "n": F.count("*"),
        "qty": F.sum(F.col("l_quantity").cast("decimal(18,2)")),
        "max_price": F.max("l_extendedprice"),
    }
    plain = {
        r.l_orderkey: (r.n, r.qty, r.max_price)
        for r in lineitem.groupBy("l_orderkey").agg(*[e.alias(n) for n, e in aggs.items()]).collect()
    }
    twop = {
        r.l_orderkey: (r.n, r.qty, r.max_price)
        for r in two_phase_agg(lineitem, "l_orderkey", aggs).collect()
    }
    assert twop == plain


def test_two_phase_rejects_non_decomposable(spark, sf_dir):
    lineitem = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="decomposable"):
        two_phase_agg(lineitem, "l_orderkey", {"a": F.avg("l_quantity")}).collect()
