from cdc_stream_batch_etl_spark.runner import run_batch_pipeline
from cdc_stream_batch_etl_spark.sources.generator import (
    generate_customers,
    generate_orders,
    generate_products,
)


def test_batch_pipeline_end_to_end(spark, sf_dir, tmp_path):
    res = run_batch_pipeline(spark, sf_dir, str(tmp_path / "out"), run_ts="20260101_000000")
    assert res.quality_passed, res.quality_failures
    assert set(res.row_counts) == {
        "customer_segments",
        "product_insights",
        "order_analytics",
        "segment_histogram",
        "stock_status_histogram",
    }
    assert all(v > 0 for v in res.row_counts.values())
    latest = spark.read.parquet(str(tmp_path / "out/customer_segments/latest"))
    assert latest.count() == res.row_counts["customer_segments"]
    summary = spark.read.parquet(str(tmp_path / "out/batch_summary"))
    assert summary.count() == 5


def test_histogram_from_materialized_source_matches_standalone(spark, sf_dir, tmp_path):
    """The runner-fed histogram (source_df = materialized upstream) must be
    value-identical to the standalone recompute, with a 1-scan plan."""
    from cdc_stream_batch_etl_spark.operators.summary import (
        segment_histogram,
        stock_status_histogram,
    )
    from cdc_stream_batch_etl_spark.plans.inspect import profile

    run_batch_pipeline(spark, sf_dir, str(tmp_path / "out"), run_ts="20260101_000000")

    for name, fn in (
        ("customer_segments", segment_histogram),
        ("product_insights", stock_status_histogram),
    ):
        src = spark.read.parquet(str(tmp_path / f"out/{name}/latest"))
        sourced = fn(spark, sf_dir, source_df=src)
        standalone = fn(spark, sf_dir)
        assert sourced.exceptAll(standalone).count() == 0
        assert standalone.exceptAll(sourced).count() == 0
        prof = profile(sourced)
        assert prof.scans == 1
        assert prof.n_exchanges <= 2


def test_generator_distributions(spark):
    cust = generate_customers(spark, 200)
    prod = generate_products(spark, 50)
    orders, items = generate_orders(spark, 100, n_customers=200, n_products=50)

    assert cust.count() == 200
    assert prod.count() == 50
    assert orders.count() == 100

    # FK integrity (J5 sampling stays within existing ids)
    assert orders.join(cust, orders.customer_id == cust.id, "left_anti").count() == 0
    assert items.join(prod, items.product_id == prod.id, "left_anti").count() == 0

    # reference distributions: 1-5 items/order, qty 1-3, price ranges
    from pyspark.sql import functions as F

    per_order = items.groupBy("order_id").count()
    mm = per_order.agg(F.min("count"), F.max("count")).first()
    assert 1 <= mm[0] and mm[1] <= 5
    q = items.agg(F.min("quantity"), F.max("quantity")).first()
    assert 1 <= q[0] and q[1] <= 3
    p = prod.agg(F.min("price"), F.max("price")).first()
    assert float(p[0]) >= 5.0 and float(p[1]) <= 999.99

    # total_amount equals sum of item qty*unit_price
    totals = items.groupBy("order_id").agg(
        F.sum(F.col("quantity") * F.col("unit_price")).cast("decimal(10,2)").alias("t")
    )
    joined = orders.join(totals, orders.id == totals.order_id)
    assert joined.filter(F.col("total_amount") != F.col("t")).count() == 0

    # determinism: same seed → same data
    cust2 = generate_customers(spark, 200)
    assert cust.exceptAll(cust2).count() == 0


def test_run_query_releases_persisted_frames(spark, sf_dir, tmp_path):
    """Runner-level persist contract (r9): important_stock/top_supplier
    persist a bounded per-part aggregate that their lazy return cannot
    unpersist (tpch5.py caller-must-clear comment). Routed through
    run_query, the cache must be GONE after each call — external callers
    of the runner cannot accumulate executor storage."""
    from cdc_stream_batch_etl_spark.runner import run_query

    spark.catalog.clearCache()
    before = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    n1 = run_query(spark, "important_stock", sf_dir)
    n2 = run_query(
        spark, "top_supplier", sf_dir, out_path=str(tmp_path / "ts")
    )
    assert n1 > 0 and n2 > 0
    after = set(
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    )
    assert after <= before, "run_query leaked persisted frames"
