"""Schema-drift contract for long-lived CDC landing zones: a column
added upstream (the Debezium ALTER TABLE case, SURVEY S11) must not
break reads of old files — mergeSchema unions the schemas and old rows
surface NULL for the new column, exactly DuckDB's union_by_name
semantics. catalog.load_table's events-ts normalization is the same
policy applied to a physical-type drift the driver actually shipped."""

from pyspark.sql import Row, functions as F


def _write_two_generations(spark, base):
    v1 = spark.createDataFrame(
        [Row(order_id=1, amount=10.0), Row(order_id=2, amount=20.0)]
    )
    v2 = spark.createDataFrame(
        [
            Row(order_id=3, amount=30.0, coupon="WELCOME"),
            Row(order_id=4, amount=40.0, coupon=None),
        ]
    )
    v1.write.parquet(f"{base}/gen=1")
    v2.write.parquet(f"{base}/gen=2")


def test_merge_schema_unions_and_nulls_old_rows(spark, tmp_path):
    base = str(tmp_path / "orders_evolving")
    _write_two_generations(spark, base)
    df = spark.read.option("mergeSchema", "true").parquet(base)
    assert set(df.columns) >= {"order_id", "amount", "coupon"}
    rows = {r["order_id"]: r for r in df.collect()}
    assert rows[1]["coupon"] is None  # old generation: promoted to NULL
    assert rows[3]["coupon"] == "WELCOME"
    assert len(rows) == 4


def test_merged_read_still_prunes_and_filters(spark, tmp_path):
    """Evolution must not cost the scan properties: a filter on a
    first-generation column still pushes down over the merged read."""
    base = str(tmp_path / "orders_evolving2")
    _write_two_generations(spark, base)
    df = (
        spark.read.option("mergeSchema", "true")
        .parquet(base)
        .filter(F.col("amount") > 25.0)
        .select("order_id", "coupon")
    )
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "PushedFilters: [IsNotNull(amount), GreaterThan(amount,25.0)]" in plan, plan
    assert {r["order_id"] for r in df.collect()} == {3, 4}
