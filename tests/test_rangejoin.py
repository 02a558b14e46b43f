"""Bucketed interval join (purchase_context_window) and shard manifest:
plan-shape and balance contracts beyond the oracle hash-match that
test_queries.py already applies."""

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.operators.rangejoin import purchase_context_window
from cdc_stream_batch_etl_spark.plans.inspect import plan_string
from cdc_stream_batch_etl_spark.text.sharding import N_SHARDS, shard_manifest


def test_range_join_is_equi_bucketed_not_nested_loop(spark, sf_dir):
    """The whole point of the bucketing: the range predicate must ride an
    equi-join (hash/sort-merge on (user_id, bucket)), never a
    BroadcastNestedLoopJoin / CartesianProduct fallback."""
    plan = plan_string(purchase_context_window(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_zero_context_purchases_survive(spark, sf_dir):
    """LEFT join contract: purchases with a quiet prior hour appear with
    ctx_events=0 / ctx_value=0.0 — they must not be dropped."""
    df = purchase_context_window(spark, sf_dir)
    total = df.count()
    purchases = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert total == purchases
    # the sf0.001 fixture has ~185 quiet-hour purchases — they must survive
    assert df.filter(F.col("ctx_events") == 0).count() > 0
    assert df.filter(F.col("ctx_events").isNull()).count() == 0


def test_shard_manifest_covers_corpus_and_balances(spark, sf_dir):
    """Manifest doc mass must equal the corpus row count, and md5 placement
    should spread the corpus across many shards (no collapse onto a few
    buckets — the property that makes planner-free balance credible)."""
    rows = shard_manifest(spark, sf_dir).collect()
    n_docs_total = sum(r["n_docs"] for r in rows)
    corpus = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert n_docs_total == corpus
    assert len(rows) > N_SHARDS // 2  # uniform hashing fills most buckets
    biggest = max(r["n_docs"] for r in rows)
    assert biggest <= max(4 * corpus // N_SHARDS, 8)  # no gross skew


def test_relational_division_planted(spark):
    """FOR ALL semantics: only the part bought in every region passes;
    multiplicity within a region never substitutes for coverage."""
    import cdc_stream_batch_etl_spark.operators.relational as rel
    from pyspark.sql import functions as F  # noqa: F811

    tables = {
        "region": spark.createDataFrame(
            [(0, "AM"), (1, "EU")], "r_regionkey bigint, r_name string"
        ),
        "nation": spark.createDataFrame(
            [(10, "US", 0), (11, "DE", 1)],
            "n_nationkey bigint, n_name string, n_regionkey bigint",
        ),
        "customer": spark.createDataFrame(
            [(100, 10), (101, 11)], "c_custkey bigint, c_nationkey bigint"
        ),
        "orders": spark.createDataFrame(
            [(1000, 100), (1001, 101), (1002, 100)],
            "o_orderkey bigint, o_custkey bigint",
        ),
        # part 1: both regions; part 2: region AM twice (multiplicity,
        # not coverage); part 3: never sold
        "lineitem": spark.createDataFrame(
            [(1000, 1), (1001, 1), (1000, 2), (1002, 2)],
            "l_orderkey bigint, l_partkey bigint",
        ),
        "part": spark.createDataFrame(
            [(1, "a", "B#1", "t"), (2, "b", "B#2", "t"), (3, "c", "B#3", "t")],
            "p_partkey bigint, p_name string, p_brand string, p_type string",
        ),
    }
    orig = rel.load_table
    try:
        rel.load_table = lambda s, d, t: tables[t]  # noqa: ARG005
        out = rel.parts_in_all_regions(spark, "x").collect()
    finally:
        rel.load_table = orig
    assert [(r.p_partkey, r.n_regions) for r in out] == [(1, 2)]
