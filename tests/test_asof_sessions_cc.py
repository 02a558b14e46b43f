"""Semantic edge-case tests for the as-of join, sessionization, and
connected-components operators — the behaviors the oracle comparison
exercises only if the testdata happens to contain them."""

from datetime import datetime

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.dedup.components import connected_components
from cdc_stream_batch_etl_spark.operators.sessions import GAP  # noqa: F401


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )


def test_asof_inclusive_at_equal_timestamp(spark, monkeypatch, sf_dir):
    """An event at exactly the purchase timestamp attributes to it (ts >= p.ts)."""
    from cdc_stream_batch_etl_spark.operators import asof as asof_mod

    t0 = datetime(2024, 1, 1, 12, 0, 0)
    t1 = datetime(2024, 1, 1, 13, 0, 0)
    df = _events(
        spark,
        [
            (1, t0, 7, "purchase", 10.0),
            (2, t0, 7, "click", 1.0),  # same instant as the purchase
            (3, t1, 7, "view", 2.0),
            (4, t0, 8, "click", 3.0),  # user with no purchase at all
        ],
    )
    monkeypatch.setattr(asof_mod, "load_table", lambda spark, sf, name: df)
    out = {
        r["event_id"]: r
        for r in asof_mod.asof_purchase_attribution(spark, sf_dir).collect()
    }
    assert out[2]["purchase_event_id"] == 1
    assert out[2]["micros_since_purchase"] == 0
    assert out[3]["purchase_event_id"] == 1
    assert out[3]["micros_since_purchase"] == 3600 * 1_000_000
    assert out[4]["purchase_event_id"] is None


def test_session_boundary_exact_gap_merges(spark, monkeypatch, sf_dir):
    """An event at exactly prev_ts + GAP merges into the running session;
    one microsecond beyond starts a new one — the boundary rule the
    oracle's strict `>` predicate encodes."""
    from cdc_stream_batch_etl_spark.operators import sessions as sess_mod

    t0 = datetime(2024, 1, 1, 0, 0, 0)
    t1 = datetime(2024, 1, 1, 4, 0, 0)  # exactly GAP later → merges
    t2 = datetime(2024, 1, 1, 8, 0, 0, 1)  # GAP + 1µs after t1 → new session
    df = _events(
        spark,
        [(1, t0, 7, "view", 1.0), (2, t1, 7, "view", 2.0), (3, t2, 7, "view", 3.0)],
    )
    monkeypatch.setattr(sess_mod, "load_table", lambda spark, sf, name: df)
    rows = sorted(
        sess_mod.user_sessions(spark, sf_dir).collect(), key=lambda r: r["session_start"]
    )
    assert len(rows) == 2
    assert rows[0]["n_events"] == 2 and rows[0]["session_start"] == t0
    assert rows[0]["duration_us"] == (t1 - t0).total_seconds() * 1_000_000
    assert rows[1]["n_events"] == 1 and rows[1]["session_start"] == t2


def test_connected_components_transitive_chain(spark):
    """A-B and B-C pairs collapse to one component labeled min(id); the
    disconnected node keeps itself. Both algorithms agree."""
    nodes = spark.range(1, 5).select(F.col("id"))
    edges = spark.createDataFrame([(2, 3), (3, 1)], "src long, dst long")
    for algo in ("star", "label"):
        labels = {
            r["id"]: r["label"]
            for r in connected_components(nodes, edges, algorithm=algo).collect()
        }
        assert labels == {1: 1, 2: 1, 3: 1, 4: 4}, algo


def test_star_contraction_long_chain_olog_rounds(spark):
    """A 256-node path graph (diameter 255): label propagation would need
    ~255 rounds; large-star/small-star must converge in O(log n)."""
    import math

    from cdc_stream_batch_etl_spark.dedup.components import star_contraction

    n = 256
    nodes = spark.range(n).select(F.col("id"))
    edges = spark.range(n - 1).select(
        F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
    )
    star, rounds = star_contraction(edges)
    assert rounds <= 2 * int(math.log2(n))  # O(log n), not O(diameter)
    labels = {
        r["id"]: r["label"]
        for r in connected_components(nodes, edges, algorithm="star").collect()
    }
    assert labels == {i: 0 for i in range(n)}


def test_star_handles_multiple_components_and_reversed_edges(spark):
    """Mixed orientation, duplicate edges, two components + singleton."""
    nodes = spark.range(10).select(F.col("id"))
    edges = spark.createDataFrame(
        [(4, 2), (2, 4), (2, 7), (7, 4), (8, 9), (9, 8), (5, 5)],
        "src long, dst long",
    )
    labels = {
        r["id"]: r["label"] for r in connected_components(nodes, edges).collect()
    }
    expect = {i: i for i in range(10)}
    expect.update({4: 2, 7: 2, 9: 8})
    assert labels == expect


def test_split_is_content_addressed(spark, sf_dir):
    """The split assignment is a pure function of doc_id — identical under
    any physical re-partitioning (the randomSplit failure mode)."""
    from cdc_stream_batch_etl_spark.text.sampling import train_test_split

    a = {r["doc_id"]: r["split"] for r in train_test_split(spark, sf_dir).collect()}
    from cdc_stream_batch_etl_spark.catalog import load_table
    from cdc_stream_batch_etl_spark.text import sampling as s_mod

    docs = load_table(spark, sf_dir, "documents").repartition(17, "lang")
    bucket = s_mod._bucket_spark(F.col("doc_id"))
    b = {
        r["doc_id"]: r["split"]
        for r in docs.select(
            "doc_id",
            F.when(bucket < s_mod.TRAIN_PCT, "train")
            .when(bucket < s_mod.TRAIN_PCT + s_mod.VAL_PCT, "val")
            .otherwise("test")
            .alias("split"),
        ).collect()
    }
    assert a == b
    # and the rates are roughly honored at sf0.001 (sanity, not exactness)
    from collections import Counter

    c = Counter(a.values())
    assert c["train"] > c["val"] and c["train"] > c["test"]
