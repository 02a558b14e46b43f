"""Graph-profile invariants: histogram/profile consistency on driver
data, and a planted star graph (assortativity -1) via a synthetic
basket table."""

import cdc_stream_batch_etl_spark.operators.graphprofile as gp


def test_histogram_matches_profile(spark, sf_dir):
    hist = gp.copurchase_degree_histogram(spark, sf_dir).collect()
    prof = gp.copurchase_graph_profile(spark, sf_dir).collect()[0]
    n_nodes = sum(r.n_parts for r in hist)
    deg_sum = sum(r.degree * r.n_parts for r in hist)
    assert prof.n_nodes == n_nodes
    assert prof.n_edges == deg_sum // 2
    assert prof.avg_degree == deg_sum / n_nodes
    assert prof.max_degree == max(r.degree for r in hist)
    assert -1.0 <= prof.assortativity <= 1.0


def test_star_graph_is_maximally_disassortative(spark):
    """A hub co-purchased with k leaves (each pair in >= MIN_SUPPORT
    baskets, leaves never together) is a star: assortativity -1."""
    import cdc_stream_batch_etl_spark.operators.basket as bk

    hub, leaves = 1, [10, 20, 30, 40]
    rows = []
    okey = 0
    for leaf in leaves:
        for _ in range(bk.MIN_SUPPORT):  # support the (hub, leaf) edge
            okey += 1
            rows += [(okey, hub), (okey, leaf)]
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    orig = bk.load_table
    try:
        bk.load_table = lambda s, d, t: li  # noqa: ARG005
        prof = gp.copurchase_graph_profile(spark, "x").collect()[0]
        hist = {r.degree: r.n_parts for r in gp.copurchase_degree_histogram(spark, "x").collect()}
    finally:
        bk.load_table = orig
    assert prof.n_nodes == 5 and prof.n_edges == 4
    assert prof.max_degree == 4
    assert hist == {1: 4, 4: 1}
    assert abs(prof.assortativity - (-1.0)) < 1e-12


def test_regular_graph_assortativity_is_null(spark):
    """A single supported edge (both endpoints degree 1) has zero
    degree variance -> NULL assortativity, not a division blowup."""
    import cdc_stream_batch_etl_spark.operators.basket as bk

    rows = [(1, 1), (1, 2), (2, 1), (2, 2)]  # edge (1,2) in two baskets
    li = spark.createDataFrame(rows, "l_orderkey bigint, l_partkey bigint")
    orig = bk.load_table
    try:
        bk.load_table = lambda s, d, t: li  # noqa: ARG005
        prof = gp.copurchase_graph_profile(spark, "x").collect()[0]
    finally:
        bk.load_table = orig
    assert prof.n_edges == 1 and prof.assortativity is None
