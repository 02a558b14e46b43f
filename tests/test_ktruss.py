"""k-truss peel (operators/ktruss.py): the bounded ledger must equal a
plain-python peel of the same supported co-purchase graph, and the
truss must be a subgraph of what plain support filtering allows."""

from collections import defaultdict
from itertools import combinations

from cdc_stream_batch_etl_spark import registry
from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.operators.basket import MIN_SUPPORT
from cdc_stream_batch_etl_spark.operators.ktruss import (
    TRUSS_K,
    TRUSS_ROUNDS,
    k_truss_decomposition,
)

registry.load_all()


def _python_edges(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct().collect()
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    counts = defaultdict(int)
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            counts[(a, b)] += 1
    return {e for e, c in counts.items() if c >= MIN_SUPPORT}


def _peel(edges):
    """One support peel; returns (survivors, n_below)."""
    nbrs = defaultdict(set)
    for u, v in edges:
        nbrs[u].add(v)
        nbrs[v].add(u)
    survivors, below = set(), 0
    for u, v in edges:
        if len(nbrs[u] & nbrs[v]) >= TRUSS_K - 2:
            survivors.add((u, v))
        else:
            below += 1
    return survivors, below


def _nodes(edges):
    return {n for e in edges for n in e}


def test_ktruss_ledger_matches_python_peel(spark, sf_dir):
    edges = _python_edges(spark, sf_dir)
    expected = []
    cur = edges
    for r in range(TRUSS_ROUNDS + 1):
        below = None
        if r < TRUSS_ROUNDS:
            nxt, below = _peel(cur)
        expected.append((r, len(_nodes(cur)), len(cur), below))
        if r < TRUSS_ROUNDS:
            cur = nxt
    out = [
        (r.round, r.nodes_remaining, r.edges_remaining, r.edges_below_threshold)
        for r in k_truss_decomposition(spark, sf_dir).collect()
    ]
    assert out == expected
    assert expected[0][2] > 0  # fixture graph must be non-trivial
    # peeling is monotone: frames only shrink
    sizes = [e for _, _, e, _ in expected]
    assert sizes == sorted(sizes, reverse=True)
