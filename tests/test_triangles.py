"""Brute-force regression gate for copurchase_triangles — added in r12
after the audit that found the id-ordered wedge constraint dropping
triangles whose closing edge's rank orientation disagreed with id
order (33 of 61 sf0.01 triangles missing; the oracle shared the bug,
so the driver's cross-engine gate could never catch it — only an
INDEPENDENT derivation can)."""

from collections import defaultdict
from itertools import combinations

from cdc_stream_batch_etl_spark import registry
from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.operators.basket import MIN_SUPPORT

registry.load_all()


def brute_triangles(spark, sf_dir):
    """(triangle set, per-node participation) from raw lineitem."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    cnt = defaultdict(int)
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            cnt[(a, b)] += 1
    edges = {e for e, c in cnt.items() if c >= MIN_SUPPORT}
    nbr = defaultdict(set)
    for u, v in edges:
        nbr[u].add(v)
        nbr[v].add(u)
    tris = set()
    for u, v in edges:
        for w in nbr[u] & nbr[v]:
            tris.add(tuple(sorted((u, v, w))))
    per = defaultdict(int)
    for t in tris:
        for n in t:
            per[n] += 1
    return tris, per


def test_triangles_match_brute_force(spark, sf_dir):
    tris, per = brute_triangles(spark, sf_dir)
    out = {
        r.part_key: r.n_triangles
        for r in registry.QUERIES["copurchase_triangles"](
            spark, sf_dir
        ).collect()
    }
    spark.catalog.clearCache()
    assert tris, "fixture graph must contain triangles"
    assert out == dict(per)
    assert sum(out.values()) == 3 * len(tris)
