"""Market-basket co-occurrence — the co-purchase pair graph.

Beyond-reference operator (the reference's closest shape is the
order_items FK join feeding per-product aggregates, SURVEY.md J2/A5;
it never relates products to EACH OTHER). Co-occurrence mining is the
canonical "pair explosion bounded by group size" distributed pattern —
the same shape as recommendation co-visitation, n-gram co-occurrence,
and feature-cross building in a training pipeline.

Plan: ONE shuffle on the order key builds each basket as a sorted
DISTINCT part array (collect_set folds the per-basket dedup into the
same agg — a part ordered twice never double-counts), then pairs are
generated SCAN-LOCALLY from the sorted array (the minhash.py bucket
pair idiom: transform over shifted slices, each unordered a < b pair
exactly once), then one hash-agg on the pair. The output keeps pairs
with support ≥ MIN_SUPPORT (singleton pairs are noise for any
downstream use and would dominate the result 30:1).

Scale: per-basket fan-out is the BASKET SIZE, which the schema bounds
(TPC-H: ≤ 7 lineitems; measured ≤ 17 distinct parts at sf0.1×8), so
the pair stage is O(rows × basket), not O(rows²). A marketplace with
unbounded carts would cap the basket like dedup/minhash.py's MAX_BUCKET
(drop-and-report, fail open); here the bound is structural so no cap is
wired. The pair agg shuffles on (part_a, part_b) — uniform keys,
map-side partials. The pair array comes out of an aggregate, so the
slice lambdas read a materialized attribute (the SCALING.md
transform-quadratic rule is satisfied by the exchange boundary).

Support-threshold contract (the ×64-probe 0.71 exponent, adjudicated
r9): the operator is LINEAR-class — every stage is Θ(rows × bounded
basket) — and the measured super-√N growth is the probe's replication
artifact, not a plan asymptote: replicating baskets k× multiplies
every pair's support by k, so pairs that are singletons in real data
(30:1 majority at sf0.1: 1.196M distinct pairs, 3.5k with support ≥
2) ALL cross the absolute MIN_SUPPORT=2 and the output degenerates to
the full pair domain. Real corpus growth adds new orders with fresh
part combinations instead — supports stay near-uniform and output
stays output-bounded. A CMS pre-filter before the exchange (the
heavyhitters.py pattern) was evaluated and REJECTED quantitatively:
pruning at absolute threshold T=2 needs bucket collision mass N/W < 1
occurrence, i.e. width Ω(N) — the cells table stops being the
scale-constant broadcast that makes the pattern work (heavyhitters
prunes because its threshold is FRACTIONAL: width ≫ 1/support is
N-independent). At real 100 TB an absolute support of 2 is the wrong
knob anyway; the scale path is a fractional threshold, for which
``cms_heavy_hitters`` over the exploded pair key drops sub-support
mass before the exchange with a scale-constant sketch.

History: the first spelling was a self-join on l_orderkey; the ×8 probe
flagged it at exponent 1.48 — Catalyst broadcast the corpus-sized
distinct frame (fine at 600k rows, a HashedRelation blowup at 4.8M).
The basket-array spelling removes the join entirely: one exchange less,
nothing corpus-sized is ever broadcast, probe re-measured sublinear.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

MIN_SUPPORT = 2


def _baskets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(l_orderkey, parts) — each basket's sorted DISTINCT part array,
    built in ONE order-keyed shuffle (collect_set deduplicates in-agg).
    Shared by both queries so the scan+shuffle runs once per plan."""
    return (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .groupBy("l_orderkey")
        .agg(F.sort_array(F.collect_set("l_partkey")).alias("parts"))
    )


def _pairs_from(baskets: DataFrame) -> DataFrame:
    """Each unordered (a < b) pair once per basket, generated scan-local
    from the sorted array — no self-join, nothing broadcast."""
    pair_structs = F.expr(
        "flatten(transform(parts, (x, i) -> "
        "transform(slice(parts, i + 2, size(parts)), "
        "y -> struct(x AS part_a, y AS part_b))))"
    )
    return (
        baskets.select(F.explode(pair_structs).alias("p"))
        .select("p.part_a", "p.part_b")
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= MIN_SUPPORT)
    )

_COPURCHASE_ORACLE = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
)
SELECT a.l_partkey AS part_a,
       b.l_partkey AS part_b,
       CAST(count(*) AS BIGINT) AS n_orders
FROM li a
JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
GROUP BY 1, 2
HAVING count(*) >= {MIN_SUPPORT}
"""


_RULES_ORACLE = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
         CAST(count(*) AS BIGINT) AS n_orders
  FROM li a
  JOIN li b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_SUPPORT}
), directed AS (
  SELECT part_a AS antecedent, part_b AS consequent, n_orders FROM pairs
  UNION ALL
  SELECT part_b AS antecedent, part_a AS consequent, n_orders FROM pairs
), items AS (
  SELECT l_partkey, CAST(count(*) AS BIGINT) AS item_orders FROM li GROUP BY 1
), total AS (
  SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_total FROM li
)
SELECT d.antecedent, d.consequent, d.n_orders,
       CAST(d.n_orders AS DOUBLE) / ia.item_orders AS confidence,
       (CAST(d.n_orders AS DOUBLE) / ia.item_orders)
         / (CAST(ic.item_orders AS DOUBLE) / t.n_total) AS lift
FROM directed d
JOIN items ia ON d.antecedent = ia.l_partkey
JOIN items ic ON d.consequent = ic.l_partkey
CROSS JOIN total t
"""


@register("basket_rules", oracle=_RULES_ORACLE)
def basket_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over the co-purchase pairs: confidence and lift
    for both rule directions of every supported pair.

    Scale: the pair table is the expensive input (computed once above);
    this layer adds two part-keyed joins against the |parts|-sized item
    count table (AQE broadcasts it) and one 1-row total broadcast —
    the pair table itself is never re-shuffled on a non-uniform key.
    Determinism: confidence/lift are chains of single IEEE divisions of
    exact integers, identical association order in both engines."""
    # persist both shared frames (r12): baskets feeds pairs + items +
    # total and pairs feeds both rule orientations — uncached, the
    # lineitem scan + orderkey shuffle re-ran once per reference (4x)
    baskets = _baskets(spark, sf_dir).persist()
    pairs = _pairs_from(baskets).persist()
    directed = pairs.select(
        F.col("part_a").alias("antecedent"),
        F.col("part_b").alias("consequent"),
        "n_orders",
    ).unionAll(
        pairs.select(
            F.col("part_b").alias("antecedent"),
            F.col("part_a").alias("consequent"),
            "n_orders",
        )
    )
    # items/total read the basket arrays, not the raw scan: one exploded
    # row per DISTINCT (order, part) — identical to the oracle's li CTE
    items = (
        baskets.select(F.explode("parts").alias("l_partkey"))
        .groupBy("l_partkey")
        .agg(F.count("*").alias("item_orders"))
    )
    total = baskets.agg(F.count("*").alias("n_total"))
    ia = items.select(F.col("l_partkey").alias("antecedent"), F.col("item_orders").alias("a_orders"))
    ic = items.select(F.col("l_partkey").alias("consequent"), F.col("item_orders").alias("c_orders"))
    confidence = F.col("n_orders").cast("double") / F.col("a_orders")
    return (
        directed.join(ia, "antecedent")
        .join(ic, "consequent")
        .crossJoin(F.broadcast(total))
        .select(
            "antecedent",
            "consequent",
            "n_orders",
            confidence.alias("confidence"),
            (confidence / (F.col("c_orders").cast("double") / F.col("n_total"))).alias("lift"),
        )
    )


@register("copurchase_pairs", oracle=_COPURCHASE_ORACLE)
def copurchase_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unordered part pairs bought together in ≥ MIN_SUPPORT orders."""
    return _pairs_from(_baskets(spark, sf_dir))
