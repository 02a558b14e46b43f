"""Link prediction on the co-purchase graph — common-neighbor scoring
of NON-adjacent part pairs (beyond-reference, SURVEY §2.11 graph
family next to copurchase_pagerank / triangles / LPA: those describe
the graph that exists, this ranks the edges most likely to appear —
the Liben-Nowell & Kleinberg 2003 battery, the shape every
"customers also bought" candidate generator runs).

Scores per candidate pair (u, v), u < v, no existing edge, at least
MIN_COMMON shared neighbors:
  common_neighbors  |Γ(u) ∩ Γ(v)| — the raw count.
  jaccard           cn / (deg_u + deg_v - cn) — one double division of
                    exact integers at export.
  ra_scaled         Σ_w SCALE div deg(w) over shared neighbors w —
                    resource-allocation index in INTEGER-SCALED units
                    (the pagerank.py device: RA's 1/deg(w) terms summed
                    as floats would be order-dependent cross-engine;
                    integer div + integer sum is exact).

Plan: the support-filtered symmetric edge frame (basket.py: pair
fan-out bounded by basket size) is persisted; two-hop candidates come
from ONE self-join through the shared neighbor w (u < v dedups the
direction), a hash agg on the pair folds the common-neighbor count AND
the RA sum, an anti-join against the edge frame removes pairs already
linked, and the degree frame broadcasts in twice (node-cardinality).
Wedge fan-out is Σ_w deg(w)² — bounded on this graph because support
filtering caps degree; an unbounded-degree graph would cap wedges per
center like dedup/minhash.py's MAX_BUCKET (drop-and-report) before the
self-join, which composes without changing the contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from .basket import _baskets, _pairs_from
from .pagerank import _EDGES_SQL, _PAIRS_SQL

RA_SCALE = 1_000_000_000_000  # 1e12 — integer RA units
MIN_COMMON = 2

_LINKPRED_ORACLE = f"""
WITH pairs AS ({_PAIRS_SQL}),
edges AS ({_EDGES_SQL}),
degs AS (SELECT src AS node, count(*) AS deg FROM edges GROUP BY 1),
wedges AS (
  SELECT e1.dst AS u, e2.dst AS v, e1.src AS w
  FROM edges e1 JOIN edges e2
    ON e1.src = e2.src AND e1.dst < e2.dst
),
cand AS (
  SELECT wg.u, wg.v,
         count(*) AS cn,
         sum({RA_SCALE} // dw.deg) AS ra
  FROM wedges wg JOIN degs dw ON dw.node = wg.w
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_COMMON}
)
SELECT c.u AS part_a, c.v AS part_b,
       CAST(c.cn AS BIGINT) AS common_neighbors,
       CAST(c.cn AS DOUBLE) / (du.deg + dv.deg - c.cn) AS jaccard,
       CAST(c.ra AS BIGINT) AS ra_scaled
FROM cand c
JOIN degs du ON du.node = c.u
JOIN degs dv ON dv.node = c.v
ANTI JOIN pairs p ON p.part_a = c.u AND p.part_b = c.v
ORDER BY part_a, part_b
"""


@register("link_prediction_jaccard", oracle=_LINKPRED_ORACLE)
def link_prediction_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(part_a, part_b, common_neighbors, jaccard, ra_scaled) — every
    non-adjacent pair with >= MIN_COMMON shared co-purchase neighbors."""
    # r12 optimization (guide §5 caching): `pairs` is referenced three
    # times — both orientations of the edge union AND the final
    # anti-join — and only the derived `edges` frame was persisted, so
    # the basket-mining base (lineitem scan → basket agg → pair agg) ran
    # THREE times per query (13.0 s at sf0.1). Persist the support-
    # filtered pair table itself; the union and the anti-join now read
    # the cache. Output unchanged; caller clears via clearCache.
    pairs = (
        _pairs_from(_baskets(spark, sf_dir)).select("part_a", "part_b").persist()
    )
    edges = (
        pairs.selectExpr("part_a AS src", "part_b AS dst")
        .unionAll(pairs.selectExpr("part_b AS src", "part_a AS dst"))
        .persist()
    )
    degs = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("deg")
    ).persist()
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    wedges = e1.join(
        e2,
        (F.col("e1.src") == F.col("e2.src")) & (F.col("e1.dst") < F.col("e2.dst")),
    ).select(
        F.col("e1.dst").alias("u"),
        F.col("e2.dst").alias("v"),
        F.col("e1.src").alias("w"),
    )
    cand = (
        wedges.join(F.broadcast(degs.selectExpr("node AS w", "deg AS deg_w")), "w")
        .groupBy("u", "v")
        .agg(
            F.count("*").alias("cn"),
            F.sum(F.expr(f"{RA_SCALE} div deg_w")).alias("ra"),
        )
        .filter(F.col("cn") >= MIN_COMMON)
    )
    non_adj = cand.join(
        pairs,
        (cand.u == pairs.part_a) & (cand.v == pairs.part_b),
        "left_anti",
    )
    du = degs.selectExpr("node AS u", "deg AS deg_u")
    dv = degs.selectExpr("node AS v", "deg AS deg_v")
    return (
        non_adj.join(F.broadcast(du), "u")
        .join(F.broadcast(dv), "v")
        .select(
            F.col("u").alias("part_a"),
            F.col("v").alias("part_b"),
            F.col("cn").cast("bigint").alias("common_neighbors"),
            (
                F.col("cn").cast("double")
                / (F.col("deg_u") + F.col("deg_v") - F.col("cn"))
            ).alias("jaccard"),
            F.col("ra").cast("bigint").alias("ra_scaled"),
        )
        .orderBy("part_a", "part_b")
    )
