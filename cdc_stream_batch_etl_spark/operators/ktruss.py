"""Bounded k-truss peeling over the co-purchase graph — edge-level
cohesion, the sequel to node-level k-core (Cohen 2008 defines the
k-truss: the maximal subgraph where every EDGE closes >= k-2
triangles; beyond-reference, SURVEY §2.11 graph family completing
copurchase_triangles / k_core_decomposition / LPA).

Why it earns its place next to k-core: a node can keep degree >= K
through K unrelated one-off neighbors — k-core keeps it; the truss
requires each surviving EDGE to be embedded in triangles, so bridges
and star fringes fall away and what remains is the community-grade
backbone recommenders actually want to random-walk on.

Support computation = triangle enumeration via the DEGREE-ORDERED
wedge closure (the corrected copurchase_triangles machinery — wedge
endpoints ordered by rank (deg, id), the r12 audit fix), re-run per
round on the shrinking edge set, then each triangle credits its three
(id-normalized) edges. A naive per-edge common-neighbor join would put
sum-of-deg² wedges through the shuffle — the exact "last reducer"
blowup the orientation exists to avoid (the first draft of this
operator did that, and its DuckDB oracle filled a 250 GB /tmp with
spill at sf1 before it was rewritten onto the oriented plan).

Like k_core_decomposition this registers a FIXED number of peel rounds
(TRUSS_ROUNDS = 2) as the DECLARED semantics — "the 2-peel partial
truss" — with the convergence made observable: the ledger reports
(round, nodes, edges, edges_below_threshold); a final row with
edges_below_threshold = 0 at the last peeled round means the true
k-truss fixpoint was reached, otherwise the consumer raises
TRUSS_ROUNDS and pays one more wedge pass on an already-smaller frame.

Determinism: supports and counts are exact integers; edges with zero
triangles coalesce to support 0 via the same left join both engines.

Scale: per round, one degree agg + the oriented wedge join (fan-out
√m-bounded per the orientation) + one edge-keyed agg; every frame is
lineage-broken so it computes once, and frames only shrink.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.materialize import materialize
from ..registry import register
from .graphprofile import _EDGES_CTE, _edges

TRUSS_K = 4  # every surviving edge must close >= TRUSS_K - 2 triangles
TRUSS_ROUNDS = 2


def _support_sql(prev: str, cur: str) -> str:
    """One peel: rank-oriented triangle enumeration on e{prev}, credit
    each triangle's three edges, keep support >= K-2."""
    return f"""
deg{prev} AS MATERIALIZED (
  SELECT node, CAST(count(*) AS BIGINT) AS deg FROM (
    SELECT u AS node FROM e{prev} UNION ALL SELECT v FROM e{prev}
  ) GROUP BY node
),
o{prev} AS MATERIALIZED (
  SELECT CASE WHEN (da.deg, e.u) < (db.deg, e.v) THEN e.u ELSE e.v END AS src,
         CASE WHEN (da.deg, e.u) < (db.deg, e.v) THEN e.v ELSE e.u END AS dst,
         CASE WHEN (da.deg, e.u) < (db.deg, e.v) THEN db.deg ELSE da.deg END
           AS dst_deg
  FROM e{prev} e
  JOIN deg{prev} da ON da.node = e.u
  JOIN deg{prev} db ON db.node = e.v
),
t{prev} AS MATERIALIZED (
  SELECT w1.src AS tu, w1.dst AS tv, w2.dst AS tw
  FROM o{prev} w1
  JOIN o{prev} w2 ON w2.src = w1.src
   AND (w1.dst_deg, w1.dst) < (w2.dst_deg, w2.dst)
  JOIN o{prev} c ON c.src = w1.dst AND c.dst = w2.dst
),
m{prev} AS MATERIALIZED (
  SELECT least(tu, tv) AS eu, greatest(tu, tv) AS ev FROM t{prev}
  UNION ALL SELECT least(tu, tw), greatest(tu, tw) FROM t{prev}
  UNION ALL SELECT least(tv, tw), greatest(tv, tw) FROM t{prev}
),
s{prev} AS MATERIALIZED (
  SELECT e.u, e.v, CAST(count(m.eu) AS BIGINT) AS support
  FROM e{prev} e
  LEFT JOIN m{prev} m ON e.u = m.eu AND e.v = m.ev
  GROUP BY e.u, e.v
),
e{cur} AS MATERIALIZED (
  SELECT u, v FROM s{prev} WHERE support >= {TRUSS_K - 2}
)"""


def _ledger_row_sql(r: int) -> str:
    below = (
        f"(SELECT CAST(count(*) AS BIGINT) FROM s{r} "
        f"WHERE support < {TRUSS_K - 2})"
        if r < TRUSS_ROUNDS
        else "CAST(NULL AS BIGINT)"
    )
    return (
        f"SELECT CAST({r} AS BIGINT) AS round,"
        f" CAST((SELECT count(*) FROM (SELECT DISTINCT u FROM"
        f" (SELECT u FROM e{r} UNION ALL SELECT v FROM e{r}))) AS BIGINT)"
        f" AS nodes_remaining,"
        f" CAST((SELECT count(*) FROM e{r}) AS BIGINT) AS edges_remaining,"
        f" {below} AS edges_below_threshold"
    )


_KTRUSS_ORACLE = (
    f"WITH {_EDGES_CTE},\n"
    "e0 AS MATERIALIZED (SELECT part_a AS u, part_b AS v FROM edges),"
    + ",".join(_support_sql(str(i), str(i + 1)) for i in range(TRUSS_ROUNDS))
    + "\n"
    + "\nUNION ALL\n".join(_ledger_row_sql(r) for r in range(TRUSS_ROUNDS + 1))
    + "\nORDER BY round"
)


def _triangles(e: DataFrame) -> DataFrame:
    """(tu, tv, tw) — each triangle of the undirected (u < v) edge frame
    exactly once, via rank-oriented wedge closure (triangles.py's
    corrected plan). Checkpointed: consumed once per member leg."""
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    # both orientation legs (da, db) consume deg — compute it once
    deg = materialize(deg, eager=False)
    da = deg.select(F.col("node").alias("u"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("v"), F.col("deg").alias("deg_b"))
    a_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("u") < F.col("v"))
    )
    oriented = (
        e.join(da, "u")
        .join(db, "v")
        .select(
            F.when(a_first, F.col("u")).otherwise(F.col("v")).alias("src"),
            F.when(a_first, F.col("v")).otherwise(F.col("u")).alias("dst"),
            F.when(a_first, F.col("deg_b"))
            .otherwise(F.col("deg_a"))
            .alias("dst_deg"),
        )
    )
    oriented = materialize(oriented, eager=False)
    w1 = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("tv"),
        F.col("dst_deg").alias("dv"),
    )
    w2 = oriented.select(
        F.col("src").alias("a"), F.col("dst").alias("tw"),
        F.col("dst_deg").alias("dw"),
    )
    closing = oriented.select(
        F.col("src").alias("tv"), F.col("dst").alias("tw")
    )
    return (
        w1.join(w2, "a")
        .filter(
            (F.col("dv") < F.col("dw"))
            | ((F.col("dv") == F.col("dw")) & (F.col("tv") < F.col("tw")))
        )
        .join(closing, ["tv", "tw"])
        .select(F.col("a").alias("tu"), "tv", "tw")
        # lineage break (r12): the 3-leg member union consumes tri once
        # per leg — without this the wedge join itself ran 3x per round
        .transform(lambda df: materialize(df, eager=False))
    )


def _surviving_triangles(tri: DataFrame, e: DataFrame) -> DataFrame:
    """Triangles of ``e`` given the triangles of a SUPERSET edge frame:
    keep exactly those whose three (id-normalized) edges survive in e.

    r13 (guide §2.4 — remove the recomputation): for e_next ⊆ e_prev,
    triangles(e_next) == {t ∈ triangles(e_prev) : all 3 edges of t ∈
    e_next} — any triangle of the subgraph is a triangle of the
    supergraph, and a supergraph triangle whose edges all survive is a
    subgraph triangle. Each triangle appears exactly once on both sides
    (the oriented enumeration emits one row per triangle; this filter
    neither duplicates nor drops beyond the survival predicate), so the
    per-edge incidence counts downstream are the same integers a fresh
    wedge enumeration on e_next would produce. Three semi-joins of the
    (small) triangle frame replace a full degree agg + orientation join
    + wedge self-join per peel round."""
    ea = e.select(F.col("u").alias("eu"), F.col("v").alias("ev"))
    out = tri
    for a, b in (("tu", "tv"), ("tu", "tw"), ("tv", "tw")):
        out = out.join(
            ea,
            (F.least(F.col(a), F.col(b)) == F.col("eu"))
            & (F.greatest(F.col(a), F.col(b)) == F.col("ev")),
            "left_semi",
        )
    return out


def _support_from(e: DataFrame, tri: DataFrame) -> DataFrame:
    """(u, v, support): credit each triangle's three id-normalized edges
    and left-join back onto the edge frame (zero-triangle edges → 0)."""
    members = (
        tri.select(
            F.least("tu", "tv").alias("eu"), F.greatest("tu", "tv").alias("ev")
        )
        .unionAll(
            tri.select(
                F.least("tu", "tw").alias("eu"),
                F.greatest("tu", "tw").alias("ev"),
            )
        )
        .unionAll(
            tri.select(
                F.least("tv", "tw").alias("eu"),
                F.greatest("tv", "tw").alias("ev"),
            )
        )
    )
    return (
        e.alias("e")
        .join(
            members.alias("m"),
            (F.col("e.u") == F.col("m.eu")) & (F.col("e.v") == F.col("m.ev")),
            "left",
        )
        .groupBy(F.col("e.u").alias("u"), F.col("e.v").alias("v"))
        .agg(F.count(F.col("m.eu")).cast("bigint").alias("support"))
    )


@register("k_truss_decomposition", oracle=_KTRUSS_ORACLE)
def k_truss_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(TRUSS_ROUNDS+1)-row ledger of the bounded k-truss peel:
    nodes/edges remaining per round and how many edges fell below the
    support threshold (NULL on the final, un-peeled row)."""
    e = (
        _edges(spark, sf_dir)
        .select(F.col("part_a").alias("u"), F.col("part_b").alias("v"))
        # feeds the degree agg, the wedge join and the ledger — break
        # the lineage so it computes once (the kcore round convention)
        .transform(lambda df: materialize(df, eager=False))
    )
    frames = [e]
    supports = []
    tri = None
    for r in range(TRUSS_ROUNDS):
        # r13 (guide §2.4): only round 0 pays the wedge enumeration;
        # later rounds filter the materialized triangle frame down to
        # the triangles whose edges survived (see _surviving_triangles'
        # equivalence note) instead of re-running degree + orientation +
        # wedge join on the shrunken edge set.
        tri = (
            _triangles(frames[-1])
            if r == 0
            else materialize(_surviving_triangles(tri, frames[-1]), eager=False)
        )
        s = materialize(_support_from(frames[-1], tri), eager=False)
        supports.append(s)
        frames.append(
            materialize(
                s.filter(F.col("support") >= TRUSS_K - 2).select("u", "v"),
                eager=False,
            )
        )

    summaries = []
    for r, fr in enumerate(frames):
        un = fr.select(F.col("u").alias("n")).unionAll(
            fr.select(F.col("v").alias("n"))
        )
        summary = un.agg(
            F.lit(r).cast("bigint").alias("round"),
            F.count_distinct("n").cast("bigint").alias("nodes_remaining"),
            (F.count("*") / 2).cast("bigint").alias("edges_remaining"),
        )
        if r < TRUSS_ROUNDS:
            below = supports[r].agg(
                # coalesce: SUM over an empty frame is NULL but the
                # oracle's COUNT is 0 — an empty round must report 0
                F.coalesce(
                    F.sum(
                        F.when(F.col("support") < TRUSS_K - 2, 1).otherwise(0)
                    ),
                    F.lit(0),
                )
                .cast("bigint")
                .alias("edges_below_threshold")
            )
            summary = summary.join(F.broadcast(below))
        else:
            summary = summary.withColumn(
                "edges_below_threshold", F.lit(None).cast("bigint")
            )
        summaries.append(summary)
    out = summaries[0]
    for s in summaries[1:]:
        out = out.unionByName(s)
    return out.orderBy("round")
