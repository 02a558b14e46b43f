"""Referential-integrity audit — orphan detection across every FK edge.

A CDC pipeline's classic silent failure is referential drift: deletes
or out-of-order applies leave child rows pointing at parents that no
longer exist (the reference replays per-table topics independently,
reference: python/consumer_batch.py — nothing enforces cross-table
order, so the audit is the safety net). This operator walks the full
FK graph of the schema — lineitem→{orders,part,supplier},
orders→customer, events→customer, customer→nation, supplier→nation,
nation→region — and emits one row per edge: child rows, NULL FKs,
distinct FK values, orphan keys and orphan rows.

Scale: per edge the child is first collapsed to (fk, count) — the
anti-join then runs on NDV(fk) rows, not the raw child (lineitem at
100 TB anti-joins ~NDV(orderkey) grouped keys, never 600B raw rows).
Parents are projected to their single PK column before the anti-join;
AQE picks broadcast for the bounded parents (nation/region) and
shuffled anti-join for the scaling ones — no forced hints (the r6
forced-broadcast lesson). Each edge reduces to ONE row map-side, and
the 8-row union is driver-trivial.

Determinism: pure integer counts — no floats anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: (child table, fk column, parent table, parent key) — the schema's FK graph.
EDGES: tuple[tuple[str, str, str, str], ...] = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("events", "user_id", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def _edge_sql(child: str, fk: str, parent: str, pk: str) -> str:
    return f"""
SELECT '{child}.{fk}->{parent}.{pk}' AS edge,
       CAST(SUM(n) AS BIGINT) AS child_rows,
       CAST(COALESCE(SUM(n) FILTER (WHERE k IS NULL), 0) AS BIGINT)
         AS fk_nulls,
       CAST(COUNT(k) AS BIGINT) AS distinct_fk,
       CAST(COALESCE(COUNT(k) FILTER (WHERE orphan), 0) AS BIGINT)
         AS orphan_keys,
       CAST(COALESCE(SUM(n) FILTER (WHERE orphan), 0) AS BIGINT)
         AS orphan_rows
FROM (
  SELECT c.k, c.n,
         c.k IS NOT NULL AND p.{pk} IS NULL AS orphan
  FROM (SELECT {fk} AS k, count(*) AS n FROM {child} GROUP BY 1) c
  LEFT JOIN (SELECT DISTINCT {pk} FROM {parent}) p ON c.k = p.{pk}
)
"""


_FK_ORACLE = (
    "SELECT * FROM ("
    + " UNION ALL ".join(_edge_sql(*e) for e in EDGES)
    + ") ORDER BY edge"
)


@register("fk_integrity_audit", oracle=_FK_ORACLE)
def fk_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per FK edge: child rows, NULL FKs, NDV, orphan keys/rows.

    Healthy data ⇒ zero orphans; the audit exists to catch the CDC
    replay drift that makes them nonzero.
    """
    frames = {
        t: load_table(spark, sf_dir, t)
        for t in {c for c, _, _, _ in EDGES} | {p for _, _, p, _ in EDGES}
    }
    return audit_edges(frames, EDGES)


def audit_edges(
    frames: dict[str, DataFrame],
    edges: tuple[tuple[str, str, str, str], ...],
) -> DataFrame:
    """Core audit over name→DataFrame — split out so tests can plant
    orphan and NULL FKs (the driver testdata is referentially clean, so
    the orphan branches need planted drift).

    r13 (guide §5.2/§2.4): one plan, not eight. The r12 shape built an
    independent groupBy+join+agg per edge — 16 scans (lineitem 3×,
    customer/nation 3× each), 8 joins, ~24 exchanges, and the per-stage
    scheduling overhead dominated the audit (7.4 s solo at sf0.1 for
    ~1.5 s of actual aggregation). Now every child table is scanned ONCE
    and melted to (edge_id, fk) rows (lineitem's three FKs explode from
    the same scan), every parent ONCE to (edge_id, pk), and a single
    groupBy(edge, k) → left join → groupBy(edge) computes all eight
    ledger rows in 2 shuffles + 1 join. Per-edge counts are grouped by
    the edge id throughout, so every output integer is unchanged."""
    labels: list[str] = [f"{c}.{fk}->{p}.{pk}" for c, fk, p, pk in edges]

    # one scan per CHILD table, melted to (e, k) — lineitem's 3 FKs ride
    # the same scan via one explode
    by_child: dict[str, list[tuple[int, str]]] = {}
    for i, (child, fk, _p, _pk) in enumerate(edges):
        by_child.setdefault(child, []).append((i, fk))
    child_frames = []
    for child, fks in by_child.items():
        melt = F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("e"),
                        F.col(fk).cast("bigint").alias("k"),
                    )
                    for i, fk in fks
                ]
            )
        ).alias("m")
        child_frames.append(
            frames[child].select(melt).select(F.col("m.e").alias("e"), F.col("m.k").alias("k"))
        )
    melted = child_frames[0]
    for df in child_frames[1:]:
        melted = melted.unionByName(df)
    ck = melted.groupBy("e", "k").agg(F.count("*").alias("n"))

    # one scan per PARENT table, melted to (e, pk) — a parent serving two
    # edges (customer, nation) explodes both edge ids from one scan
    by_parent: dict[str, list[tuple[int, str]]] = {}
    for i, (_c, _fk, parent, pk) in enumerate(edges):
        by_parent.setdefault(parent, []).append((i, pk))
    parent_frames = []
    for parent, pks in by_parent.items():
        pk_col = pks[0][1]  # a table has ONE pk column in the edge list
        parent_frames.append(
            frames[parent].select(
                F.explode(F.array(*[F.lit(i) for i, _ in pks])).alias("e"),
                F.col(pk_col).cast("bigint").alias("pk"),
            )
        )
    pkeys = parent_frames[0]
    for df in parent_frames[1:]:
        pkeys = pkeys.unionByName(df)
    pkeys = pkeys.distinct()

    joined = ck.join(pkeys, (ck["e"] == pkeys["e"]) & (ck["k"] == pkeys["pk"]), "left").select(
        ck["e"].alias("e"),
        "k",
        "n",
        (F.col("k").isNotNull() & F.col("pk").isNull()).alias("orphan"),
    )
    label_arr = F.array(*[F.lit(s) for s in labels])
    return (
        joined.groupBy("e")
        .agg(
            F.sum("n").cast("bigint").alias("child_rows"),
            F.coalesce(F.sum(F.when(F.col("k").isNull(), F.col("n"))), F.lit(0))
            .cast("bigint")
            .alias("fk_nulls"),
            F.count("k").cast("bigint").alias("distinct_fk"),
            F.coalesce(F.count(F.when(F.col("orphan"), F.col("k"))), F.lit(0))
            .cast("bigint")
            .alias("orphan_keys"),
            F.coalesce(F.sum(F.when(F.col("orphan"), F.col("n"))), F.lit(0))
            .cast("bigint")
            .alias("orphan_rows"),
        )
        .select(
            F.element_at(label_arr, F.col("e") + 1).alias("edge"),
            "child_rows",
            "fk_nulls",
            "distinct_fk",
            "orphan_keys",
            "orphan_rows",
        )
        .orderBy("edge")
    )
