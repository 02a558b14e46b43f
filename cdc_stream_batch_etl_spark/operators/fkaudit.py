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
    the orphan branches need planted drift)."""
    per_edge = []
    for child, fk, parent, pk in edges:
        ck = (
            frames[child]
            .groupBy(F.col(fk).alias("k"))
            .agg(F.count("*").alias("n"))
        )
        pkeys = frames[parent].select(F.col(pk).alias("pk")).distinct()
        joined = ck.join(pkeys, ck["k"] == pkeys["pk"], "left").select(
            "k",
            "n",
            (F.col("k").isNotNull() & F.col("pk").isNull()).alias("orphan"),
        )
        per_edge.append(
            joined.agg(
                F.lit(f"{child}.{fk}->{parent}.{pk}").alias("edge"),
                F.sum("n").cast("bigint").alias("child_rows"),
                F.coalesce(
                    F.sum(F.when(F.col("k").isNull(), F.col("n"))), F.lit(0)
                )
                .cast("bigint")
                .alias("fk_nulls"),
                F.count("k").cast("bigint").alias("distinct_fk"),
                F.coalesce(
                    F.count(F.when(F.col("orphan"), F.col("k"))), F.lit(0)
                )
                .cast("bigint")
                .alias("orphan_keys"),
                F.coalesce(
                    F.sum(F.when(F.col("orphan"), F.col("n"))), F.lit(0)
                )
                .cast("bigint")
                .alias("orphan_rows"),
            )
        )
    out = per_edge[0]
    for df in per_edge[1:]:
        out = out.unionByName(df)
    return out.orderBy("edge")
