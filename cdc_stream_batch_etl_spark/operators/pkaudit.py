"""Primary-key uniqueness audit — the companion to fk_integrity_audit.

CDC upsert pipelines guarantee key uniqueness only if the merge logic
is right; a bad dedup or a replayed snapshot silently doubles rows.
This audits every table's declared key: total rows, distinct keys,
duplicated keys, excess rows (rows beyond one per key) and NULL keys —
the five numbers that distinguish "clean", "replayed" and "merge bug".

lineitem's key is composite (l_orderkey, l_linenumber); events' is
event_id; the TPC-H tables use their standard single-column PKs.

Determinism: pure BIGINT counts.

Scale: per table ONE hash agg onto the key (map-side partial), then a
per-key-frame agg to one row — the same collapse-then-count shape as
fk_integrity_audit, cost NDV(key) after the first shuffle. The 10-row
union is driver-trivial.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: table → tuple of key columns.
KEYS: tuple[tuple[str, tuple[str, ...]], ...] = (
    ("region", ("r_regionkey",)),
    ("nation", ("n_nationkey",)),
    ("customer", ("c_custkey",)),
    ("supplier", ("s_suppkey",)),
    ("part", ("p_partkey",)),
    ("orders", ("o_orderkey",)),
    ("lineitem", ("l_orderkey", "l_linenumber")),
    ("events", ("event_id",)),
    ("documents", ("doc_id",)),
    ("embeddings", ("vec_id",)),
)


def _tbl_sql(table: str, cols: tuple[str, ...]) -> str:
    keylist = ", ".join(cols)
    nonnull = " AND ".join(f"{c} IS NOT NULL" for c in cols)
    return f"""
SELECT '{table}({keylist})' AS pk,
       CAST(SUM(n) AS BIGINT) AS total_rows,
       CAST(COUNT(*) FILTER (WHERE keyed) AS BIGINT) AS distinct_keys,
       CAST(COUNT(*) FILTER (WHERE keyed AND n > 1) AS BIGINT) AS dup_keys,
       CAST(COALESCE(SUM(n - 1) FILTER (WHERE keyed AND n > 1), 0) AS BIGINT)
         AS excess_rows,
       CAST(COALESCE(SUM(n) FILTER (WHERE NOT keyed), 0) AS BIGINT)
         AS null_key_rows
FROM (
  SELECT {nonnull} AS keyed, count(*) AS n
  FROM {table} GROUP BY {keylist}
)
"""


_PK_ORACLE = (
    "SELECT * FROM ("
    + " UNION ALL ".join(_tbl_sql(t, c) for t, c in KEYS)
    + ") ORDER BY pk"
)


@register("pk_uniqueness_audit", oracle=_PK_ORACLE)
def pk_uniqueness_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per table key: rows, NDV, duplicate keys, excess rows,
    NULL-key rows. Healthy CDC state ⇒ zero dups, zero NULL keys."""
    frames = {t: load_table(spark, sf_dir, t) for t, _ in KEYS}
    return audit_keys(frames, KEYS)


def audit_keys(
    frames: dict[str, DataFrame],
    keys: tuple[tuple[str, tuple[str, ...]], ...],
) -> DataFrame:
    """Core audit over name→DataFrame — split out so tests can plant
    duplicate and NULL keys (driver testdata is key-clean).

    r13 (guide §5.2/§2.4): one plan, not ten. The r12 shape ran an
    independent groupBy + 1-row agg per table — ~21 exchanges and ~30
    stages of scheduling overhead around ~1 s of aggregation. Each table
    is still scanned once, but its key rows melt into a common
    (table_id, k1, k2, keyed) frame (k2 NULL for single-column keys;
    ``keyed`` — all key columns non-NULL — is computed from the table's
    real columns before the melt), so ONE groupBy(e, k1, k2) and ONE
    groupBy(e) produce all ten ledger rows in 2 exchanges + the final
    sort. Grouping by (e, k1, k2) partitions rows exactly as each
    table's groupBy(*cols) did (bigint casts are lossless on the integer
    keys), so every count is unchanged."""
    labels: list[str] = [f"{t}({', '.join(c)})" for t, c in keys]
    melted = None
    for i, (table, cols) in enumerate(keys):
        keyed = F.lit(True)
        for c in cols:
            keyed = keyed & F.col(c).isNotNull()
        k1 = F.col(cols[0]).cast("bigint")
        k2 = (
            F.col(cols[1]).cast("bigint")
            if len(cols) > 1
            else F.lit(None).cast("bigint")
        )
        part = frames[table].select(
            F.lit(i).alias("e"),
            k1.alias("k1"),
            k2.alias("k2"),
            keyed.alias("keyed"),
        )
        melted = part if melted is None else melted.unionByName(part)

    grouped = (
        melted.groupBy("e", "k1", "k2")
        # keyed is functionally dependent on the key columns' nullness —
        # max() just carries it through the agg
        .agg(F.count("*").alias("n"), F.max("keyed").alias("keyed"))
    )
    dup = F.col("keyed") & (F.col("n") > 1)
    label_arr = F.array(*[F.lit(s) for s in labels])
    return (
        grouped.groupBy("e")
        .agg(
            F.sum("n").cast("bigint").alias("total_rows"),
            F.count(F.when(F.col("keyed"), 1))
            .cast("bigint")
            .alias("distinct_keys"),
            F.count(F.when(dup, 1)).cast("bigint").alias("dup_keys"),
            F.coalesce(F.sum(F.when(dup, F.col("n") - 1)), F.lit(0))
            .cast("bigint")
            .alias("excess_rows"),
            F.coalesce(F.sum(F.when(~F.col("keyed"), F.col("n"))), F.lit(0))
            .cast("bigint")
            .alias("null_key_rows"),
        )
        .select(
            F.element_at(label_arr, F.col("e") + 1).alias("pk"),
            "total_rows",
            "distinct_keys",
            "dup_keys",
            "excess_rows",
            "null_key_rows",
        )
        .orderBy("pk")
    )
