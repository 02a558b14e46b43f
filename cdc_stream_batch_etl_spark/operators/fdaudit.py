"""Functional-dependency audit — the third leg of the schema-profiling
trio (pk_uniqueness_audit: keys are unique; fk_integrity_audit: edges
resolve; this: declared column determinations actually hold).

Why a training-data/CDC pipeline needs it: denormalization, survivorship
merges and schema evolution all assume "A determines B" facts (a brand
has one type, an order has one status). When an upstream source breaks
one — a replayed snapshot with a changed attribute, a merge that keeps
both sides — every downstream GROUP BY that picks ``first(B)`` becomes
nondeterministic. Profiling systems (e.g. Metanome/HyFD literature)
discover FDs; a pipeline AUDITS the declared ones each run, which is a
plain aggregation.

Per candidate FD lhs → rhs: the number of distinct lhs keys, how many
of those map to more than one rhs value (violating keys), the worst
fan-out, the violation share, and the verdict. NULL lhs rows are
excluded (SQL FD convention: NULL keys determine nothing); NULL rhs
counts as a value (a key mapping to {x, NULL} IS a violation).

Determinism: BIGINT counts and one exact-integer IEEE division.

Scale: per FD one hash agg onto lhs with a count(distinct rhs) —
Catalyst plans it as the standard two-phase expand/partial-agg, so the
shuffle carries (lhs, rhs) pairs, already collapsed map-side; the
second agg reduces NDV(lhs) rows to one. The audited FD list is fixed
and small; each audit is an independent scan (the driver can run them
against different tables in one job). Same collapse-then-count shape
as pkaudit.py — 100 TB-safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: (table, lhs column, rhs column) — declared determinations to audit.
#: Mix chosen so both verdicts appear on the driver data: the two
#: PK-backed FDs hold; the rest are plausible-but-false determinations
#: a denormalizing merge might wrongly assume.
FDS: tuple[tuple[str, str, str], ...] = (
    ("orders", "o_orderkey", "o_orderstatus"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("lineitem", "l_orderkey", "l_linestatus"),
    ("customer", "c_nationkey", "c_mktsegment"),
    ("nation", "n_nationkey", "n_regionkey"),
    ("part", "p_brand", "p_type"),
)


def _fd_sql(table: str, lhs: str, rhs: str) -> str:
    return f"""
SELECT '{table}: {lhs} -> {rhs}' AS fd,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(COUNT(*) FILTER (WHERE n_rhs > 1) AS BIGINT) AS n_violating_keys,
       CAST(MAX(n_rhs) AS BIGINT) AS max_rhs_per_key,
       CAST(COUNT(*) FILTER (WHERE n_rhs > 1) AS DOUBLE) / COUNT(*)
         AS violation_share,
       COUNT(*) FILTER (WHERE n_rhs > 1) = 0 AS holds
FROM (
  SELECT {lhs}, count(DISTINCT COALESCE(CAST({rhs} AS VARCHAR), '<<NULL>>'))
           AS n_rhs
  FROM {table} WHERE {lhs} IS NOT NULL GROUP BY {lhs}
)
"""


_FD_ORACLE = (
    "SELECT * FROM ("
    + " UNION ALL ".join(_fd_sql(t, l, r) for t, l, r in FDS)
    + ") ORDER BY fd"
)


@register("functional_dependency_audit", oracle=_FD_ORACLE)
def functional_dependency_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per declared FD: distinct keys, violating keys, worst
    fan-out, violation share, verdict. Healthy denormalization
    assumptions ⇒ holds = true."""
    frames = {t: load_table(spark, sf_dir, t) for t in {t for t, _, _ in FDS}}
    return audit_fds(frames, FDS)


def audit_fds(
    frames: dict[str, DataFrame],
    fds: tuple[tuple[str, str, str], ...],
) -> DataFrame:
    """Core audit over name→DataFrame — split out so tests can plant
    violations into an FD that holds on the driver data."""
    per_fd = []
    for table, lhs, rhs in fds:
        # NULL rhs is a countable value: count distinct over a
        # NULL-coalesced spelling (<<NULL>> cannot collide with real
        # values of these audited columns), mirrored in the oracle
        rhs_val = F.coalesce(F.col(rhs).cast("string"), F.lit("<<NULL>>"))
        grouped = (
            frames[table]
            .filter(F.col(lhs).isNotNull())
            .groupBy(lhs)
            .agg(F.countDistinct(rhs_val).alias("n_rhs"))
        )
        viol = F.col("n_rhs") > 1
        per_fd.append(
            grouped.agg(
                F.lit(f"{table}: {lhs} -> {rhs}").alias("fd"),
                F.count("*").cast("bigint").alias("n_keys"),
                F.count(F.when(viol, 1)).cast("bigint").alias("n_violating_keys"),
                F.max("n_rhs").cast("bigint").alias("max_rhs_per_key"),
                (
                    F.count(F.when(viol, 1)).cast("double") / F.count("*")
                ).alias("violation_share"),
                (F.count(F.when(viol, 1)) == 0).alias("holds"),
            )
        )
    out = per_fd[0]
    for df in per_fd[1:]:
        out = out.unionByName(df)
    return out.orderBy("fd")
