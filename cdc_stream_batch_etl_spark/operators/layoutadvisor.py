"""Partition-layout and bloom-filter sizing advisors — the planning
tables a 100 TB deployment reads before committing a physical design
(beyond-reference, SURVEY §2.11 layout family next to
zorder_file_skipping, key_skew_report and catalog.compact_partitions).

partition_layout_advisor: for each CANDIDATE hive-partition column,
the numbers that decide the layout — partition count, average/max rows
per partition, skew ratio, and the share of sliver partitions. The two
failure modes it flags: too granular (avg rows below the sliver
threshold — small files, listing pressure, the compaction treadmill)
and skewed (max/avg above 10 — one straggler task per scan). Columns
come from the declared candidate list, the knob a platform team
actually sweeps.

bloom_sizing_plan: per declared FK join edge, the standard Bloom-filter
sizing arithmetic (Bloom CACM'70) for a build-side filter that prunes
the fact scan (the bloomjoin.py pattern): exact build-side NDV n, bits
m = ceil(n · BITS_PER_KEY) at the target 1% FPP, the filter's MB, the
optimal hash count k = round(ln2 · m/n), and the filter's cost per
pruned fact row. BITS_PER_KEY = −ln(p)/(ln 2)² is a PYTHON literal —
no cross-engine transcendental.

Determinism: counts are exact integers; every double is an exact
integer times a quoted-string literal or an exact-integer IEEE
division.

Scale: each candidate/edge is one hash agg with map-side partials
(NDV via the collapse-then-count shape); the advisor unions a fixed
handful of one-row frames.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: a partition averaging fewer rows than this is "too granular"
MIN_AVG_ROWS = 1000
#: max/avg above this flags a skewed layout
MAX_SKEW = 10.0

#: (table, partition expression, label) — the candidate layouts swept
CANDIDATES: tuple[tuple[str, str, str], ...] = (
    ("orders", "CAST(o_orderdate AS DATE)", "orders/o_orderdate"),
    ("orders", "o_orderpriority", "orders/o_orderpriority"),
    ("lineitem", "CAST(l_shipdate AS DATE)", "lineitem/l_shipdate"),
    ("lineitem", "l_returnflag", "lineitem/l_returnflag"),
    ("events", "CAST(ts AS DATE)", "events/event_date"),
    ("customer", "c_nationkey", "customer/c_nationkey"),
)


def _cand_sql(table: str, expr: str, label: str) -> str:
    return f"""
SELECT '{label}' AS layout,
       CAST(sum(n) AS BIGINT) AS total_rows,
       CAST(count(*) AS BIGINT) AS n_partitions,
       CAST(sum(n) AS DOUBLE) / count(*) AS avg_rows,
       CAST(max(n) AS BIGINT) AS max_rows,
       CAST(max(n) AS DOUBLE) / (CAST(sum(n) AS DOUBLE) / count(*)) AS skew,
       CAST(count(*) FILTER (WHERE n < {MIN_AVG_ROWS}) AS DOUBLE) / count(*)
         AS sliver_share,
       CAST(sum(n) AS DOUBLE) / count(*) < {MIN_AVG_ROWS} AS too_granular,
       CAST(max(n) AS DOUBLE) / (CAST(sum(n) AS DOUBLE) / count(*)) > {MAX_SKEW}
         AS skewed
FROM (SELECT {expr} AS p, count(*) AS n FROM {table} GROUP BY 1)
"""


_LAYOUT_ORACLE = (
    "SELECT * FROM ("
    + " UNION ALL ".join(_cand_sql(t, e, lb) for t, e, lb in CANDIDATES)
    + ") ORDER BY layout"
)


@register("partition_layout_advisor", oracle=_LAYOUT_ORACLE)
def partition_layout_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per candidate partition column: partition count, avg/max
    rows, skew ratio, sliver share, and the two failure-mode flags."""
    frames = {t: load_table(spark, sf_dir, t) for t in {t for t, _, _ in CANDIDATES}}
    per = []
    for table, expr, label in CANDIDATES:
        grouped = (
            frames[table]
            .groupBy(F.expr(expr).alias("p"))
            .agg(F.count("*").alias("n"))
        )
        avg = F.sum("n").cast("double") / F.count("*")
        skew = F.max("n").cast("double") / avg
        per.append(
            grouped.agg(
                F.lit(label).alias("layout"),
                F.sum("n").cast("bigint").alias("total_rows"),
                F.count("*").cast("bigint").alias("n_partitions"),
                avg.alias("avg_rows"),
                F.max("n").cast("bigint").alias("max_rows"),
                skew.alias("skew"),
                (
                    F.count(F.when(F.col("n") < MIN_AVG_ROWS, 1)).cast("double")
                    / F.count("*")
                ).alias("sliver_share"),
                (avg < MIN_AVG_ROWS).alias("too_granular"),
                (skew > MAX_SKEW).alias("skewed"),
            )
        )
    out = per[0]
    for df in per[1:]:
        out = out.unionByName(df)
    return out.orderBy("layout")


#: target false-positive probability for the sizing plan
BLOOM_FPP = 0.01
#: bits per distinct key at BLOOM_FPP: −ln(p) / (ln 2)²
BITS_PER_KEY = -math.log(BLOOM_FPP) / (math.log(2.0) ** 2)
#: optimal hash-function count: BITS_PER_KEY · ln 2
OPT_K = BITS_PER_KEY * math.log(2.0)

#: (fact table, fact key, build table, build key) — the star edges
EDGES: tuple[tuple[str, str, str, str], ...] = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
)


def _edge_sql(fact: str, fkey: str, build: str, bkey: str) -> str:
    return f"""
SELECT '{fact}.{fkey} <- {build}.{bkey}' AS edge,
       (SELECT CAST(count(*) AS BIGINT) FROM {fact}) AS fact_rows,
       (SELECT CAST(count(DISTINCT {fkey}) AS BIGINT) FROM {fact}) AS fact_ndv,
       (SELECT CAST(count(DISTINCT {bkey}) AS BIGINT) FROM {build}) AS build_ndv,
       CAST(ceil((SELECT count(DISTINCT {bkey}) FROM {build})
                 * CAST('{BITS_PER_KEY!r}' AS DOUBLE)) AS BIGINT) AS filter_bits,
       ceil((SELECT count(DISTINCT {bkey}) FROM {build})
            * CAST('{BITS_PER_KEY!r}' AS DOUBLE)) / 8.0e0 / 1048576.0e0
         AS filter_mb,
       CAST(round(CAST('{OPT_K!r}' AS DOUBLE)) AS BIGINT) AS n_hashes,
       ceil((SELECT count(DISTINCT {bkey}) FROM {build})
            * CAST('{BITS_PER_KEY!r}' AS DOUBLE))
         / (SELECT CAST(count(*) AS DOUBLE) FROM {fact}) AS bits_per_fact_row
"""


_BLOOM_ORACLE = (
    "SELECT * FROM ("
    + " UNION ALL ".join(_edge_sql(*e) for e in EDGES)
    + ") ORDER BY edge"
)


@register("bloom_sizing_plan", oracle=_BLOOM_ORACLE)
def bloom_sizing_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per FK join edge: fact rows, fact/build NDV, and the Bloom-filter
    size (bits, MB), optimal hash count and bits-per-fact-row cost at a
    1% target FPP — whether a build-side filter pays for each edge."""
    tables = {t for e in EDGES for t in (e[0], e[2])}
    frames = {t: load_table(spark, sf_dir, t) for t in tables}
    per = []
    for fact, fkey, build, bkey in EDGES:
        fstats = frames[fact].agg(
            F.count("*").cast("bigint").alias("fact_rows"),
            F.countDistinct(fkey).cast("bigint").alias("fact_ndv"),
        )
        bstats = frames[build].agg(
            F.countDistinct(bkey).cast("bigint").alias("build_ndv")
        )
        bits = F.ceil(F.col("build_ndv") * F.lit(BITS_PER_KEY))
        per.append(
            fstats.crossJoin(F.broadcast(bstats)).select(
                F.lit(f"{fact}.{fkey} <- {build}.{bkey}").alias("edge"),
                "fact_rows",
                "fact_ndv",
                "build_ndv",
                bits.cast("bigint").alias("filter_bits"),
                (bits.cast("double") / 8.0 / 1048576.0).alias("filter_mb"),
                F.round(F.lit(OPT_K)).cast("bigint").alias("n_hashes"),
                (bits.cast("double") / F.col("fact_rows").cast("double")).alias(
                    "bits_per_fact_row"
                ),
            )
        )
    out = per[0]
    for df in per[1:]:
        out = out.unionByName(df)
    return out.orderBy("edge")
