"""Z-order (Morton) layout planning — multi-dimensional data-skipping
report for the catalog's space-filling-curve writer.

``catalog.write_zorder`` (tests/test_zorder.py) physically clusters a
table on the Morton interleave of two columns so parquet min/max file
stats prune BOTH dimensions; this operator is the PLANNER'S view of the
same math, registered as a driver-checkable query: quantize the two key
columns to 16 bits each, interleave to a 32-bit z-value, cut the curve
into Z_CELLS fixed z-ranges (each cell ↔ one file under a range-
partitioned write), and report each cell's row count and per-dimension
bounding box plus whether a central 10%×10% probe rectangle would have
to scan it. The probe-hit fraction IS the fraction of files a min/max-
pruning reader touches — on a z-ordered layout that fraction is
O(sqrt(selectivity)) in 2-D versus O(1) (no pruning at all) for the
non-sort dimension of a single-key sort (Morton 1966; the technique
behind Delta/Iceberg OPTIMIZE ZORDER BY; no reference-repo counterpart —
SURVEY §2.11 beyond-reference mandate, the query-side twin of
catalog.write_zorder).

Determinism: quantization is pure integer arithmetic off the exact
global min/max (one 1-row aggregate, broadcast — the two-pass
customer_segments pattern), the bit-spread uses the classic
mask-and-shift magic numbers spelled as multiplications plus ``&``/``|``
(identical bigint semantics in Spark and DuckDB), and cell ids are a
fixed-width integer division of the z-value — no ntile, no global
window, no RNG.

At 100 TB: one scan computes the 4-value bounds row; the z math is
scan-local whole-stage codegen; the groupBy keys on Z_CELLS(=64) values
with map-side partial aggregation, so the shuffle is ≤ 64 rows per
task. The real writer (catalog.write_zorder) range-partitions on the
same z-value — this report is what you run FIRST to size cells and
predict pruning before paying for the rewrite.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: 16-bit quantization per dimension → 32-bit z-value
_QBITS = 16
_QMAX = (1 << _QBITS) - 1
#: number of fixed z-range cells (files) the curve is cut into
Z_CELLS = 64
_CELL_DIV = (1 << (2 * _QBITS)) // Z_CELLS
#: probe rectangle: the central 10% of each dimension's range,
#: as integer permille bounds applied to (hi - lo)
_PROBE_LO_PM = 450
_PROBE_HI_PM = 550

def _spread_sql(x: str) -> str:
    """Bit-spread of a 16-bit value onto even bit positions (Morton
    1966): the classic mask-and-shift ladder with multiplications as
    the shifts. Every step is fully parenthesized — Spark SQL and
    DuckDB disagree on ``&``/``|`` precedence, so nothing is left to
    the parser. Only ``*``, ``&``, ``|`` and integer literals appear,
    all with identical bigint semantics in both engines."""
    s = f"({x})"
    for mult, mask in (
        (256, 16711935),  # (x | x<<8) & 0x00FF00FF
        (16, 252645135),  # (x | x<<4) & 0x0F0F0F0F
        (4, 858993459),  # (x | x<<2) & 0x33333333
        (2, 1431655765),  # (x | x<<1) & 0x55555555
    ):
        s = f"(({s} | ({s} * {mult})) & {mask})"
    return s


def _quant(col: str, lo: str, hi: str) -> str:
    """Exact-integer 16-bit quantization: ((v-lo)*65535) div (hi-lo)."""
    return (
        f"case when {hi} > {lo} "
        f"then (({col} - {lo}) * {_QMAX}) div ({hi} - {lo}) "
        f"else 0 end"
    )


_ZORDER_ORACLE = f"""
WITH bounds AS (
  SELECT min(l_partkey) AS pk_lo, max(l_partkey) AS pk_hi,
         min(l_suppkey) AS sk_lo, max(l_suppkey) AS sk_hi
  FROM lineitem
),
q AS (
  SELECT CASE WHEN b.pk_hi > b.pk_lo
              THEN ((l.l_partkey - b.pk_lo) * {_QMAX}) // (b.pk_hi - b.pk_lo)
              ELSE 0 END AS qa,
         CASE WHEN b.sk_hi > b.sk_lo
              THEN ((l.l_suppkey - b.sk_lo) * {_QMAX}) // (b.sk_hi - b.sk_lo)
              ELSE 0 END AS qb,
         l.l_partkey, l.l_suppkey,
         b.pk_lo + ((b.pk_hi - b.pk_lo) * {_PROBE_LO_PM}) // 1000 AS ppk_lo,
         b.pk_lo + ((b.pk_hi - b.pk_lo) * {_PROBE_HI_PM}) // 1000 AS ppk_hi,
         b.sk_lo + ((b.sk_hi - b.sk_lo) * {_PROBE_LO_PM}) // 1000 AS psk_lo,
         b.sk_lo + ((b.sk_hi - b.sk_lo) * {_PROBE_HI_PM}) // 1000 AS psk_hi
  FROM lineitem l CROSS JOIN bounds b
),
z AS (
  SELECT ({_spread_sql('qa')}) * 2 + ({_spread_sql('qb')}) AS zval,
         l_partkey, l_suppkey, ppk_lo, ppk_hi, psk_lo, psk_hi
  FROM q
)
SELECT CAST(zval // {_CELL_DIV} AS BIGINT) AS cell_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(l_partkey) AS BIGINT) AS pk_min,
       CAST(max(l_partkey) AS BIGINT) AS pk_max,
       CAST(min(l_suppkey) AS BIGINT) AS sk_min,
       CAST(max(l_suppkey) AS BIGINT) AS sk_max,
       min(l_partkey) <= max(ppk_hi) AND max(l_partkey) >= max(ppk_lo)
         AND min(l_suppkey) <= max(psk_hi) AND max(l_suppkey) >= max(psk_lo)
         AS probe_hit
FROM z
GROUP BY 1
ORDER BY cell_id
"""


@register("zorder_file_skipping", oracle=_ZORDER_ORACLE)
def zorder_file_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-cell layout report for a z-ordered (l_partkey, l_suppkey)
    rewrite of lineitem: row count, both dimensions' min/max (the
    parquet footer stats a reader prunes on), and whether the central
    10%×10% probe rectangle intersects the cell. count(probe_hit) /
    Z_CELLS is the predicted fraction of files scanned."""
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    bounds = li.agg(
        F.min("l_partkey").alias("pk_lo"),
        F.max("l_partkey").alias("pk_hi"),
        F.min("l_suppkey").alias("sk_lo"),
        F.max("l_suppkey").alias("sk_hi"),
    )
    q = li.crossJoin(F.broadcast(bounds)).select(
        F.expr(_quant("l_partkey", "pk_lo", "pk_hi")).alias("qa"),
        F.expr(_quant("l_suppkey", "sk_lo", "sk_hi")).alias("qb"),
        "l_partkey",
        "l_suppkey",
        F.expr(f"pk_lo + ((pk_hi - pk_lo) * {_PROBE_LO_PM}) div 1000").alias("ppk_lo"),
        F.expr(f"pk_lo + ((pk_hi - pk_lo) * {_PROBE_HI_PM}) div 1000").alias("ppk_hi"),
        F.expr(f"sk_lo + ((sk_hi - sk_lo) * {_PROBE_LO_PM}) div 1000").alias("psk_lo"),
        F.expr(f"sk_lo + ((sk_hi - sk_lo) * {_PROBE_HI_PM}) div 1000").alias("psk_hi"),
    )
    z = q.select(
        F.expr(f"({_spread_sql('qa')}) * 2 + ({_spread_sql('qb')})").alias("zval"),
        "l_partkey",
        "l_suppkey",
        "ppk_lo",
        "ppk_hi",
        "psk_lo",
        "psk_hi",
    )
    return (
        z.groupBy(F.expr(f"zval div {_CELL_DIV}").cast("bigint").alias("cell_id"))
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            F.min("l_partkey").cast("bigint").alias("pk_min"),
            F.max("l_partkey").cast("bigint").alias("pk_max"),
            F.min("l_suppkey").cast("bigint").alias("sk_min"),
            F.max("l_suppkey").cast("bigint").alias("sk_max"),
            (
                (F.min("l_partkey") <= F.max("ppk_hi"))
                & (F.max("l_partkey") >= F.max("ppk_lo"))
                & (F.min("l_suppkey") <= F.max("psk_hi"))
                & (F.max("l_suppkey") >= F.max("psk_lo"))
            ).alias("probe_hit"),
        )
        .orderBy("cell_id")
    )
