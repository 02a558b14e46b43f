"""Mutual information between monitored categorical column pairs
(beyond-reference, SURVEY §2.11 stats family next to
chisq_independence and spearman_corr_matrix: chi-square gives a
significance VERDICT on categorical association, MI gives its
MAGNITUDE in nats — the quantity feature-selection and redundancy
audits actually rank by — and the normalized variant
NMI = MI / sqrt(Hx*Hy) makes it comparable across pairs with different
alphabet sizes).

Semantics: for each audited pair, MI = sum_cells (c/n) * ln(c*n /
(cx*cy)) over the joint contingency table, with marginal entropies
Hx = -sum (cx/n) ln(cx/n). Audited pairs: orders (o_orderpriority,
o_orderstatus), lineitem (l_returnflag, l_linestatus), documents
(lang, source).

Exactness: every ln argument is an exact integer ratio; the per-cell
terms fold in explicit (gx, gy) order (the centroids idiom — ln
differs across engines in the last ulp, and FP addition is not
associative) and mi/nmi/entropies export rounded to 9 decimals (the
tfidf convention). Counts are exact bigints.

Scale: one scan per audited table feeding a map-side-combining
(gx, gy) hash agg; the contingency tables are alphabet-bounded
(<= ~30 cells), so everything past the scan is driver-trivial at any
SF. No joins, no row-level ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: (table, x column, y column) — SQL identifiers valid in both engines.
_MI_PAIRS: tuple[tuple[str, str, str], ...] = (
    ("orders", "o_orderpriority", "o_orderstatus"),
    ("lineitem", "l_returnflag", "l_linestatus"),
    ("documents", "lang", "source"),
)


def _pair_sql(i: int, table: str, x: str, y: str) -> str:
    return f"""
j{i} AS (
  SELECT {x} AS gx, {y} AS gy, count(*) AS c
  FROM {table} GROUP BY 1, 2
),
m{i} AS (
  SELECT gx, gy, c,
         sum(c) OVER (PARTITION BY gx) AS cx,
         sum(c) OVER (PARTITION BY gy) AS cy,
         sum(c) OVER () AS n
  FROM j{i}
),
t{i} AS (
  SELECT gx, gy, c, cx, cy, n,
         (CAST(c AS DOUBLE) / n)
           * ln(CAST(c AS DOUBLE) * n / (CAST(cx AS DOUBLE) * cy)) AS term
  FROM m{i}
),
hx{i} AS (
  SELECT -list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list((CAST(cx AS DOUBLE) / n) * ln(CAST(cx AS DOUBLE) / n)
                ORDER BY gx)), (a, b) -> a + b) AS hx
  FROM (SELECT DISTINCT gx, cx, n FROM m{i})
),
hy{i} AS (
  SELECT -list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list((CAST(cy AS DOUBLE) / n) * ln(CAST(cy AS DOUBLE) / n)
                ORDER BY gy)), (a, b) -> a + b) AS hy
  FROM (SELECT DISTINCT gy, cy, n FROM m{i})
),
s{i} AS (
  SELECT '{table}' AS table_name, '{x}' AS x_col, '{y}' AS y_col,
         CAST(max(n) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_cells,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(term ORDER BY gx, gy)), (a, b) -> a + b) AS mi,
         (SELECT hx FROM hx{i}) AS hx,
         (SELECT hy FROM hy{i}) AS hy
  FROM t{i}
)"""


def _oracle() -> str:
    ctes = ",".join(_pair_sql(i, t, x, y) for i, (t, x, y) in enumerate(_MI_PAIRS))
    rows = " UNION ALL ".join(
        f"SELECT * FROM s{i}" for i in range(len(_MI_PAIRS))
    )
    return f"""
WITH {ctes},
allp AS ({rows})
SELECT table_name, x_col, y_col, n, n_cells,
       round(mi, 9) AS mi_nats,
       round(hx, 9) AS h_x,
       round(hy, 9) AS h_y,
       round(mi / sqrt(hx * hy), 9) AS nmi
FROM allp
ORDER BY table_name, x_col
"""


def _pair_row(spark: SparkSession, sf_dir: str, table: str, x: str, y: str) -> DataFrame:
    df = load_table(spark, sf_dir, table)
    joint = df.groupBy(
        F.col(x).alias("gx"), F.col(y).alias("gy")
    ).agg(F.count("*").alias("c"))
    from pyspark.sql import Window

    m = joint.select(
        "gx",
        "gy",
        "c",
        F.sum("c").over(Window.partitionBy("gx")).alias("cx"),
        F.sum("c").over(Window.partitionBy("gy")).alias("cy"),
        F.sum("c").over(Window.partitionBy()).alias("n"),
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    terms = m.select(
        "gx",
        "gy",
        "c",
        "cx",
        "cy",
        "n",
        ((d("c") / F.col("n")) * F.log(d("c") * F.col("n") / (d("cx") * d("cy")))).alias(
            "mi_term"
        ),
        ((d("cx") / F.col("n")) * F.log(d("cx") / F.col("n"))).alias("hx_term"),
        ((d("cy") / F.col("n")) * F.log(d("cy") / F.col("n"))).alias("hy_term"),
    )
    mi_fold = F.expr(
        "aggregate(array_sort(collect_list(struct(gx, gy, mi_term))), 0.0D, "
        "(acc, e) -> acc + e.mi_term)"
    )
    # entropies fold over DISTINCT margin rows in key order
    hx = -F.expr(
        "aggregate(array_sort(collect_set(struct(gx, hx_term))), 0.0D, "
        "(acc, e) -> acc + e.hx_term)"
    )
    hy = -F.expr(
        "aggregate(array_sort(collect_set(struct(gy, hy_term))), 0.0D, "
        "(acc, e) -> acc + e.hy_term)"
    )
    return terms.agg(
        F.max("n").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_cells"),
        F.round(mi_fold, 9).alias("mi_nats"),
        F.round(hx, 9).alias("h_x"),
        F.round(hy, 9).alias("h_y"),
        F.round(mi_fold / F.sqrt(hx * hy), 9).alias("nmi"),
    ).select(
        F.lit(table).alias("table_name"),
        F.lit(x).alias("x_col"),
        F.lit(y).alias("y_col"),
        "n",
        "n_cells",
        "mi_nats",
        "h_x",
        "h_y",
        "nmi",
    )


@register("mutual_information_matrix", oracle=_oracle())
def mutual_information_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(table_name, x_col, y_col, n, n_cells, mi_nats, h_x, h_y, nmi) —
    exact-ratio mutual information and normalized MI per audited
    categorical pair, explicit-order ln folds, 9-decimal export."""
    out = None
    for t, x, y in _MI_PAIRS:
        row = _pair_row(spark, sf_dir, t, x, y)
        out = row if out is None else out.unionByName(row)
    return out.orderBy("table_name", "x_col")
