"""Spearman rank-correlation matrix over lineitem's numeric columns
(beyond-reference, SURVEY §2.11 stats family next to chisq_independence
/ mutual information: chi-square answers "are these CATEGORICALS
associated", Spearman answers "do these NUMERICS move together
monotonically" — the tie-aware, outlier-immune companion to Pearson
that a data-quality pass runs before trusting any linear model on the
column pair).

Semantics: Spearman-with-ties = Pearson on midranks. Values live on
integer grids (the repo's cross-engine convention): quantity =
floor(l_quantity), discount/tax/price = floor(value*100) cents. For a
pair (x, y) the correlation is computed entirely from the GROUPED
joint distribution — never from row-level ranks:

    joint   (gx, gy) -> c            one hash agg over lineitem
    margins gx -> t, doubled midrank r2 = 2*cumlt + t + 1
    sums    n, Sx = SUM(t*r2x), Sxx = SUM(t*r2x^2)  (from margins)
            Sxy = SUM(c*r2x*r2y)                    (joint x rank maps)
    rho = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2))

Exactness: DOUBLED midranks are integers (the mwu.py trick — an
average tie rank is a half-integer, so 2x it is integral; the 2 scale
factor cancels in rho). All sums accumulate in decimal(38,0) (DuckDB
HUGEINT): Sxy reaches n*(2n)^2 ~ 1e21 at sf1, past bigint. Only the
final rho takes IEEE multiply/divide/sqrt on the decimal->double
casts — identical expression shape in both engines, so the exported
doubles agree bit-for-bit. Zero-variance guard: a constant column
yields NULL rho (0/0) in both engines identically.

Scale: each pair costs ONE lineitem scan feeding a map-side-combining
(gx, gy) hash agg; everything downstream runs on the distinct-combo
frame. Low-cardinality pairs (qty x disc x tax: <= 50x11x9 combos) are
driver-trivial at any SF; the price pair's joint is bounded by distinct
cent prices (not rows), and its rank maps join back onto the GROUPED
frame — no row-level rank join ever touches the 100 TB table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: (name, grid SQL expression) — grids are BIGINT in both engines.
_VARS: dict[str, str] = {
    "quantity": "CAST(floor(l_quantity) AS BIGINT)",
    "discount": "CAST(floor(l_discount * 100) AS BIGINT)",
    "tax": "CAST(floor(l_tax * 100) AS BIGINT)",
    "price": "CAST(floor(l_extendedprice * 100) AS BIGINT)",
}

_PAIRS: tuple[tuple[str, str], ...] = (
    ("quantity", "discount"),
    ("quantity", "tax"),
    ("discount", "tax"),
    ("quantity", "price"),
)


def _pair_cte(i: int, x: str, y: str) -> str:
    gx, gy = _VARS[x], _VARS[y]
    return f"""
j{i} AS (
  SELECT {gx} AS gx, {gy} AS gy, count(*) AS c
  FROM lineitem GROUP BY 1, 2
),
mx{i} AS (
  SELECT gx, t, 2 * (cum - t) + t + 1 AS r2
  FROM (SELECT gx, sum(c) AS t,
               sum(sum(c)) OVER (ORDER BY gx
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM j{i} GROUP BY gx)
),
my{i} AS (
  SELECT gy, t, 2 * (cum - t) + t + 1 AS r2
  FROM (SELECT gy, sum(c) AS t,
               sum(sum(c)) OVER (ORDER BY gy
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        FROM j{i} GROUP BY gy)
),
s{i} AS (
  SELECT
    '{x}' AS x_col, '{y}' AS y_col,
    (SELECT sum(t) FROM mx{i}) AS n,
    (SELECT sum(CAST(t AS HUGEINT) * r2) FROM mx{i}) AS sx,
    (SELECT sum(CAST(t AS HUGEINT) * r2 * r2) FROM mx{i}) AS sxx,
    (SELECT sum(CAST(t AS HUGEINT) * r2) FROM my{i}) AS sy,
    (SELECT sum(CAST(t AS HUGEINT) * r2 * r2) FROM my{i}) AS syy,
    (SELECT sum(CAST(j.c AS HUGEINT) * mx.r2 * my.r2)
     FROM j{i} j JOIN mx{i} mx USING (gx) JOIN my{i} my USING (gy)) AS sxy
)"""


def _oracle() -> str:
    ctes = ",".join(_pair_cte(i, x, y) for i, (x, y) in enumerate(_PAIRS))
    rows = " UNION ALL ".join(f"SELECT * FROM s{i}" for i in range(len(_PAIRS)))
    return f"""
WITH {ctes},
allp AS ({rows})
SELECT x_col, y_col, CAST(n AS BIGINT) AS n,
       (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
       / sqrt(
           (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
           * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
              - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
         ) AS rho
FROM allp
ORDER BY x_col, y_col
"""


_DEC = "decimal(38,0)"


def _rank_map(joint: DataFrame, key: str) -> DataFrame:
    """gx -> (t, r2): per-value count and integer DOUBLED midrank."""
    marg = joint.groupBy(key).agg(F.sum("c").alias("t"))
    cum = F.sum("t").over(
        Window.orderBy(key).rowsBetween(Window.unboundedPreceding, 0)
    )
    return marg.select(
        key, "t", (2 * (cum - F.col("t")) + F.col("t") + 1).alias("r2")
    )


def _pair_row(spark: SparkSession, sf_dir: str, x: str, y: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # r12 optimization (guide §5 caching, §2.4): the grouped joint is
    # referenced three ways (both rank maps and the sxy join) and each
    # rank map twice more (marginal sums + broadcast back into sxy) —
    # unpersisted, every reference re-ran the lineitem scan + hash agg:
    # the plan held 5 fact-table scans PER PAIR (20 for the matrix,
    # 15.8 s at sf0.1). Persisting the distinct-combo joint and the two
    # tiny rank maps leaves ONE lineitem scan per pair. Pure reuse — no
    # arithmetic changes, output bit-identical. Caller clears via
    # clearCache (pagerank/kcore contract).
    joint = (
        li.select(
            F.expr(_VARS[x]).alias("gx"), F.expr(_VARS[y]).alias("gy")
        )
        .groupBy("gx", "gy")
        .agg(F.count("*").alias("c"))
        .persist()
    )
    mx = _rank_map(joint, "gx").persist()
    my = _rank_map(joint, "gy").persist()
    margs = mx.agg(
        F.sum("t").alias("n"),
        F.sum(F.col("t").cast(_DEC) * F.col("r2")).alias("sx"),
        F.sum(F.col("t").cast(_DEC) * F.col("r2") * F.col("r2")).alias("sxx"),
    ).crossJoin(
        my.agg(
            F.sum(F.col("t").cast(_DEC) * F.col("r2")).alias("sy"),
            F.sum(F.col("t").cast(_DEC) * F.col("r2") * F.col("r2")).alias(
                "syy"
            ),
        )
    )
    sxy = (
        joint.join(F.broadcast(mx.select("gx", F.col("r2").alias("r2x"))), "gx")
        .join(F.broadcast(my.select("gy", F.col("r2").alias("r2y"))), "gy")
        .agg(
            F.sum(F.col("c").cast(_DEC) * F.col("r2x") * F.col("r2y")).alias(
                "sxy"
            )
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    return (
        margs.crossJoin(sxy)
        .select(
            F.lit(x).alias("x_col"),
            F.lit(y).alias("y_col"),
            F.col("n").cast("bigint").alias("n"),
            (
                (d("n") * d("sxy") - d("sx") * d("sy"))
                / F.sqrt(
                    (d("n") * d("sxx") - d("sx") * d("sx"))
                    * (d("n") * d("syy") - d("sy") * d("sy"))
                )
            ).alias("rho"),
        )
    )


@register("spearman_corr_matrix", oracle=_oracle())
def spearman_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(x_col, y_col, n, rho) — tie-corrected Spearman rho for each
    monitored lineitem column pair, computed from grouped joints with
    integer doubled midranks; decimal(38,0)/HUGEINT sums."""
    out = None
    for x, y in _PAIRS:
        row = _pair_row(spark, sf_dir, x, y)
        out = row if out is None else out.unionByName(row)
    return out.orderBy("x_col", "y_col")
