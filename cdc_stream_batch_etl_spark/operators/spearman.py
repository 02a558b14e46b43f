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


#: values-per-bucket for the two-level cumulative sum below. Any constant
#: yields identical integers; 1024 keeps the bucket frame ≤ ~0.1% of the
#: marginal frame.
_CUM_BUCKET = 1024


def _rank_map(joint: DataFrame, key: str) -> DataFrame:
    """(pair, gx) -> (t, r2): per-value count and integer DOUBLED midrank,
    computed for every pair at once.

    r13 (guide §2.5 — the one-giant-partition window): the inclusive
    cumulative sum is computed in TWO levels instead of one global
    window per pair. The price marginal has ~581k distinct values at
    sf0.1 (≈ one per fact row), so a Window.partitionBy(p).orderBy(gx)
    sorts the whole marginal in ONE task — a straggler that only grows
    with SF. Split by value range instead: per-(p, bucket) local cumsum
    runs as a parallel window, and each bucket's offset is the cumsum of
    the per-bucket totals (a few hundred rows). off + local is the same
    exact bigint the single window produced for every row."""
    marg = joint.groupBy("p", key).agg(F.sum("c").alias("t")).withColumn(
        # exact floor division (gx div N truncates toward zero, which
        # would misorder negative grids; grids here are non-negative but
        # the helper should not rely on it)
        "bkt",
        F.expr(f"({key} - pmod({key}, {_CUM_BUCKET})) div {_CUM_BUCKET}"),
    )
    local_cum = F.sum("t").over(
        Window.partitionBy("p", "bkt")
        .orderBy(key)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    totals = marg.groupBy("p", "bkt").agg(F.sum("t").alias("bt"))
    offsets = totals.select(
        "p",
        "bkt",
        F.coalesce(
            F.sum("bt").over(
                Window.partitionBy("p")
                .orderBy("bkt")
                .rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("off"),
    )
    cum = F.col("off") + local_cum
    return marg.join(F.broadcast(offsets), ["p", "bkt"]).select(
        "p", key, "t", (2 * (cum - F.col("t")) + F.col("t") + 1).alias("r2")
    )


@register("spearman_corr_matrix", oracle=_oracle())
def spearman_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(x_col, y_col, n, rho) — tie-corrected Spearman rho for each
    monitored lineitem column pair, computed from grouped joints with
    integer doubled midranks; decimal(38,0)/HUGEINT sums.

    r13 (guide §2.4/§5.2): ONE lineitem scan for the whole matrix. Each
    fact row melts into one (pair, gx, gy) tuple per monitored pair
    (explode of a 4-literal struct array), and a single map-side-combining
    hash agg builds all four grouped joints at once; rank maps, marginal
    sums and sxy then run per-pair via groupBy(p)/partitionBy(p) on the
    tiny distinct-combo frames. The r12 shape persisted each pair's joint
    but still scanned lineitem once per pair (4 scans, 4 independent
    plans). All SIX sufficient statistics (n, sx, sxx, sy, syy, sxy) come
    from ONE aggregation over the joint⋈mx⋈my frame: sum over combos of
    c·r2x == sum over gx of t·r2x etc. — decimal(38,0) addition is exact,
    so the regrouping is value-identical, and the separate marginal-sum
    pass (plus both rank-map persists) disappears. Arithmetic is
    unchanged — the same integer doubled midranks, the same decimal(38,0)
    sums, the same one-shot double read-out — so every output double is
    bit-identical."""
    li = load_table(spark, sf_dir, "lineitem")
    melt = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(i).alias("p"),
                    F.expr(_VARS[x]).alias("gx"),
                    F.expr(_VARS[y]).alias("gy"),
                )
                for i, (x, y) in enumerate(_PAIRS)
            ]
        )
    ).alias("e")
    joint = (
        li.select(melt)
        .select(F.col("e.p").alias("p"), F.col("e.gx").alias("gx"), F.col("e.gy").alias("gy"))
        .groupBy("p", "gx", "gy")
        .agg(F.count("*").alias("c"))
        # referenced by both rank maps and the sxy join (r12 rationale);
        # caller clears via clearCache (pagerank/kcore contract)
        .persist()
    )
    mx = _rank_map(joint, "gx")
    my = _rank_map(joint, "gy")
    cd = F.col("c").cast(_DEC)
    stats = (
        joint.join(
            F.broadcast(mx.select("p", "gx", F.col("r2").alias("r2x"))),
            ["p", "gx"],
        )
        .join(
            # NO broadcast hint: the y marginal is fact-row-sized for the
            # price pair (~581k rows at sf0.1 — one distinct cent price
            # per row), so forcing a broadcast collects it to the driver
            # and re-ships it to every task; A/B-measured [13.9, 9.9,
            # 5.6, 19.2] s broadcast vs [5.7, 6.2, 5.8, 5.0] s shuffled.
            # AQE picks the strategy from real sizes instead.
            my.select("p", "gy", F.col("r2").alias("r2y")),
            ["p", "gy"],
        )
        .groupBy("p")
        .agg(
            F.sum("c").alias("n"),
            F.sum(cd * F.col("r2x")).alias("sx"),
            F.sum(cd * F.col("r2x") * F.col("r2x")).alias("sxx"),
            F.sum(cd * F.col("r2y")).alias("sy"),
            F.sum(cd * F.col("r2y") * F.col("r2y")).alias("syy"),
            F.sum(cd * F.col("r2x") * F.col("r2y")).alias("sxy"),
        )
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    x_names = F.array(*[F.lit(x) for x, _ in _PAIRS])
    y_names = F.array(*[F.lit(y) for _, y in _PAIRS])
    return (
        stats
        .select(
            F.element_at(x_names, F.col("p") + 1).alias("x_col"),
            F.element_at(y_names, F.col("p") + 1).alias("y_col"),
            F.col("n").cast("bigint").alias("n"),
            (
                (d("n") * d("sxy") - d("sx") * d("sy"))
                / F.sqrt(
                    (d("n") * d("sxx") - d("sx") * d("sx"))
                    * (d("n") * d("syy") - d("sy") * d("sy"))
                )
            ).alias("rho"),
        )
        .orderBy("x_col", "y_col")
    )
