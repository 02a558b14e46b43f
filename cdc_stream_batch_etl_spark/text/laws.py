"""Corpus scaling-law fits per source — Heaps' vocabulary growth and
Zipf's rank-frequency slope (Heaps 1978; Zipf 1949; standard corpus-
linguistics diagnostics — beyond-reference, SURVEY §2.11 text-analysis
family).

Why a training-data pipeline fits these: dataset cards report them, and
deviations are actionable signals — a Heaps exponent near 1 means the
vocabulary never saturates (OCR noise, serial numbers, unsegmented
text: every new page mints new "words", and BPE vocab sizing must plan
for it); an exponent near 0 means boilerplate (the corpus repeats
itself — dedup first). A Zipf slope far from −1 flags the same two
failure modes from the frequency side (too flat: synthetic/templated
text; too steep: a few tokens dominate — stopword or markup flood).

heaps_law_fit: V(N) — distinct words among the first N tokens — is
computed EXACTLY for a geometric grid of 9 prefix sizes N_j = max(1,
T >> (8−j)) per source, from ONE pass: a word's first global token
index (min over its occurrences) decides the smallest grid prefix that
contains it, and V_j is then a 9-row cumulative count. log V = log k +
β log N is fitted by OLS over the grid.

zipf_law_fit: OLS of log cnt on log rank over the top ZIPF_RANKS=64
frequency ranks per source (ties broken on the word string — the fit
window where the power law actually holds; the hapax tail always
bends).

Determinism (driver oracle, atol=0): all counts and grid points are
exact integers; token order is the (doc_id, position) order, the
pack_sequences convention. ln() is transcendental (tfidf.py: engines
differ in the last ulp), and the OLS sums fold ln values, so each Σ is
accumulated by an ORDERED fold (collect→sort→aggregate in Spark;
``list_reduce(list_prepend(0.0, list(v ORDER BY ...)))`` in DuckDB —
the centroids idiom) and every exported fit statistic is rounded to 9
decimals (measured cross-engine noise ≲ 1e-14, far below the 1e-9
export grain).

Scale: the corpus-sized work is the (source, word) wordcount shuffle —
the lexical_stats/postings plan, unavoidable. The doc-level cumsum
windows on source (doc-count rows, ~tokens/2000 — the pack_sequences
posture), the grid is 9 rows/source, the Zipf fold 64 rows/source, and
every fold input is a bounded array.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: geometric prefix-size grid: N_j = max(1, T div DIVS[j]), j = 0..8
GRID_DIVS = (256, 128, 64, 32, 16, 8, 4, 2, 1)
#: Zipf fit window: top-R frequency ranks
ZIPF_RANKS = 64

_DIVS_SPARK = "array(" + ", ".join(f"{d}L" for d in GRID_DIVS) + ")"
_DIVS_SQL = "[" + ", ".join(str(d) for d in GRID_DIVS) + "]"


def _ols_spark(df: DataFrame, keys: list[str], order: str, n_col) -> DataFrame:
    """Per-key OLS of y on x with ordered folds: collect (order, x, y)
    structs, sort, fold Σx/Σy/Σxx/Σyy/Σxy left-to-right — the
    deterministic-summation idiom. Returns slope/intercept/r2."""
    arr = F.array_sort(F.collect_list(F.struct(F.col(order).alias("o"), "x", "y")))
    fold = "aggregate({a}, 0.0D, (acc, e) -> acc + {t})"
    agg = df.groupBy(*keys).agg(
        arr.alias("pts"),
        n_col.cast("double").alias("n"),
    )
    sums = agg.select(
        *keys,
        "n",
        F.expr(fold.format(a="pts", t="e.x")).alias("sx"),
        F.expr(fold.format(a="pts", t="e.y")).alias("sy"),
        F.expr(fold.format(a="pts", t="e.x * e.x")).alias("sxx"),
        F.expr(fold.format(a="pts", t="e.y * e.y")).alias("syy"),
        F.expr(fold.format(a="pts", t="e.x * e.y")).alias("sxy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / varx
    return sums.select(
        *keys,
        F.col("n").cast("bigint").alias("n_points"),
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
        ((cov * cov) / (varx * vary)).alias("r2"),
    )


_OLS_SQL = """
SELECT {keys}, CAST(n AS BIGINT) AS n_points,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept,
       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
FROM (
  SELECT {keys},
         CAST(count(*) AS DOUBLE) AS n,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(x ORDER BY {ord})), (a, b) -> a + b) AS sx,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(y ORDER BY {ord})), (a, b) -> a + b) AS sy,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(x * x ORDER BY {ord})), (a, b) -> a + b) AS sxx,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(y * y ORDER BY {ord})), (a, b) -> a + b) AS syy,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(x * y ORDER BY {ord})), (a, b) -> a + b) AS sxy
  FROM pts GROUP BY {keys}
)
"""

_HEAPS_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, source, string_split(text, ' ') AS words,
         len(string_split(text, ' ')) AS n
  FROM documents
),
cum AS (
  SELECT doc_id, source, words,
         SUM(n) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n
           AS start
  FROM toks
),
firsts AS (
  SELECT source, word, min(gidx) AS first_idx FROM (
    SELECT c.source, c.words[i.i] AS word, c.start + i.i - 1 AS gidx
    FROM cum c, LATERAL unnest(generate_series(1, len(c.words))) i(i)
  ) GROUP BY source, word
),
totals AS (SELECT source, CAST(sum(n) AS BIGINT) AS t FROM toks GROUP BY source),
jfirst AS (
  SELECT f.source,
         9 - len(list_filter(generate_series(0, 8),
                 j -> greatest(1, t.t // ({_DIVS_SQL})[j + 1]) > f.first_idx))
           AS j_first
  FROM firsts f JOIN totals t USING (source)
),
grid AS (
  SELECT t.source, g.j, t.t,
         greatest(1, t.t // ({_DIVS_SQL})[g.j + 1]) AS n_prefix
  FROM totals t, LATERAL unnest(generate_series(0, 8)) g(j)
),
curve AS (
  SELECT g.source, g.j, g.t, g.n_prefix,
         SUM(COALESCE(c.cnt, 0)) OVER (PARTITION BY g.source ORDER BY g.j
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v
  FROM grid g LEFT JOIN (
    SELECT source, j_first, count(*) AS cnt FROM jfirst GROUP BY 1, 2
  ) c ON g.source = c.source AND g.j = c.j_first
),
pts AS (
  SELECT source, j, t, ln(CAST(n_prefix AS DOUBLE)) AS x,
         ln(CAST(v AS DOUBLE)) AS y,
         max(CASE WHEN j = 8 THEN v END) OVER (PARTITION BY source) AS vocab
  FROM curve
)
SELECT o.source,
       m.total_tokens,
       m.vocab_size,
       o.n_points,
       round(o.slope, 9) AS heaps_beta,
       round(exp(o.intercept), 9) AS heaps_k,
       round(o.r2, 9) AS r2
FROM ({_OLS_SQL.format(keys="source", ord="j")}) o
JOIN (SELECT source, CAST(max(t) AS BIGINT) AS total_tokens,
             CAST(max(vocab) AS BIGINT) AS vocab_size
      FROM pts GROUP BY source) m USING (source)
ORDER BY o.source
"""


@register("heaps_law_fit", oracle=_HEAPS_ORACLE)
def heaps_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Heaps-law fit V(N) ≈ k·N^β over a 9-point geometric
    prefix grid: total tokens, vocabulary size, β, k, and the fit r²."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.split(F.col("text"), " ").alias("words")
    )
    w = Window.partitionBy("source").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = docs.withColumn(
        "start", F.sum(F.size("words")).over(w) - F.size("words")
    )
    firsts = (
        cum.select(
            "source", "start", F.posexplode("words").alias("pos", "word")
        )
        .groupBy("source", "word")
        .agg(F.min(F.col("start") + F.col("pos")).alias("first_idx"))
    )
    totals = (
        docs.groupBy("source")
        .agg(F.sum(F.size("words")).cast("bigint").alias("t"))
    )
    # smallest grid prefix containing the word's first occurrence: the
    # qualifying j's are a suffix of 0..8 (N_j is nondecreasing), so
    # j_first = 9 - |{j : N_j > first_idx}| — scan-local per word
    jfirst = firsts.join(F.broadcast(totals), "source").select(
        "source",
        F.expr(
            f"9 - size(filter(sequence(0, 8), "
            f"j -> greatest(1L, t div element_at({_DIVS_SPARK}, j + 1)) > first_idx))"
        ).alias("j_first"),
    )
    counts = jfirst.groupBy("source", "j_first").agg(F.count("*").alias("cnt"))
    grid = totals.select(
        "source",
        "t",
        F.explode(F.sequence(F.lit(0), F.lit(8))).alias("j"),
    ).withColumn(
        "n_prefix",
        F.greatest(
            F.lit(1).cast("bigint"),
            F.expr(f"t div element_at({_DIVS_SPARK}, j + 1)"),
        ),
    )
    wj = Window.partitionBy("source").orderBy("j").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # grid and counts share the `totals` lineage — alias both sides so
    # the source-equality predicate binds to distinct attribute ids
    # instead of collapsing to a trivially-true self-compare
    curve = (
        grid.alias("g")
        .join(
            counts.alias("c"),
            (F.col("g.source") == F.col("c.source"))
            & (F.col("g.j") == F.col("c.j_first")),
            "left",
        )
        .select(
            F.col("g.source").alias("source"),
            F.col("g.j").alias("j"),
            F.col("g.t").alias("t"),
            F.col("g.n_prefix").alias("n_prefix"),
            F.coalesce(F.col("c.cnt"), F.lit(0)).alias("cnt"),
        )
        .withColumn("v", F.sum("cnt").over(wj))
    )
    # persisted: 9 rows per source, consumed by both the OLS folds and
    # the meta agg — unpersisted, each reference re-runs the corpus
    # wordcount (6 document scans in the plan). Caller-must-clear
    # contract (vocab.py).
    pts = curve.select(
        "source",
        "j",
        "t",
        F.log(F.col("n_prefix").cast("double")).alias("x"),
        F.log(F.col("v").cast("double")).alias("y"),
        F.max(F.when(F.col("j") == 8, F.col("v"))).over(
            Window.partitionBy("source")
        ).alias("vocab"),
    ).persist()
    ols = _ols_spark(pts, ["source"], "j", F.count("*"))
    meta = pts.groupBy("source").agg(
        F.max("t").cast("bigint").alias("total_tokens"),
        F.max("vocab").cast("bigint").alias("vocab_size"),
    )
    return (
        ols.join(F.broadcast(meta), "source")
        .select(
            "source",
            "total_tokens",
            "vocab_size",
            "n_points",
            F.round("slope", 9).alias("heaps_beta"),
            F.round(F.exp("intercept"), 9).alias("heaps_k"),
            F.round("r2", 9).alias("r2"),
        )
        .orderBy("source")
    )


_ZIPF_ORACLE = f"""
WITH wc AS (
  SELECT source, word, CAST(count(*) AS BIGINT) AS cnt
  FROM (SELECT source, unnest(string_split(text, ' ')) AS word FROM documents)
  GROUP BY 1, 2
),
ranked AS (
  SELECT source, cnt,
         row_number() OVER (PARTITION BY source ORDER BY cnt DESC, word) AS rnk
  FROM wc
),
pts AS (
  SELECT source, rnk, ln(CAST(rnk AS DOUBLE)) AS x, ln(CAST(cnt AS DOUBLE)) AS y,
         max(CASE WHEN rnk = 1 THEN cnt END) OVER (PARTITION BY source) AS top_cnt
  FROM ranked WHERE rnk <= {ZIPF_RANKS}
)
SELECT o.source, o.n_points,
       round(o.slope, 9) AS zipf_slope,
       round(o.intercept, 9) AS zipf_intercept,
       round(o.r2, 9) AS r2,
       m.top_cnt
FROM ({_OLS_SQL.format(keys="source", ord="rnk")}) o
JOIN (SELECT source, CAST(max(top_cnt) AS BIGINT) AS top_cnt
      FROM pts GROUP BY source) m USING (source)
ORDER BY o.source
"""


@register("zipf_law_fit", oracle=_ZIPF_ORACLE)
def zipf_law_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf fit: OLS slope of ln(count) on ln(rank) over the
    top-64 frequency ranks (ties broken on the word), with the fit r²
    and the top-rank count."""
    docs = load_table(spark, sf_dir, "documents")
    wc = (
        docs.select("source", F.explode(F.split("text", " ")).alias("word"))
        .groupBy("source", "word")
        .agg(F.count("*").alias("cnt"))
    )
    ranked = wc.select(
        "source",
        "cnt",
        F.row_number()
        .over(Window.partitionBy("source").orderBy(F.desc("cnt"), "word"))
        .alias("rnk"),
    ).filter(F.col("rnk") <= ZIPF_RANKS)
    # persisted: ≤ 64 rows per source, two consumers (OLS folds + meta)
    # — same rationale as the Heaps grid
    pts = ranked.select(
        "source",
        "rnk",
        F.log(F.col("rnk").cast("double")).alias("x"),
        F.log(F.col("cnt").cast("double")).alias("y"),
        F.max(F.when(F.col("rnk") == 1, F.col("cnt"))).over(
            Window.partitionBy("source")
        ).alias("top_cnt"),
    ).persist()
    ols = _ols_spark(pts, ["source"], "rnk", F.count("*"))
    meta = pts.groupBy("source").agg(
        F.max("top_cnt").cast("bigint").alias("top_cnt")
    )
    return (
        ols.join(F.broadcast(meta), "source")
        .select(
            "source",
            "n_points",
            F.round("slope", 9).alias("zipf_slope"),
            F.round("intercept", 9).alias("zipf_intercept"),
            F.round("r2", 9).alias("r2"),
            "top_cnt",
        )
        .orderBy("source")
    )
