"""Per-source unigram divergence from the corpus mixture — total
variation and Bhattacharyya affinity (standard distribution-shift
measures; beyond-reference, SURVEY §2.11 composition family next to
dsir_importance, which weights DOCUMENTS — this profiles SOURCES, the
table a mixture designer reads to see which domains actually differ
and by how much before re-weighting them).

Per source s with unigram distribution p_s and corpus-wide
distribution q: TV(p_s, q) = ½ Σ_w |p_s(w) − q(w)| (the worst-case
probability a single-word test distinguishes the source from the mix)
and BC(p_s, q) = Σ_w sqrt(p_s(w)·q(w)) (the Bhattacharyya
coefficient, 1 = identical; Hellinger² = 1 − BC). Both are bounded,
symmetric-support-safe measures — chosen over KL precisely because KL
needs ln(), which is NOT correctly-rounded IEEE and diverges between
JVM and C libm in the last ulp (the text/lm.py rule), while |·| and
sqrt are exact/correctly-rounded.

Determinism: counts are exact integers; each per-word term is a fixed
expression of two exact-integer divisions; the Σ_w folds in WORD order
via the sorted-fold idiom (collect_list(struct) → array_sort → fold;
`list(t ORDER BY w)` + list_reduce in DuckDB — the lm.py/centroids
machinery), so the float sum order is pinned. Absent words contribute
|0 − q(w)| and sqrt(0·q(w)) = 0 via the vocab×source dense frame.

Scale: one explode → (source, word) hash agg (map-side partials; the
result is |sources|×|vocab| — vocabulary-sized, not corpus-sized),
one |vocab|-row corpus agg broadcast-joined, the dense frame built by
a broadcast cross of two tiny dims, then a |sources|-row sorted-fold
agg. Nothing corpus-sized after the first agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_DIVERGENCE_ORACLE = """
WITH w AS (
  SELECT source, unnest(string_split(text, ' ')) AS word FROM documents
),
sw AS (SELECT source, word, CAST(count(*) AS BIGINT) AS c FROM w GROUP BY 1, 2),
stot AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM sw GROUP BY 1),
cw AS (SELECT word, CAST(sum(c) AS BIGINT) AS cc FROM sw GROUP BY 1),
ctot AS (SELECT CAST(sum(cc) AS BIGINT) AS nn FROM cw),
dense AS (
  SELECT st.source, cw.word, st.n, cw.cc, ctot.nn,
         COALESCE(sw.c, 0) AS c
  FROM stot st CROSS JOIN cw CROSS JOIN ctot
  LEFT JOIN sw ON sw.source = st.source AND sw.word = cw.word
),
terms AS (
  SELECT source, word,
         abs(CAST(c AS DOUBLE) / n - CAST(cc AS DOUBLE) / nn) AS tv_term,
         sqrt((CAST(c AS DOUBLE) / n) * (CAST(cc AS DOUBLE) / nn)) AS bc_term
  FROM dense
)
SELECT source,
       count(*) AS n_vocab,
       0.5 * list_reduce(list(tv_term ORDER BY word), (a, b) -> a + b)
         AS tv_distance,
       list_reduce(list(bc_term ORDER BY word), (a, b) -> a + b)
         AS bhattacharyya
FROM terms
GROUP BY source
ORDER BY source
"""


@register("source_divergence_report", oracle=_DIVERGENCE_ORACLE)
def source_divergence_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_vocab, tv_distance, bhattacharyya) — how far each
    source's unigram distribution sits from the corpus mixture."""
    docs = load_table(spark, sf_dir, "documents")
    words = docs.select(
        "source", F.explode(F.split("text", " ")).alias("word")
    )
    sw = words.groupBy("source", "word").agg(
        F.count("*").cast("bigint").alias("c")
    )
    stot = sw.groupBy("source").agg(F.sum("c").cast("bigint").alias("n"))
    cw = sw.groupBy("word").agg(F.sum("c").cast("bigint").alias("cc"))
    ctot = cw.agg(F.sum("cc").cast("bigint").alias("nn"))
    dense = (
        stot.crossJoin(F.broadcast(cw))
        .crossJoin(F.broadcast(ctot))
        .join(sw, ["source", "word"], "left")
        .select(
            "source",
            "word",
            "n",
            "cc",
            "nn",
            F.coalesce(F.col("c"), F.lit(0)).alias("c"),
        )
    )
    p = F.col("c").cast("double") / F.col("n")
    q = F.col("cc").cast("double") / F.col("nn")
    terms = dense.select(
        "source",
        "word",
        F.abs(p - q).alias("tv_term"),
        F.sqrt(p * q).alias("bc_term"),
    )
    fold = lambda col: F.aggregate(  # noqa: E731 — the lm.py sorted-fold idiom
        F.expr(f"transform(array_sort(collect_list(struct(word, {col}))), s -> s.{col})"),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        terms.groupBy("source")
        .agg(
            F.count("*").alias("n_vocab"),
            (F.lit(0.5) * fold("tv_term")).alias("tv_distance"),
            fold("bc_term").alias("bhattacharyya"),
        )
        .orderBy("source")
    )
