"""Collocation strength — bigram lift over corpus unigram frequencies.

corpus_bigrams (text/ngrams.py) counts bigrams; tokenizer fitting and
phrase mining need the step after counting: WHICH co-occurrences are
stronger than chance. The standard score is PMI = ln(P(ab)/(P(a)P(b))),
but ln() is a libm call whose last-ulp rounding differs across engines
(the text/lm.py determinism trade), so this operator reports LIFT —
the same ratio without the log:

    lift(a,b) = N_bigrams · c(ab) / (c(a) · c(b))

monotone in PMI (rank-identical), computed from four exact integers
with one IEEE multiply/divide chain — hash-exact in both engines.

Plan shape: one bigram hash-agg (map-side combined, the wordcount
class), one unigram hash-agg, then two joins of the bigram table
against the unigram counts keyed on the word. The unigram table is
vocabulary-sized; Catalyst broadcasts it while it fits and falls back
to a word-keyed shuffle join beyond — both are the plan you'd want.
MIN_COUNT prunes the long tail before the joins so the scored table
stays a fraction of the raw bigram table.

Reference anchor: beyond-reference; composes with corpus_bigrams and
doc_lm_score (the bigram LM shares the same count tables).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: score only bigrams seen at least this often (tail pruning BEFORE joins)
MIN_COUNT = 3

_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
), uni AS (
  SELECT unnest(t) AS w FROM toks
), ucnt AS (
  SELECT w, count(*) AS c FROM uni GROUP BY w
), bg AS (
  SELECT t[i] AS w1, t[i + 1] AS w2
  FROM toks, (SELECT unnest(generate_series(1, len(t) - 1)) AS i) u
), bcnt AS (
  SELECT w1, w2, count(*) AS c_ab FROM bg GROUP BY w1, w2
), n AS (
  SELECT count(*) AS n_bigrams FROM bg
)
SELECT b.w1, b.w2,
       CAST(b.c_ab AS BIGINT) AS n_cooccur,
       CAST(u1.c AS BIGINT) AS n_w1,
       CAST(u2.c AS BIGINT) AS n_w2,
       CAST(n.n_bigrams AS DOUBLE) * b.c_ab / (u1.c * u2.c) AS lift
FROM bcnt b
JOIN ucnt u1 ON b.w1 = u1.w
JOIN ucnt u2 ON b.w2 = u2.w
CROSS JOIN n
WHERE b.c_ab >= {MIN_COUNT}
"""


@register("bigram_lift", oracle=_ORACLE)
def bigram_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(w1, w2, n_cooccur, n_w1, n_w2, lift) for every bigram seen at
    least MIN_COUNT times — chance-normalized collocation strength."""
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    t = docs.select(toks.alias("t"))
    uni = t.select(F.explode("t").alias("w")).groupBy("w").agg(
        F.count("*").alias("c")
    )
    bigrams = F.zip_with(
        F.slice("t", 1, F.size("t") - 1),
        F.slice("t", 2, F.size("t") - 1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bg = t.select(F.explode(bigrams).alias("p")).select("p.w1", "p.w2")
    bcnt = (
        bg.groupBy("w1", "w2")
        .agg(F.count("*").alias("c_ab"))
        .filter(F.col("c_ab") >= MIN_COUNT)
    )
    n = bg.agg(F.count("*").alias("n_bigrams"))
    return (
        bcnt.join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "w1",
            "w2",
            F.col("c_ab").alias("n_cooccur"),
            F.col("c1").alias("n_w1"),
            F.col("c2").alias("n_w2"),
            (
                F.col("n_bigrams").cast("double")
                * F.col("c_ab")
                / (F.col("c1") * F.col("c2"))
            ).alias("lift"),
        )
    )
