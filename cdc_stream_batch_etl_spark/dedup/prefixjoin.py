"""Prefix-filtered exact Jaccard similarity join (AllPairs/PPJoin family —
Bayardo, Ma & Srikant, "Scaling Up All Pairs Similarity Search", WWW'07;
Xiao et al., "Efficient Similarity Joins for Near Duplicate Detection",
WWW'08).

The EXACT counterpart to the LSH scale path: ``ngram_jaccard_pairs``
computes the same join by self-joining EVERY shingle (quadratic in the
hottest shingle's document frequency — the declared yardstick), and
``minhash_lsh_pairs`` trades exactness for banding. Prefix filtering
keeps exactness and still prunes the join:

  order every document's shingle set by GLOBAL document frequency
  ascending (rarest first, ties by shingle string); for Jaccard
  threshold τ a document with n shingles needs only its first
  p = n − ⌈τ·n⌉ + 1 shingles in the join — any pair with J ≥ τ shares
  at least one PREFIX shingle (if two sets share none of each other's
  prefixes, their overlap is bounded below ⌈τ·n⌉ on both sides).

So the self-join runs on the rare end of the vocabulary: stop-shingles
with huge document frequency sort LAST and never enter the prefix —
exactly the "drop stop-shingles" production guard ngram.py's docstring
wishes for, but lossless. Candidates are verified exactly with a
scan-local array intersection, so output ≡ the quadratic join (the
DuckDB oracle IS the quadratic spelling — same rows, different plan).

Integer-exact throughout: τ = T_NUM/T_DEN is applied as integer ceil
((n·T_NUM + T_DEN − 1) div T_DEN); the PPJoin length filter
(τ·max(na,nb) ≤ min(na,nb)) prunes candidate pairs before
verification with the same integer arithmetic. The only float is the
final jaccard division (small-int ratio — IEEE-exact in both engines).

Scale: one documents scan feeds shingle explode; document frequency is
a shingle-keyed agg (map-side partials); the prefix is a per-doc
row_number window (doc-keyed, small partitions); the candidate join
shuffles only prefix rows (≈ half the tokens at τ=0.5, and the RARE
half); verification joins the candidate pair list with the per-doc
shingle ARRAYS (two doc-keyed hash joins, one row per candidate) and
intersects scan-locally. No all-token self-join anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from . import shingles_col, shingles_sql

#: Jaccard threshold τ = T_NUM / T_DEN (integer-exact prefix math).
T_NUM, T_DEN = 1, 2

_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, unnest({shingles_sql()}) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
), cnt AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
), inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
  FROM sh a JOIN sh b USING (shingle)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b, i.shared,
       CAST(i.shared AS DOUBLE) / (ca.n + cb.n - i.shared) AS jaccard
FROM inter i
JOIN cnt ca ON ca.doc_id = i.doc_a
JOIN cnt cb ON cb.doc_id = i.doc_b
WHERE i.shared * {T_DEN} >= (ca.n + cb.n - i.shared) * {T_NUM}
"""


def _ceil_tau(n_col: str) -> F.Column:
    """⌈τ·n⌉ as pure integer arithmetic."""
    return F.expr(f"(({n_col} * {T_NUM} + {T_DEN - 1}) div {T_DEN})")


@register("prefix_filter_jaccard_pairs", oracle=_ORACLE)
def prefix_filter_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_a, doc_b, shared, jaccard) — every document pair with exact
    Jaccard ≥ τ over distinct 3-word shingles, found via the prefix-
    filtered candidate join instead of the full shingle self-join."""
    docs = load_table(spark, sf_dir, "documents")
    # NOTE r12: fan_out(docs) was tried here and REVERTED — A/B-measured
    # 6.4 s -> 28+ s warm: repartitioning below the persisted frame
    # degraded the downstream join planning (docfreq/self-join lost
    # their broadcast) and cost far more than the single-task cache
    # fill it saved. The persist itself (one shingling pass for 4
    # consumers) is the win that stays.
    toks = (
        docs.select("doc_id", shingles_col().alias("toks"))
        .withColumn("n", F.size("toks"))
        .persist()  # referenced 4 ways (explode, docfreq via explode,
        # verify a-side, verify b-side): one documents scan + one
        # shingle materialization instead of six scans
    )
    sh = toks.select("doc_id", "n", F.explode("toks").alias("shingle"))

    # global document frequency: the total order that puts rare shingles
    # in the prefix and stop-shingles out of the join entirely
    docfreq = sh.groupBy("shingle").agg(F.count("*").alias("df"))

    prefix_len = (F.col("n") - _ceil_tau("n") + F.lit(1)).alias("p")
    ranked = (
        sh.join(docfreq, "shingle")
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("df", "shingle")
            ),
        )
        .select("doc_id", "n", "shingle", "rn", prefix_len)
    )
    prefix = ranked.filter(F.col("rn") <= F.col("p")).select(
        "doc_id", "n", "rn", "shingle"
    )

    # candidate pairs: share >=1 prefix shingle + PPJoin length filter
    # (tau * max(na, nb) <= min(na, nb), integer form both directions)
    # + PPJoin POSITIONAL filter: a match at ordered positions (i, j)
    # can support an overlap of at most 1 + min(na-i, nb-j); a pair
    # needs alpha = ceil(tau/(1+tau) * (na+nb)) common tokens, and the
    # FIRST common token of a qualifying pair always satisfies the
    # bound (everything shared sits at or after it on both sides), so
    # pruning rows below alpha is lossless while cutting the candidate
    # multiset BEFORE the distinct shuffle — the expensive step on
    # vocabulary-saturated corpora (measured at sf1, SCALING.md r12).
    a, b = prefix.alias("a"), prefix.alias("b")
    remaining = F.lit(1) + F.least(
        F.col("a.n") - F.col("a.rn"), F.col("b.n") - F.col("b.rn")
    )
    cand = (
        a.join(b, "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .filter(F.col("b.n") * T_DEN >= F.col("a.n") * T_NUM)
        .filter(F.col("a.n") * T_DEN >= F.col("b.n") * T_NUM)
        .filter(
            remaining * (T_NUM + T_DEN)
            >= (F.col("a.n") + F.col("b.n")) * T_NUM
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )

    # exact verification: scan-local array intersection per candidate
    ta = toks.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("na"),
    )
    tb = toks.select(
        F.col("doc_id").alias("doc_b"),
        F.col("toks").alias("toks_b"),
        F.col("n").alias("nb"),
    )
    shared = F.size(F.array_intersect("toks_a", "toks_b")).cast("bigint")
    return (
        cand.join(ta, "doc_a")
        .join(tb, "doc_b")
        .withColumn("shared", shared)
        .filter(
            F.col("shared") * T_DEN
            >= (F.col("na") + F.col("nb") - F.col("shared")) * T_NUM
        )
        .select(
            "doc_a",
            "doc_b",
            "shared",
            (
                F.col("shared").cast("double")
                / (F.col("na") + F.col("nb") - F.col("shared"))
            ).alias("jaccard"),
        )
    )
