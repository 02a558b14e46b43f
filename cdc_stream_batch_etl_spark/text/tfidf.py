"""TF-IDF top terms per document — the classic corpus-weighted term
importance score, used for keyword extraction, boilerplate detection, and
cheap topical clustering of training corpora.

Pipeline shape (all relational, no UDFs):
  1. tf: explode tokens → count per (doc, token). One shuffle on
     (doc_id, token); map-side combine compresses repeated tokens.
  2. df: from the SAME (doc, token) aggregate, count docs per token —
     reuses the exchange (Catalyst schedules the second agg over the
     first's output, shuffling only O(distinct (doc,token)) rows).
  3. idf = ln(N / df) with N computed as a scalar subquery →
     broadcast; score = tf * idf is a per-row expression.
  4. top-K per doc via row_number over (doc_id ORDER BY score DESC,
     token) — one window sort co-partitioned with the tf shuffle.

Determinism: tf, df, N are exact integers, but ln() is a transcendental
— Java's Math.log (Spark) and libm (DuckDB) may differ in the final ulp
for the same input (measured: ~1e-16 relative on this corpus). The
exported score is therefore rounded to 9 decimals (both engines round
positive halves identically), comfortably above ulp noise and far below
any meaningful score difference; the rank is computed on each engine's
full-precision score, with ties broken on the token string. Terms with
equal (tf, df) produce bit-identical scores within one engine, so rank
stability is unaffected by the cross-engine ulp. N is the total document
count (every doc tokenizes to >= 1 token, so tf covers all docs).

At 100 TB: the only O(corpus-tokens) shuffle is step 1 (unavoidable —
it *is* the tf computation); df and the window reuse its partitioning or
operate on the much smaller aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

TOP_K = 3

_TFIDF_ORACLE = f"""
WITH tf AS (
  SELECT doc_id, tok, count(*) AS tf
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok
), df AS (
  SELECT tok, count(*) AS df FROM tf GROUP BY tok
), n AS (
  SELECT count(*) AS n_docs FROM documents
), scored AS (
  SELECT tf.doc_id, tf.tok, tf.tf, df.df,
         tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) AS tfidf,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf * ln(CAST(n.n_docs AS DOUBLE) / df.df) DESC,
                                     tf.tok) AS rnk
  FROM tf JOIN df ON tf.tok = df.tok CROSS JOIN n
)
SELECT doc_id, tok, tf, df, round(tfidf, 9) AS tfidf, CAST(rnk AS BIGINT) AS rnk
FROM scored
WHERE rnk <= {TOP_K}
"""


@register("tfidf_top_terms", oracle=_TFIDF_ORACLE)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    n = docs.agg(F.count("*").cast("double").alias("n_docs"))  # 1-row, broadcast

    tf = (
        docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    df = tf.groupBy("tok").agg(F.count("*").alias("df"))
    scored = (
        tf.join(df, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "tok",
            "tf",
            "df",
            (F.col("tf") * F.log(F.col("n_docs") / F.col("df"))).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("tok"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= TOP_K)
        .select("doc_id", "tok", "tf", "df", F.round("tfidf", 9).alias("tfidf"), "rnk")
    )
