"""BM25 relevance ranking over the document corpus — beyond-reference.

term_postings builds the inverted index and tfidf_top_terms the
per-document feature vectors; this adds the piece a corpus-search /
retrieval-eval pipeline actually serves: given a multi-term query,
score every matching document with BM25 (Robertson-Spärck Jones) and
return the top-K. Training-data pipelines use exactly this shape for
targeted corpus audits ("find the documents most about X") and for
retrieval-based decontamination sweeps.

Determinism (full DuckDB oracle, atol=0): two adaptations, both in the
repo's established conventions:
  - IDF uses the RATIONAL core (N − df + ½)/(df + ½) WITHOUT the
    ln(): like text/lm.py, ln is not a correctly-rounded IEEE op and
    diverges between JVM and C libm in the last ulp. Dropping the log
    changes cross-term weighting (rare terms weigh relatively more)
    but keeps the per-term saturation curve and document ranking
    monotone per term — and makes every arithmetic step an exact-IEEE
    double op on identical integers in both engines.
  - The per-document score folds its per-term contributions in TERM
    order via the sorted-fold idiom (collect_list(struct) → array_sort
    → 0.0-seeded fold ≡ DuckDB list(s ORDER BY token) → list_reduce;
    see similarity/centroids.py for why the seeds agree bitwise) —
    float addition is not commutative-associative, so the fold order
    is pinned.

Scale: the token explode is filtered to the query terms BEFORE any
aggregation (a handful of string equalities that push into the scan
projection), so the wide corpus collapses to |matching (doc, term)|
rows immediately; df and the corpus length stats are term-count- and
1-row-sized broadcast frames; one doc_id-keyed shuffle for the fold;
top-K is TakeOrderedAndProject, never a global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: The standing audit query — terms chosen from the testdata vocabulary
#: at mixed document frequencies. Literal by design: a production caller
#: parameterizes bm25_topk(); the registered query pins one for the
#: oracle.
QUERY_TERMS = ("spark", "merge", "window", "batch")
K1 = 1.2
B = 0.75
TOP_K = 20

_TERMS_SQL = ", ".join(f"'{t}'" for t in sorted(QUERY_TERMS))

# DuckDB parses bare decimal literals (1.2, 0.5) as DECIMAL and keeps
# mixed bigint/decimal arithmetic exact-decimal until a double joins the
# expression — which diverges from Spark's all-double pipeline by an ulp
# (observed: tf * (1.2+1) = 6.600000000000001 in double vs 6.6 via
# decimal). The e0 exponent suffix forces DOUBLE literals so every oracle
# step is the same IEEE op as the Spark side.
_K1_SQL = f"{K1}e0"
_B_SQL = f"{B}e0"

_BM25_ORACLE = f"""
WITH dl AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
  FROM documents
),
stats AS (
  SELECT count(*) AS n_docs, CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
  FROM dl
),
tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
),
qtf AS (
  SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
  FROM tok WHERE token IN ({_TERMS_SQL})
  GROUP BY doc_id, token
),
dft AS (
  SELECT token, CAST(count(*) AS BIGINT) AS df FROM qtf GROUP BY token
),
contrib AS (
  SELECT q.doc_id, q.token,
         ((s.n_docs - d.df + 0.5e0) / (d.df + 0.5e0))
           * (q.tf * ({_K1_SQL} + 1))
           / (q.tf + {_K1_SQL} * (1 - {_B_SQL} + {_B_SQL} * l.dl / s.avgdl)) AS sc
  FROM qtf q
  JOIN dft d USING (token)
  JOIN dl l USING (doc_id)
  CROSS JOIN stats s
)
SELECT doc_id,
       list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                list(sc ORDER BY token)),
                   (a, b) -> a + b) AS score,
       CAST(count(*) AS BIGINT) AS n_terms_matched
FROM contrib
GROUP BY doc_id
ORDER BY score DESC, doc_id
LIMIT {TOP_K}
"""


def bm25_scores(
    docs: DataFrame,
    terms: tuple[str, ...] = QUERY_TERMS,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """(doc_id, score, n_terms_matched) for every document matching at
    least one query term — parameterized for production callers; the
    registered query pins (QUERY_TERMS, K1, B) for the oracle."""
    dl = docs.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("dl")
    )
    stats = dl.agg(
        F.count("*").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count("*")).alias("avgdl"),
    )
    qtf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .filter(F.col("token").isin(*terms))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("tf"))
    )
    dft = qtf.groupBy("token").agg(F.count("*").alias("df"))
    # same literal expression shape as the oracle: every step an IEEE
    # double op on identical integer inputs
    sc = (
        ((F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5)))
        * (F.col("tf") * F.lit(k1 + 1))
        / (F.col("tf") + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl")))
    )
    contrib = (
        qtf.join(F.broadcast(dft), "token")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", "token", sc.alias("sc"))
    )
    folded = F.aggregate(
        F.array_sort(F.collect_list(F.struct("token", "sc"))),
        F.lit(0.0),
        lambda acc, x: acc + x["sc"],
    )
    return contrib.groupBy("doc_id").agg(
        folded.alias("score"),
        F.count("*").alias("n_terms_matched"),
    )


@register("bm25_topk", oracle=_BM25_ORACLE)
def bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K documents by rational-IDF BM25 for the standing audit query
    (module docstring); deterministic tie-break on doc_id."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        bm25_scores(docs)
        .orderBy(F.desc("score"), "doc_id")
        .limit(TOP_K)
    )
