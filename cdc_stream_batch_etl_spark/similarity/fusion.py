"""Hybrid retrieval — reciprocal-rank fusion of the lexical and
semantic rungs (beyond-reference).

text/bm25.py ranks documents lexically and similarity/ann.py ranks
them by embedding cosine; production retrieval (and retrieval-based
corpus audits / decontamination sweeps) fuses the two, and the
standard engine-agnostic fusion is RRF (Cormack, Clarke & Büttcher,
SIGIR'09): score(d) = Σ_legs 1/(k₀ + rank_leg(d)) with k₀ = 60 — rank
-based, so the two legs' incomparable score scales never need
calibration.

Determinism (full DuckDB oracle): RRF is arithmetic on INTEGER ranks —
the one fusion rule that is trivially cross-engine-exact. Both legs'
ranks are themselves hash-proven elsewhere (bm25_topk; ann_cosine_topk
 — including that DuckDB's list_dot_product left-folds exactly like
Spark's aggregate(zip_with)), and the fused score is two IEEE double
divisions added in a fixed order, the same literal expression both
engines. A document missing from one leg contributes 0 from it
(coalesce), the standard RRF treatment.

Scale: the lexical leg collapses to |matching (doc, term)| rows at the
scan (bm25.py); the semantic leg is one corpus scan against a 1-row
broadcast query vector (never a collect). Each leg is TRUNCATED to the
top RANK_DEPTH candidates BEFORE ranking (orderBy().limit() plans as
TakeOrderedAndProject — a bounded per-partition heap, no global sort),
so the rank window runs over ≤ RANK_DEPTH rows however large the
corpus; fusing at a fixed depth is the standard production RRF
treatment (a document past rank 1000 contributes ≤ 1/1060 ≈ noise).
The fusion itself is an outer join of two ≤ RANK_DEPTH-row frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..text.bm25 import _TERMS_SQL, bm25_scores

#: Standard RRF constant (Cormack et al. use 60).
RRF_K = 60
#: The semantic query: the corpus is ranked against this vector's
#: embedding (a 1-row broadcast, never collected).
QUERY_VEC_ID = 0
TOP_K = 20
#: Per-leg rank truncation depth — bounds the rank window's input at
#: any corpus size (see Scale in the module docstring).
RANK_DEPTH = 1000

_DOT = "aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0.0D, (acc, v) -> acc + v)"

#: shared lex/sem rank CTEs (WITH body) — reused by the RRF fusion and
#: the RBO rank-agreement oracles
_LEGS_CTE = f"""lex AS (
  SELECT doc_id,
         row_number() OVER (ORDER BY score DESC, doc_id) AS lex_rank
  FROM (
    SELECT * FROM (
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
      SELECT q.doc_id,
             ((s.n_docs - d.df + 0.5e0) / (d.df + 0.5e0))
               * (q.tf * (1.2e0 + 1))
               / (q.tf + 1.2e0 * (1 - 0.75e0 + 0.75e0 * l.dl / s.avgdl)) AS sc,
             q.token
      FROM qtf q
      JOIN dft d USING (token)
      JOIN dl l USING (doc_id)
      CROSS JOIN stats s
    )
    SELECT doc_id,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                                    list(sc ORDER BY token)),
                       (a, b) -> a + b) AS score
    FROM contrib GROUP BY doc_id
    ) ORDER BY score DESC, doc_id LIMIT {RANK_DEPTH}
  )
),
qv AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qe
  FROM embeddings WHERE vec_id = {QUERY_VEC_ID}
),
sem AS (
  SELECT vec_id AS doc_id,
         row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS sem_rank
  FROM (
    SELECT * FROM (
    SELECT c.vec_id,
           list_dot_product(qv.qe, CAST(c.embedding AS DOUBLE[]))
             / (sqrt(list_dot_product(qv.qe, qv.qe))
                * sqrt(list_dot_product(CAST(c.embedding AS DOUBLE[]),
                                        CAST(c.embedding AS DOUBLE[])))) AS cos_sim
    FROM embeddings c CROSS JOIN qv
    WHERE c.vec_id <> {QUERY_VEC_ID}
    ) ORDER BY cos_sim DESC, vec_id LIMIT {RANK_DEPTH}
  )
)
"""

_RRF_ORACLE = f"""
WITH {_LEGS_CTE}
SELECT COALESCE(lex.doc_id, sem.doc_id) AS doc_id,
       COALESCE(1.0e0 / ({RRF_K} + lex.lex_rank), 0.0e0)
         + COALESCE(1.0e0 / ({RRF_K} + sem.sem_rank), 0.0e0) AS rrf_score,
       CAST(lex.lex_rank AS BIGINT) AS lex_rank,
       CAST(sem.sem_rank AS BIGINT) AS sem_rank
FROM lex FULL OUTER JOIN sem USING (doc_id)
ORDER BY rrf_score DESC, doc_id
LIMIT {TOP_K}
"""


def _lex_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, lex_rank): the BM25 leg, truncated to RANK_DEPTH via a
    bounded per-partition heap (TakeOrderedAndProject)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        bm25_scores(docs)
        .orderBy(F.desc("score"), "doc_id")
        .limit(RANK_DEPTH)  # TakeOrdered: bounded heap, no global sort
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("score"), "doc_id"))
            .alias("lex_rank"),
        )
    )


def _sem_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, sem_rank): the cosine leg against QUERY_VEC_ID's
    embedding (1-row broadcast, one corpus scan), RANK_DEPTH-truncated."""
    emb = load_table(spark, sf_dir, "embeddings")
    qv = (
        emb.filter(F.col("vec_id") == QUERY_VEC_ID)
        .select(F.col("embedding").cast("array<double>").alias("qe"))
    )
    dot_qc = _DOT.format(a="qe", b="ce")
    dot_qq = _DOT.format(a="qe", b="qe")
    dot_cc = _DOT.format(a="ce", b="ce")
    return (
        emb.filter(F.col("vec_id") != QUERY_VEC_ID)
        .select("vec_id", F.col("embedding").cast("array<double>").alias("ce"))
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("doc_id"),
            (
                F.expr(dot_qc)
                / (F.sqrt(F.expr(dot_qq)) * F.sqrt(F.expr(dot_cc)))
            ).alias("cos_sim"),
        )
        .orderBy(F.desc("cos_sim"), "doc_id")
        .limit(RANK_DEPTH)  # TakeOrdered: bounded heap, no global sort
        .select(
            "doc_id",
            F.row_number()
            .over(Window.orderBy(F.desc("cos_sim"), "doc_id"))
            .alias("sem_rank"),
        )
    )


@register("hybrid_rrf_search", oracle=_RRF_ORACLE)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K documents by reciprocal-rank fusion of the BM25 lexical
    ranking (QUERY_TERMS) and the cosine semantic ranking against
    QUERY_VEC_ID's embedding."""
    lex = _lex_ranks(spark, sf_dir)
    sem = _sem_ranks(spark, sf_dir)
    fused = (
        lex.join(sem, "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("lex_rank")), F.lit(0.0))
                + F.coalesce(F.lit(1.0) / (F.lit(RRF_K) + F.col("sem_rank")), F.lit(0.0))
            ).alias("rrf_score"),
            F.col("lex_rank").cast("bigint").alias("lex_rank"),
            F.col("sem_rank").cast("bigint").alias("sem_rank"),
        )
    )
    return fused.orderBy(F.desc("rrf_score"), "doc_id").limit(TOP_K)


#: RBO persistence parameter and evaluation depth (Webber, Moffat &
#: Zobel, TOIS 2010: p = 0.9 weights the top ranks; depth 10 covers the
#: first page). Weights are Python-computed literals inlined into BOTH
#: engines, so no cross-engine pow() enters the arithmetic.
RBO_P = 0.9
RBO_DEPTH = 10
_RBO_W = [(1 - RBO_P) * RBO_P ** (d - 1) for d in range(1, RBO_DEPTH + 1)]
#: SQL spelling with explicit DOUBLE casts — DuckDB parses bare decimal
#: literals as DECIMAL, which must not enter the weight arithmetic
_RBO_W_SQL = "[" + ", ".join(f"CAST({w!r} AS DOUBLE)" for w in _RBO_W) + "]"

_RBO_ORACLE = f"""
WITH {_LEGS_CTE},
pairs AS (
  SELECT greatest(lex.lex_rank, sem.sem_rank) AS d_at
  FROM lex JOIN sem USING (doc_id)
  WHERE lex.lex_rank <= {RBO_DEPTH} AND sem.sem_rank <= {RBO_DEPTH}
),
depths AS (
  SELECT d.depth, ({_RBO_W_SQL})[d.depth] AS w
  FROM (SELECT unnest(generate_series(1, {RBO_DEPTH})) AS depth) d
),
agree AS (
  SELECT depths.depth, depths.w,
         CAST(count(pairs.d_at) AS BIGINT) AS n_overlap
  FROM depths LEFT JOIN pairs ON pairs.d_at <= depths.depth
  GROUP BY depths.depth, depths.w
)
SELECT CAST(depth AS BIGINT) AS depth,
       n_overlap,
       CAST(n_overlap AS DOUBLE) / depth AS agreement,
       w * (CAST(n_overlap AS DOUBLE) / depth) AS rbo_partial,
       sum(w * (CAST(n_overlap AS DOUBLE) / depth))
         OVER (ORDER BY depth ROWS UNBOUNDED PRECEDING) AS rbo_cum
FROM agree
ORDER BY depth
"""


@register("rank_overlap_rbo", oracle=_RBO_ORACLE)
def rank_overlap_rbo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rank-biased overlap between the lexical and semantic legs — the
    standard top-weighted agreement measure for comparing two rankings
    of the same corpus (Webber et al., TOIS 2010). Per depth d ≤ 10:
    the overlap |top-d(BM25) ∩ top-d(cosine)|, the agreement overlap/d,
    its (1−p)p^(d−1) contribution, and the running RBO_min. A hybrid
    search whose legs already agree (high RBO) gains little from RRF
    fusion; low RBO is where fusion pays.

    Scale: both legs are the RANK_DEPTH-truncated frames fusion uses;
    everything after them operates on ≤ 2·RANK_DEPTH rows (the depth
    table is 10 rows, the theta join ≤ 10×10) — cost is the legs
    themselves. The running sum's add order is the depth order in both
    engines, so the doubles agree bit-for-bit."""
    lex = _lex_ranks(spark, sf_dir)
    sem = _sem_ranks(spark, sf_dir)
    pairs = (
        lex.join(sem, "doc_id")
        .filter((F.col("lex_rank") <= RBO_DEPTH) & (F.col("sem_rank") <= RBO_DEPTH))
        .select(F.greatest("lex_rank", "sem_rank").alias("d_at"))
    )
    warr = F.array(*[F.lit(w) for w in _RBO_W])
    depths = spark.range(1, RBO_DEPTH + 1).select(
        F.col("id").alias("depth"),
        F.element_at(warr, F.col("id").cast("int")).alias("w"),
    )
    agree = (
        depths.join(F.broadcast(pairs), F.col("d_at") <= F.col("depth"), "left")
        .groupBy("depth", "w")
        .agg(F.count("d_at").cast("bigint").alias("n_overlap"))
    )
    agreement = F.col("n_overlap").cast("double") / F.col("depth")
    return (
        agree.select(
            F.col("depth").cast("bigint").alias("depth"),
            "n_overlap",
            agreement.alias("agreement"),
            (F.col("w") * agreement).alias("rbo_partial"),
        )
        .withColumn(
            "rbo_cum",
            F.sum("rbo_partial").over(
                Window.orderBy("depth").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .orderBy("depth")
    )
