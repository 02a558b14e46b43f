"""Graded retrieval evaluation — nDCG@d, precision@d and reciprocal
rank of the lexical leg against the semantic leg as relevance
(Järvelin & Kekäläinen, TOIS 2002 for DCG/nDCG; standard IR eval —
beyond-reference, SURVEY §2.11 retrieval-eval family).

rank_overlap_rbo (similarity/fusion.py) measures rank AGREEMENT
symmetrically; this is the asymmetric companion: treat the cosine
leg's top-REL_DEPTH as graded ground truth (rel = REL_DEPTH+1 − rank,
the linear-gain convention) and score the BM25 leg against it. Teams
tuning a cheap lexical retriever against an expensive semantic one —
or auditing how much a fusion stage can possibly add — read exactly
this table: where the lexical ranking finds relevance (precision@d),
how well it orders it (nDCG@d), and how fast it reaches the first
relevant hit (reciprocal rank).

Determinism (full DuckDB oracle): gains are INTEGERS from hash-proven
rank legs; the log2 discounts 1/log2(i+1) and every ideal-DCG
prefix are PYTHON-COMPUTED literals inlined into both engines (the
_RBO_W pattern — no cross-engine transcendental enters the
arithmetic). The running DCG sum is NOT order-safe across engines:
DuckDB's window aggregate accumulates through a segment tree (pairwise
adds) while Spark folds frame-order, and the two differ in the last
ulp — so dcg_cum/ndcg are exported rounded to 9 decimals (the tfidf
convention; measured divergence ~1e-16 relative). precision@d is an
exact-integer division and reciprocal rank a running MAX of exact
1/depth terms — both exported unrounded.

Scale: both legs are the RANK_DEPTH-truncated frames fusion uses
(bounded per-partition heaps, never a global sort); everything
after them runs on ≤ EVAL_DEPTH rows.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from .fusion import _LEGS_CTE, _lex_ranks, _sem_ranks

#: semantic ranks 1..REL_DEPTH carry graded relevance REL_DEPTH..1.
#: 250 is deep enough that the lexical top-10 (semantic ranks ~60-500 on
#: the driver corpus) lands a MIX of graded and zero-relevance rows —
#: a shallower cutoff grades the whole table zero, which exercises
#: nothing.
REL_DEPTH = 250
#: lexical ranks evaluated
EVAL_DEPTH = 10

#: 1/log2(i+1) discount per depth — Python literals, both engines
_DISC = [1.0 / math.log2(i + 1) for i in range(1, EVAL_DEPTH + 1)]
#: ideal DCG prefix at each depth: the best ordering puts the grades
#: REL_DEPTH, REL_DEPTH-1, … first
_IDCG = []
_acc = 0.0
for _i in range(1, EVAL_DEPTH + 1):
    _acc += max(REL_DEPTH + 1 - _i, 0) * _DISC[_i - 1]
    _IDCG.append(_acc)

_DISC_SQL = "[" + ", ".join(f"CAST({w!r} AS DOUBLE)" for w in _DISC) + "]"
_IDCG_SQL = "[" + ", ".join(f"CAST({w!r} AS DOUBLE)" for w in _IDCG) + "]"

_NDCG_ORACLE = f"""
WITH {_LEGS_CTE},
graded AS (
  SELECT lex.lex_rank AS depth, lex.doc_id,
         CAST(COALESCE({REL_DEPTH} + 1 - sem.sem_rank, 0) AS BIGINT) AS rel
  FROM lex LEFT JOIN sem
    ON lex.doc_id = sem.doc_id AND sem.sem_rank <= {REL_DEPTH}
  WHERE lex.lex_rank <= {EVAL_DEPTH}
)
SELECT CAST(depth AS BIGINT) AS depth, doc_id, rel,
       CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END)
              OVER w AS BIGINT) AS n_rel_cum,
       CAST(sum(CASE WHEN rel > 0 THEN 1 ELSE 0 END) OVER w AS DOUBLE)
         / depth AS precision_at_d,
       round(sum(rel * ({_DISC_SQL})[depth]) OVER w, 9) AS dcg_cum,
       round(sum(rel * ({_DISC_SQL})[depth]) OVER w / ({_IDCG_SQL})[depth], 9)
         AS ndcg,
       max(CASE WHEN rel > 0 THEN 1.0e0 / depth ELSE 0.0e0 END)
         OVER w AS rr_cum
FROM graded
WINDOW w AS (ORDER BY depth ROWS UNBOUNDED PRECEDING)
ORDER BY depth
"""


@register("retrieval_ndcg_eval", oracle=_NDCG_ORACLE)
def retrieval_ndcg_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per lexical depth d ≤ 10: the BM25 leg's document, its graded
    relevance under the cosine leg, cumulative relevant count,
    precision@d, DCG@d, nDCG@d, and the running reciprocal rank."""
    lex = _lex_ranks(spark, sf_dir).filter(F.col("lex_rank") <= EVAL_DEPTH)
    sem = _sem_ranks(spark, sf_dir).filter(F.col("sem_rank") <= REL_DEPTH)
    graded = (
        lex.join(F.broadcast(sem), "doc_id", "left")
        .select(
            F.col("lex_rank").alias("depth"),
            "doc_id",
            F.coalesce(F.lit(REL_DEPTH + 1) - F.col("sem_rank"), F.lit(0))
            .cast("bigint")
            .alias("rel"),
        )
    )
    disc = F.array(*[F.lit(w) for w in _DISC])
    idcg = F.array(*[F.lit(w) for w in _IDCG])
    w = Window.orderBy("depth").rowsBetween(Window.unboundedPreceding, 0)
    rel_hit = F.when(F.col("rel") > 0, 1).otherwise(0)
    dcg_cum = F.sum(
        F.col("rel") * F.element_at(disc, F.col("depth").cast("int"))
    ).over(w)
    return (
        graded.select(
            F.col("depth").cast("bigint").alias("depth"),
            "doc_id",
            "rel",
            F.sum(rel_hit).over(w).cast("bigint").alias("n_rel_cum"),
            (F.sum(rel_hit).over(w).cast("double") / F.col("depth")).alias(
                "precision_at_d"
            ),
            F.round(dcg_cum, 9).alias("dcg_cum"),
            F.round(
                dcg_cum / F.element_at(idcg, F.col("depth").cast("int")), 9
            ).alias("ndcg"),
            F.max(
                F.when(F.col("rel") > 0, F.lit(1.0) / F.col("depth")).otherwise(
                    F.lit(0.0)
                )
            )
            .over(w)
            .alias("rr_cum"),
        )
        .orderBy("depth")
    )
