"""MinHash + banded LSH near-duplicate detection — the 100 TB dedup path.

shingle → 16 md5-derived minhashes (scan-local array expressions, NO
shuffle) → 4 bands of 4 → band-hash bucket join → candidate pairs →
exact-Jaccard verification of candidates only.

Why not spark.ml MinHashLSH: its hash family is seeded JVM-side and can't
be reproduced in the DuckDB oracle; this md5 family is engine-neutral, and
the banded plan is the same. At 100 TB the candidate set (pairs sharing a
band bucket) is orders of magnitude smaller than the full shingle
self-join in ngram.py — that asymmetry is the entire point of LSH.

With J≥0.9 near-dups and 4 bands of 4 rows, P(candidate) = 1-(1-J^4)^4
≥ 0.996 — recall asserted against ngram_jaccard_pairs in tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from . import hash64_expr, hash64_sql, shingles_col, shingles_sql
from .ngram import JACCARD_THRESHOLD

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS


def _sig_exprs_spark() -> list:
    out = []
    for i in range(N_HASHES):
        seeded = hash64_expr(f"concat('seed{i}|', s)")
        out.append(
            F.expr(f"array_min(transform(shingles, s -> {seeded}))").alias(f"sig_{i}")
        )
    return out


def _sig_exprs_sql() -> str:
    cols = []
    for i in range(N_HASHES):
        seeded = hash64_sql(f"'seed{i}|' || s")
        cols.append(f"list_min([{seeded} for s in shingles]) AS sig_{i}")
    return ",\n         ".join(cols)


_SIG_ORACLE = f"""
SELECT doc_id,
         {_sig_exprs_sql()}
FROM (
  SELECT doc_id, {shingles_sql()} AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
)
"""


@register("minhash_signatures", oracle=_SIG_ORACLE)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 16-wide MinHash signature, computed entirely scan-local
    (array transform + array_min: no explode, no shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.withColumn("shingles", shingles_col()).select("doc_id", *_sig_exprs_spark())


def _band_hash_spark(b: int) -> F.Column:
    parts = [f"cast(sig_{b * ROWS_PER_BAND + r} as string)" for r in range(ROWS_PER_BAND)]
    return F.expr(f"md5(concat_ws(',', {', '.join(parts)}))")


def _band_hash_sql(b: int) -> str:
    parts = [f"CAST(sig_{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)]
    return f"md5(concat_ws(',', {', '.join(parts)}))"


_PAIRS_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, unnest({shingles_sql()}) AS shingle
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
), cnt AS (
  SELECT doc_id, count(*) AS n FROM sh GROUP BY 1
), sigs AS ({_SIG_ORACLE}),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {_band_hash_sql(b)} AS bucket FROM sigs" for b in range(N_BANDS))}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
), inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS shared
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND a.shingle = b.shingle
  GROUP BY 1, 2
)
SELECT i.doc_a, i.doc_b,
       CAST(i.shared AS DOUBLE) / (ca.n + cb.n - i.shared) AS jaccard
FROM inter i
JOIN cnt ca ON ca.doc_id = i.doc_a
JOIN cnt cb ON cb.doc_id = i.doc_b
WHERE CAST(i.shared AS DOUBLE) / (ca.n + cb.n - i.shared) >= {JACCARD_THRESHOLD}
"""


@register("minhash_lsh_pairs", oracle=_PAIRS_ORACLE)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    with_sh = docs.withColumn("shingles", shingles_col())
    sigs = with_sh.select("doc_id", *_sig_exprs_spark())

    # one pass over sigs via posexplode (a 4-way union would rescan the
    # corpus and recompute every md5 signature once per band)
    bands = sigs.select(
        "doc_id",
        F.posexplode(F.array(*[_band_hash_spark(b) for b in range(N_BANDS)])).alias(
            "band", "bucket"
        ),
    )

    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    sh = with_sh.select("doc_id", F.explode("shingles").alias("shingle"))
    cnt = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    inter = (
        cand.join(sh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id")) & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("shared"))
    )
    jaccard = F.col("shared").cast("double") / (F.col("ca.n") + F.col("cb.n") - F.col("shared"))
    return (
        inter.join(cnt.alias("ca"), F.col("doc_a") == F.col("ca.doc_id"))
        .join(cnt.alias("cb"), F.col("doc_b") == F.col("cb.doc_id"))
        .select("doc_a", "doc_b", jaccard.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )
