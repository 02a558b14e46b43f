"""MinHash + banded LSH near-duplicate detection — the 100 TB dedup path.

shingle → ONE md5-derived 60-bit hash per shingle (scan-local, no shuffle)
→ 16 universal-hash mixes ``(a_i * (h % P) + b_i) % P`` → array_min per
slot → 4 bands of 4 → band-hash bucket join → candidate pairs →
exact-Jaccard verification via array_intersect on the candidate pairs only.

Why not spark.ml MinHashLSH: its hash family is seeded JVM-side and can't
be reproduced in the DuckDB oracle; this md5+affine family is
engine-neutral, and the banded plan is the same. At 100 TB the candidate
set (pairs sharing a band bucket) is orders of magnitude smaller than the
full shingle self-join in ngram.py — that asymmetry is the entire point of
LSH.

Scale notes:
- one md5 per shingle (not one per shingle×seed): the 16 signature slots
  are integer affine mixes of the same hash — 16× less hashing on the
  corpus scan, pure codegen arithmetic after.
- the per-doc signature/band table (4 rows × ~50 bytes per doc) is
  persisted before the bucket self-join so the corpus is scanned exactly
  once; at cluster scale this table is ~10^-4 of corpus bytes.
- verification joins the SMALL candidate set back to the doc shingle
  arrays (AQE broadcasts the candidate side) and computes Jaccard
  scan-local via array_intersect/array_union — no corpus-wide shingle
  explode, no giant equi-join on shingle strings.

With J≥0.9 near-dups and 4 bands of 4 rows, P(candidate) = 1-(1-J^4)^4
≥ 0.996 — recall asserted against ngram_jaccard_pairs in tests.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from . import hash64_expr, hash64_sql, shingles_col, shingles_sql
from .ngram import JACCARD_THRESHOLD

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
_P = (1 << 31) - 1  # Mersenne prime; a*(h%P)+b stays under 2^62 (no overflow)

_rng = random.Random(42)
_AB = [(_rng.randrange(1, _P, 2), _rng.randrange(0, _P)) for _ in range(N_HASHES)]

_H_SPARK = hash64_expr("s")
_H_SQL = hash64_sql("s")


def _sig_exprs_spark() -> list:
    return [
        F.expr(f"array_min(transform(hshingles, h -> ({a}::bigint * (h % {_P}) + {b}) % {_P}))").alias(
            f"sig_{i}"
        )
        for i, (a, b) in enumerate(_AB)
    ]


def _sig_exprs_sql() -> str:
    cols = [
        f"list_min([({a} * (h % {_P}) + {b}) % {_P} for h in hshingles]) AS sig_{i}"
        for i, (a, b) in enumerate(_AB)
    ]
    return ",\n         ".join(cols)


_SIG_ORACLE = f"""
SELECT doc_id,
         {_sig_exprs_sql()}
FROM (
  SELECT doc_id, [{_H_SQL} for s in shingles] AS hshingles
  FROM (
    SELECT doc_id, {shingles_sql()} AS shingles
    FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
  )
)
"""


def _with_hashed_shingles(docs: DataFrame) -> DataFrame:
    return docs.withColumn("shingles", shingles_col()).withColumn(
        "hshingles", F.expr(f"transform(shingles, s -> {_H_SPARK})")
    )


@register("minhash_signatures", oracle=_SIG_ORACLE)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc 16-wide MinHash signature, computed entirely scan-local
    (one md5 per shingle + affine mixes; no explode, no shuffle)."""
    docs = load_table(spark, sf_dir, "documents")
    return _with_hashed_shingles(docs).select("doc_id", *_sig_exprs_spark())


def _band_hash_spark(b: int) -> F.Column:
    parts = [f"cast(sig_{b * ROWS_PER_BAND + r} as string)" for r in range(ROWS_PER_BAND)]
    return F.expr(f"md5(concat_ws(',', {', '.join(parts)}))")


def _band_hash_sql(b: int) -> str:
    parts = [f"CAST(sig_{b * ROWS_PER_BAND + r} AS VARCHAR)" for r in range(ROWS_PER_BAND)]
    return f"md5(concat_ws(',', {', '.join(parts)}))"


def pairs_oracle_sql(source: str = "documents") -> str:
    """The LSH-pairs oracle over any (doc_id, text) relation — reused by
    the composed clean-corpus pipeline with a filtered source CTE."""
    return f"""
WITH sh AS (
  SELECT doc_id, {shingles_sql()} AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM {source})
), sigs AS ({_SIG_ORACLE.replace("FROM documents", f"FROM {source}")}),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {_band_hash_sql(b)} AS bucket FROM sigs" for b in range(N_BANDS))}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
         / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) AS jaccard
FROM cand c
JOIN sh a ON a.doc_id = c.doc_a
JOIN sh b ON b.doc_id = c.doc_b
WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
        / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles)))
      >= {JACCARD_THRESHOLD}
"""


_PAIRS_ORACLE = pairs_oracle_sql()


def lsh_pairs(docs: DataFrame) -> DataFrame:
    """LSH near-dup pairs over any (doc_id, text) DataFrame."""
    with_sh = _with_hashed_shingles(docs)
    sigs = with_sh.select("doc_id", *_sig_exprs_spark())

    # tiny per-doc table (4 rows/doc); persist so the bucket self-join
    # scans the corpus exactly once
    bands = sigs.select(
        "doc_id",
        F.posexplode(F.array(*[_band_hash_spark(b) for b in range(N_BANDS)])).alias(
            "band", "bucket"
        ),
    ).persist()

    cand = (
        bands.alias("a")
        .join(bands.alias("b"), ["band", "bucket"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )

    # verification: candidate-side joins back to shingle ARRAYS (no corpus
    # explode); jaccard is scan-local array math, AQE broadcasts cand
    docsh = with_sh.select("doc_id", "shingles")
    shared = F.size(F.array_intersect(F.col("sa.shingles"), F.col("sb.shingles")))
    union_n = (
        F.size(F.col("sa.shingles")) + F.size(F.col("sb.shingles")) - shared
    )
    return (
        cand.join(docsh.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(docsh.alias("sb"), F.col("doc_b") == F.col("sb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (shared.cast("double") / union_n).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
    )


@register("minhash_lsh_pairs", oracle=_PAIRS_ORACLE)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_pairs(load_table(spark, sf_dir, "documents"))
