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
- candidate generation is ONE ``groupBy(band, bucket)`` shuffle of the
  tiny band table (4 rows × ~50 bytes per doc) followed by in-bucket pair
  explosion — no band-table self-join. The shared (doc_id, shingles)
  frame IS eagerly materialized (``shingled_docs`` localCheckpoint —
  three consumers, race-safe fill; r12); note the checkpoint blocks are
  ContextCleaner/GC-managed, not released by ``clearCache()``, and at
  real cluster scale a reliable checkpoint / DISK_ONLY persist should
  replace the executor-local one (see functions/materialize.py). Pair
  explosion is bounded by the bucket cap below.
- MAX_BUCKET caps bucket size (standard production LSH): a degenerate
  bucket (boilerplate/templated corpora hashing identically) would make
  candidate generation quadratic in that bucket, so buckets larger than
  MAX_BUCKET are dropped entirely — in both the Spark plan and the DuckDB
  oracle, keeping the comparison hash-exact. ``lsh_bucket_stats`` reports
  the dropped mass so the cap is observable, not silent.
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
from ..functions.materialize import materialize
from ..functions.parallelism import fan_out
from ..registry import register
from . import hash64_expr, hash64_sql, shingles_col, shingles_sql
from .ngram import JACCARD_THRESHOLD

N_HASHES = 16
N_BANDS = 4
ROWS_PER_BAND = N_HASHES // N_BANDS
# Buckets larger than this are dropped from candidate generation (both in
# Spark and in the oracle). 64 is far above any honest near-dup cluster at
# sf0.1 (nothing is dropped on the test corpora) while bounding the
# worst-case per-bucket pair count at C(64,2)=2016 on adversarial corpora.
MAX_BUCKET = 64
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
    # fan_out: shingle hashing is the CPU-dominant scan-local step; widen
    # single-row-group inputs so it parallelizes (no-op on wide scans)
    return fan_out(docs).withColumn("shingles", shingles_col()).withColumn(
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
    the composed clean-corpus pipeline with a filtered source CTE.

    Mirrors the Spark plan's MAX_BUCKET cap: buckets larger than
    MAX_BUCKET contribute no candidates on either side."""
    return f"""
WITH sh AS (
  SELECT doc_id, {shingles_sql()} AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM {source})
), sigs AS ({_SIG_ORACLE.replace("FROM documents", f"FROM {source}")}),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {_band_hash_sql(b)} AS bucket FROM sigs" for b in range(N_BANDS))}
), capped AS (
  SELECT doc_id, band, bucket
  FROM (
    SELECT doc_id, band, bucket,
           COUNT(*) OVER (PARTITION BY band, bucket) AS bsz
    FROM bands
  )
  WHERE bsz <= {MAX_BUCKET}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b ON a.band = b.band AND a.bucket = b.bucket
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


def _bands(docs: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) — 4 rows per doc, computed scan-local."""
    sigs = _with_hashed_shingles(docs).select("doc_id", *_sig_exprs_spark())
    return sigs.select(
        "doc_id",
        F.posexplode(F.array(*[_band_hash_spark(b) for b in range(N_BANDS)])).alias(
            "band", "bucket"
        ),
    )


def shingled_docs(docs: DataFrame, hashed: bool = False) -> DataFrame:
    """(doc_id, shingles[, hshingles]), fanned out and EAGERLY
    materialized — the shared corpus-shingling base of the LSH family.

    EAGER lineage break: the shingle frame feeds THREE consumers inside
    lsh_pairs (the band table and BOTH sides of the verification join)
    and shingling is the CPU-dominant scan-local step; uncached it re-ran
    per consumer (r12: 3 evaluations -> 1). Eager (not lazy persist)
    because a composed consumer (lsh_recall_eval's full-outer join) runs
    this subtree's stages CONCURRENTLY from two legs — a lazy cache then
    race-fills from both and the measured tail is bimodal (3.9 s vs
    41 s); materializing before any consumer stage launches removes the
    race. r13: split out so lsh_recall_eval's exact-truth leg
    (dedup/ngram.py) shares this one materialization instead of filling
    a second shingle checkpoint of its own.

    ``hashed`` MUST stay True for the LSH path: with ``hshingles`` a
    materialized column, the per-shingle md5 runs exactly once in the
    checkpoint fill; as a lazy projection the optimizer inlines the
    ``transform(shingles, md5(...))`` into each of the 16 signature
    expressions that reference it and the hashing runs 16x (measured
    minhash_lsh_pairs 1.9 s -> 5.0 s / dedup_ledger 3.4 s -> 11 s solo
    before this was caught — the ngram_fold_sql CollapseProject lesson).

    Checkpoint lifetime note (ADVICE r12): localCheckpoint blocks are
    NOT released by spark.catalog.clearCache(); they are freed by
    ContextCleaner when the DataFrame is GC'd. Construction also runs
    Spark jobs eagerly — plan-only tooling pays the shingling pass."""
    base = fan_out(docs).withColumn("shingles", shingles_col())
    cols = ["doc_id", "shingles"]
    if hashed:
        base = base.withColumn(
            "hshingles", F.expr(f"transform(shingles, s -> {_H_SPARK})")
        )
        cols.append("hshingles")
    return materialize(base.select(*cols), eager=True)


def lsh_pairs(docs: DataFrame, max_bucket: int = MAX_BUCKET) -> DataFrame:
    """LSH near-dup pairs over any (doc_id, text) DataFrame.

    Candidate generation is one groupBy(band, bucket) shuffle of the tiny
    band table followed by in-bucket pair explosion — no self-join, no
    persist. Buckets larger than ``max_bucket`` are dropped (degenerate-
    bucket guard; the oracle applies the identical cap), so per-bucket
    work is bounded at C(max_bucket, 2) pairs regardless of corpus shape.
    """
    return lsh_pairs_from_shingled(shingled_docs(docs, hashed=True), max_bucket)


def lsh_pairs_from_shingled(
    with_sh: DataFrame, max_bucket: int = MAX_BUCKET
) -> DataFrame:
    """lsh_pairs over a pre-materialized (doc_id, shingles, hshingles)
    frame (shingled_docs(hashed=True)) — split out so composed consumers
    (lsh_recall_eval) can feed BOTH their legs from one shingle
    materialization."""
    sigs = with_sh.select("doc_id", *_sig_exprs_spark())
    bands = sigs.select(
        "doc_id",
        F.posexplode(F.array(*[_band_hash_spark(b) for b in range(N_BANDS)])).alias(
            "band", "bucket"
        ),
    )
    buckets = (
        bands
        .groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= max_bucket))
    )
    # ids is sorted, so emitting (ids[i], ids[j]) for j > i gives
    # doc_a < doc_b directly; arrays are capped, so the HOF runs over at
    # most max_bucket elements per bucket
    cand = (
        buckets.select(
            F.explode(
                F.expr(
                    "flatten(transform(ids, (x, i) -> "
                    "transform(slice(ids, i + 2, size(ids)), "
                    "y -> struct(x AS doc_a, y AS doc_b))))"
                )
            ).alias("p")
        )
        .select("p.doc_a", "p.doc_b")
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


_STATS_ORACLE = f"""
WITH sigs AS ({_SIG_ORACLE}),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {_band_hash_sql(b)} AS bucket FROM sigs" for b in range(N_BANDS))}
), bsizes AS (
  SELECT band, bucket, COUNT(*) AS bsz FROM bands GROUP BY band, bucket
)
SELECT band,
       COUNT(*) AS n_buckets,
       CAST(SUM(bsz) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN bsz > {MAX_BUCKET} THEN bsz ELSE 0 END) AS BIGINT) AS n_docs_dropped,
       MAX(bsz) AS max_bucket_size
FROM bsizes
GROUP BY band
"""


@register("lsh_bucket_stats", oracle=_STATS_ORACLE)
def lsh_bucket_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band bucket-size distribution + the doc mass the MAX_BUCKET cap
    drops — makes the degenerate-bucket guard observable instead of silent
    (a production LSH must report dropped mass, not swallow it)."""
    docs = load_table(spark, sf_dir, "documents")
    bsz = _bands(docs).groupBy("band", "bucket").agg(F.count("*").alias("bsz"))
    return bsz.groupBy("band").agg(
        F.count("*").alias("n_buckets"),
        F.sum("bsz").alias("n_docs"),
        F.sum(F.when(F.col("bsz") > MAX_BUCKET, F.col("bsz")).otherwise(F.lit(0))).alias(
            "n_docs_dropped"
        ),
        F.max("bsz").alias("max_bucket_size"),
    )
