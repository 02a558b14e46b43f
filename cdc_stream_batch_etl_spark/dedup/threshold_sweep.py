"""MinHash/LSH threshold calibration sweep — the S-curve table that
justifies a band/row configuration (Leskovec, Rajaraman & Ullman,
"Mining of Massive Datasets" §3.4; beyond-reference, SURVEY §2.11
dedup family).

minhash_lsh_pairs ships a FIXED configuration (16 hashes, 4 bands × 4
rows, τ=0.5). Before trusting it on a new corpus, a pipeline runs this
sweep: over the LSH candidate set, at every threshold t in 5%..95%,
how many candidate pairs clear t by EXACT Jaccard, how many by the
16-component signature ESTIMATE, how well the estimate agrees with the
truth (precision), and what the closed-form capture probability
1 − (1 − t^r)^b says the banding catches at similarity exactly t. Read
together, the empirical columns place the corpus's similarity mass
against the theoretical S-curve knee — the evidence for keeping or
re-banding the configuration.

Determinism (full DuckDB oracle): exact Jaccard is a ratio of shingle-
set integers; the estimate is matches/16 (an exact binary fraction);
thresholds are pct/100.0 computed by the same IEEE division in both
engines; the theory curve is PYTHON-computed literals (the _RBO_W
pattern). Counts are BIGINTs — no float accumulation anywhere.

Scale: candidate generation is the minhash.py bucket-pair plan
(band-bucket hash agg, MAX_BUCKET cap — never a corpus self-join);
scoring joins candidates back to doc-level signature/shingle arrays
(AQE broadcasts the candidate side); the sweep is a scan-local 19-way
explode of the candidate rows + one hash agg on pct. Candidate volume
is the LSH-capped set, so the sweep costs ~19× a bounded frame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from . import shingles_sql
from .minhash import (
    MAX_BUCKET,
    N_BANDS,
    N_HASHES,
    ROWS_PER_BAND,
    _band_hash_spark,
    _band_hash_sql,
    _SIG_ORACLE,
    _sig_exprs_spark,
    _with_hashed_shingles,
)

#: thresholds swept: 5%, 10%, …, 95%
PCTS = tuple(range(5, 100, 5))
#: closed-form banding capture probability at similarity exactly t:
#: 1 − (1 − t^ROWS_PER_BAND)^N_BANDS — Python literals, both engines
_THEORY = [
    1.0 - (1.0 - (p / 100.0) ** ROWS_PER_BAND) ** N_BANDS for p in PCTS
]
#: quoted-string casts: a bare decimal literal would parse as DECIMAL
#: (≤18 significant digits) before the cast and lose the last bits of
#: a 17-digit repr; string→DOUBLE parsing is correctly rounded
_THEORY_SQL = "[" + ", ".join(f"CAST('{v!r}' AS DOUBLE)" for v in _THEORY) + "]"

_SWEEP_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, {shingles_sql()} AS shingles
  FROM (SELECT doc_id, string_split(text, ' ') AS words FROM documents)
),
sigs AS ({_SIG_ORACLE}),
sigarr AS (
  SELECT doc_id,
         [{", ".join(f"sig_{i}" for i in range(N_HASHES))}] AS sig
  FROM sigs
),
bands AS (
  {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, {_band_hash_sql(b)} AS bucket FROM sigs" for b in range(N_BANDS))}
),
capped AS (
  SELECT doc_id, band, bucket FROM (
    SELECT doc_id, band, bucket,
           COUNT(*) OVER (PARTITION BY band, bucket) AS bsz
    FROM bands
  ) WHERE bsz <= {MAX_BUCKET}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM capped a JOIN capped b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
),
scored AS (
  SELECT c.doc_a, c.doc_b,
         CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
           / (len(a.shingles) + len(b.shingles)
              - len(list_intersect(a.shingles, b.shingles))) AS exact_j,
         len([i for i in generate_series(1, {N_HASHES})
              if sa.sig[i] = sb.sig[i]]) / {N_HASHES}.0 AS est_j
  FROM cand c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b
  JOIN sigarr sa ON sa.doc_id = c.doc_a
  JOIN sigarr sb ON sb.doc_id = c.doc_b
),
grid AS (SELECT unnest(generate_series(5, 95, 5)) AS pct)
SELECT CAST(g.pct AS BIGINT) AS threshold_pct,
       g.pct / 100.0e0 AS threshold,
       CAST(count(*) AS BIGINT) AS n_candidates,
       CAST(count(*) FILTER (WHERE s.exact_j >= g.pct / 100.0e0) AS BIGINT)
         AS n_exact_ge,
       CAST(count(*) FILTER (WHERE s.est_j >= g.pct / 100.0e0) AS BIGINT)
         AS n_est_ge,
       CAST(count(*) FILTER (WHERE s.est_j >= g.pct / 100.0e0
                               AND s.exact_j >= g.pct / 100.0e0) AS BIGINT)
         AS n_agree_ge,
       CASE WHEN count(*) FILTER (WHERE s.est_j >= g.pct / 100.0e0) = 0
            THEN NULL
            ELSE CAST(count(*) FILTER (WHERE s.est_j >= g.pct / 100.0e0
                                         AND s.exact_j >= g.pct / 100.0e0)
                      AS DOUBLE)
                 / count(*) FILTER (WHERE s.est_j >= g.pct / 100.0e0)
       END AS est_precision,
       ({_THEORY_SQL})[g.pct // 5] AS capture_theory
FROM scored s CROSS JOIN grid g
GROUP BY g.pct
ORDER BY threshold_pct
"""


def candidate_scores(docs: DataFrame) -> DataFrame:
    """(doc_a, doc_b, exact_j, est_j) over the LSH candidate set — the
    unthresholded core minhash_lsh_pairs filters at τ."""
    with_sh = _with_hashed_shingles(docs)
    sigs = with_sh.select("doc_id", "shingles", *_sig_exprs_spark())
    # persisted: the doc-level feature frame (shingle array + 16-wide
    # signature + band hashes) feeds THREE consumers — the bucket table
    # and both candidate sides — and each unpersisted reference re-runs
    # the md5-per-shingle scan, the CPU-dominant step (3 corpus scans in
    # the plan). The cache is corpus-proportional; MEMORY_AND_DISK
    # spill still beats re-hashing every shingle twice more at 100 TB.
    # Caller-must-clear contract as elsewhere (vocab.py).
    feat = sigs.select(
        "doc_id",
        "shingles",
        F.array(*[F.col(f"sig_{i}") for i in range(N_HASHES)]).alias("sig"),
        F.array(*[_band_hash_spark(b) for b in range(N_BANDS)]).alias("bhs"),
    ).persist()
    buckets = (
        feat.select("doc_id", F.posexplode("bhs").alias("band", "bucket"))
        .groupBy("band", "bucket")
        .agg(F.array_sort(F.collect_list("doc_id")).alias("ids"))
        .filter((F.size("ids") >= 2) & (F.size("ids") <= MAX_BUCKET))
    )
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
    docfeat = feat.select("doc_id", "shingles", "sig")
    shared = F.size(F.array_intersect(F.col("fa.shingles"), F.col("fb.shingles")))
    union_n = (
        F.size(F.col("fa.shingles")) + F.size(F.col("fb.shingles")) - shared
    )
    matches = F.expr(
        f"size(filter(sequence(1, {N_HASHES}), i -> "
        "element_at(fa.sig, i) = element_at(fb.sig, i)))"
    )
    return (
        cand.join(docfeat.alias("fa"), F.col("doc_a") == F.col("fa.doc_id"))
        .join(docfeat.alias("fb"), F.col("doc_b") == F.col("fb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            (shared.cast("double") / union_n).alias("exact_j"),
            (matches / F.lit(float(N_HASHES))).alias("est_j"),
        )
    )


@register("minhash_threshold_sweep", oracle=_SWEEP_ORACLE)
def minhash_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per threshold 5%..95%: LSH candidate counts clearing it by exact
    Jaccard and by the signature estimate, estimate precision, and the
    closed-form banding capture probability — the calibration table for
    the 4×4 banding."""
    docs = load_table(spark, sf_dir, "documents")
    scored = candidate_scores(docs)
    theory = F.array(*[F.lit(v) for v in _THEORY])
    swept = scored.select(
        "exact_j",
        "est_j",
        F.explode(F.array(*[F.lit(p) for p in PCTS])).alias("pct"),
    )
    thr = F.col("pct") / F.lit(100.0)
    exact_ge = F.count(F.when(F.col("exact_j") >= thr, 1))
    est_ge = F.count(F.when(F.col("est_j") >= thr, 1))
    agree_ge = F.count(
        F.when((F.col("est_j") >= thr) & (F.col("exact_j") >= thr), 1)
    )
    return (
        swept.groupBy("pct")
        .agg(
            F.count("*").cast("bigint").alias("n_candidates"),
            exact_ge.cast("bigint").alias("n_exact_ge"),
            est_ge.cast("bigint").alias("n_est_ge"),
            agree_ge.cast("bigint").alias("n_agree_ge"),
            F.when(est_ge == 0, F.lit(None).cast("double"))
            .otherwise(agree_ge.cast("double") / est_ge)
            .alias("est_precision"),
        )
        .select(
            F.col("pct").cast("bigint").alias("threshold_pct"),
            (F.col("pct") / F.lit(100.0)).alias("threshold"),
            "n_candidates",
            "n_exact_ge",
            "n_est_ge",
            "n_agree_ge",
            "est_precision",
            F.element_at(theory, (F.col("pct") / 5).cast("int")).alias(
                "capture_theory"
            ),
        )
        .orderBy("threshold_pct")
    )
