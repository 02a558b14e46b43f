"""Embedding-cosine near-duplicate detection over the embeddings table.

Completes the dedup family (exact / prefix / n-gram / MinHash / SimHash /
embedding-cosine): pairs of vectors whose cosine similarity crosses a
threshold.

Two paths, both DuckDB-oracled (the oracle mirrors the SAME deterministic
computation, so even the approximate path hash-matches):

- ``embed_near_dup_pairs`` — exact threshold self-join: the correctness
  baseline. O(N²) dot products; fine for a bounded re-rank set, NOT the
  100 TB path.
- ``embed_near_dup_lsh`` — sign-random-projection bucketing (shared
  hyperplane family with similarity.ann): vectors only compare within the
  same 8-bit hyperplane signature bucket or a radius-1 probe, then exact
  cosine verification of candidates. Candidate volume ~9/256 of the full
  cross product; the bucket join shuffles on a 1-byte key. This is the
  plan that survives 100× scale — the exact variant exists to measure its
  recall (tests/test_similarity.py).

Threshold note: the synthetic embeddings are isotropic (max pairwise
cosine ≈ 0.51 at sf0.01), so the threshold is 0.40 to exercise the
operator; a real near-dup corpus would use ~0.95, where hyperplane LSH
recall is far higher (bit-agreement p = 1 - θ/π ≈ 0.90 per plane).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from ..similarity.ann import N_PLANES, _dot, _hyperplanes, _signature

COSINE_THRESHOLD = 0.40
#: signature-bucket cap (the minhash.MAX_BUCKET / simhash.MAX_SEG_BUCKET
#: treatment): 8-bit signatures give only 256 buckets, so bucket size
#: grows ~N/256 and the candidate join is Θ(N²/256) — constant-factor,
#: not asymptotic, relief (the ×64 probe ran >25 min before this cap).
#: Buckets larger than the cap are dropped identically in Spark and the
#: oracle; the probed-variant recall gates live in tests/test_similarity.
#: At real scale: more planes (16-32 bits) and banded signatures first,
#: then the cap as the final guard against degenerate clusters.
MAX_SIG_BUCKET = 256

_COS = (
    "list_dot_product(a.emb, b.emb) / "
    "(sqrt(list_dot_product(a.emb, a.emb)) * sqrt(list_dot_product(b.emb, b.emb)))"
)

_EXACT_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, round({_COS}, 6) AS cos_sim_r
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE {_COS} >= {COSINE_THRESHOLD}
"""


#: A-side sub-block rows per matmul block — bounds the accumulator at
#: BLOCK×N doubles per task (256×N: ~40 MB even at N=20k), independent of
#: the Arrow batch size.
_PAIR_BLOCK = 256


def _fold_dot_blocks(A, B):
    """Pairwise dot products with EXACTLY Spark's fold arithmetic.

    Spark's ``aggregate(zip_with(a, b, (x,y) -> x*y), 0.0D, (acc,v) -> acc+v)``
    is a sequential left fold in index order: acc = ((a0*b0) + a1*b1) + ….
    ``acc += A[:,k] * B[:,k]`` over k replicates that ordering per pair with
    plain IEEE-double multiply/add ufuncs (no FMA, no pairwise-tree
    summation — numpy reductions like ``dot``/``einsum``/``sum`` would NOT
    be bit-stable against the fold, which is why they are not used here).
    """
    import numpy as np

    acc = np.zeros((A.shape[0], B.shape[0]))
    for k in range(A.shape[1]):
        acc += A[:, k, None] * B[None, :, k]
    return acc


@register("embed_near_dup_pairs", oracle=_EXACT_ORACLE)
def embed_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine-threshold pairs (quadratic correctness baseline).

    Optimization-round shape (guide §4.2/§8): the O(N²) pair stage used to
    be a BroadcastNestedLoopJoin evaluating one interpreted higher-order
    ``aggregate(zip_with(...))`` fold PER PAIR — 20.6 s at sf0.1 (N=2000:
    2M pairs × 64 interpreted lambda steps), the most expensive query in
    the bench. Now a zero-shuffle mapInPandas: only ``vec_id`` crosses the
    Python boundary (guide §4.1 — ship the proxy, not the payload); each
    task side-loads the embedding matrix once from the parquet input
    (guide §8 "co-locate instead of join" — the corpus is the
    broadcast-sized side, O(N·dim) bytes) and computes its block of the
    pair matrix in numpy with the fold-exact arithmetic of
    ``_fold_dot_blocks`` — bit-identical to the old plan, so the oracle
    hash is unchanged (verified old-vs-new exact-equal, and vs the oracle
    via driver_sim). The HALF_UP rounding stays in Spark (``F.round``;
    Python ``round`` is banker's). Scale posture unchanged: this is the
    DECLARED quadratic recall yardstick for ``embed_near_dup_lsh``; the
    rewrite changes the constant (interpreted lambda → native vectorized),
    not the asymptote.

    Side-load read multiplier (r12 verdict note): EVERY task re-reads the
    whole embeddings parquet, so the file is read n_parts times per run
    (32× on local[32]) — O(N·dim) bytes per task × n_parts tasks, the
    same order the old plan shipped as its broadcast side, but now as
    storage reads instead of one driver-mediated broadcast. Fine while
    the matrix is broadcast-sized (~1 MB at sf0.1); at a scale where
    N·dim stops being broadcast-sized this whole query is the wrong tool
    (that is what the LSH path is for)."""
    emb = load_table(spark, sf_dir, "embeddings")
    path = f"{sf_dir}/embeddings.parquet"
    n_parts = spark.sparkContext.defaultParallelism

    def _pairs(batches):
        import numpy as np
        import pandas as pd
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["vec_id", "embedding"])
        ids = t.column("vec_id").to_numpy()
        # flat values buffer → (N, dim) without a per-row Python list pass
        # (fresh-read list array: contiguous offsets, no nulls)
        col = t.column("embedding").combine_chunks()
        M = (
            col.values.to_numpy(zero_copy_only=False)
            .astype(np.float64)
            .reshape(len(col), -1)
        )
        order = np.argsort(ids)
        ids, M = ids[order], M[order]
        # per-vector norms via the same fold (vectorized over rows)
        acc = np.zeros(M.shape[0])
        for k in range(M.shape[1]):
            acc += M[:, k] * M[:, k]
        nrm = np.sqrt(acc)
        for pdf in batches:
            rows = np.searchsorted(ids, pdf["vec_id"].to_numpy())
            for s in range(0, len(rows), _PAIR_BLOCK):
                blk = rows[s : s + _PAIR_BLOCK]
                cos = _fold_dot_blocks(M[blk], M) / (
                    nrm[blk][:, None] * nrm[None, :]
                )
                ai, bj = np.nonzero(
                    (cos >= COSINE_THRESHOLD) & (ids[blk][:, None] < ids[None, :])
                )
                if len(ai):
                    yield pd.DataFrame(
                        {
                            "vec_a": ids[blk][ai],
                            "vec_b": ids[bj],
                            "cos_sim": cos[ai, bj],
                        }
                    )

    pairs = (
        emb.select("vec_id")
        .repartition(n_parts)
        .mapInPandas(_pairs, "vec_a bigint, vec_b bigint, cos_sim double")
    )
    return pairs.select("vec_a", "vec_b", F.round("cos_sim", 6).alias("cos_sim_r"))


_PLANE_ARRS = ["[" + ",".join(f"{v}" for v in row) + "]" for row in _hyperplanes()]
_SIG_SQL = " + ".join(
    f"(CASE WHEN list_dot_product(emb, {arr}) > 0 THEN {1 << p} ELSE 0 END)"
    for p, arr in enumerate(_PLANE_ARRS)
)

_LSH_ORACLE = f"""
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
), sigged AS (
  SELECT vec_id, emb, CAST({_SIG_SQL} AS INTEGER) AS sig FROM e
), capped AS (
  SELECT vec_id, emb, sig FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY sig) AS bsz FROM sigged
  ) WHERE bsz <= {MAX_SIG_BUCKET}
), probes AS (
  SELECT vec_id, emb, xor(sig, flip) AS sig
  FROM sigged, (SELECT unnest([0{"".join(f", {1 << b}" for b in range(N_PLANES))}]) AS flip)
), cand AS (
  SELECT DISTINCT p.vec_id AS va, s.vec_id AS vb
  FROM probes p JOIN capped s ON p.sig = s.sig AND p.vec_id < s.vec_id
)
SELECT c.va AS vec_a, c.vb AS vec_b, round({_COS}, 6) AS cos_sim_r
FROM cand c
JOIN e a ON a.vec_id = c.va
JOIN e b ON b.vec_id = c.vb
WHERE {_COS} >= {COSINE_THRESHOLD}
"""


@register("embed_near_dup_lsh", oracle=_LSH_ORACLE)
def embed_near_dup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-bucketed near-dup pairs: radius-1 signature probing +
    exact cosine verification of candidates only (the 100 TB plan)."""
    emb = load_table(spark, sf_dir, "embeddings")
    base = (
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("emb"))
        .withColumn("sig", _signature("emb"))
        .withColumn("nrm", F.sqrt(_dot("emb", "emb")))
    )

    probes = base.select(
        "vec_id",
        "emb",
        F.explode(
            F.array(F.col("sig"), *[F.expr(f"int(sig ^ {1 << b})") for b in range(N_PLANES)])
        ).alias("sig"),
    )
    # MAX_SIG_BUCKET cap on the BUILD side only (mirrored in the
    # oracle): with |probes| = 9N total, candidates are bounded by
    # 9·cap·N — linear in N — while probes from vectors inside an
    # over-cap bucket still reach their radius-1 neighbors
    capped = (
        base.withColumn("bsz", F.count("*").over(Window.partitionBy("sig")))
        .filter(F.col("bsz") <= MAX_SIG_BUCKET)
        .drop("bsz")
    )
    cand = (
        probes.alias("p")
        .join(capped.alias("s"), "sig")
        .filter(F.col("p.vec_id") < F.col("s.vec_id"))
        .select(F.col("p.vec_id").alias("va"), F.col("s.vec_id").alias("vb"))
        .distinct()
    )
    e = base.select("vec_id", "emb", "nrm")
    cos = _dot("a.emb", "b.emb") / (F.col("a.nrm") * F.col("b.nrm"))
    return (
        cand.join(e.alias("a"), F.col("va") == F.col("a.vec_id"))
        .join(e.alias("b"), F.col("vb") == F.col("b.vec_id"))
        .withColumn("cos_sim", cos)
        .filter(F.col("cos_sim") >= COSINE_THRESHOLD)
        .select(
            F.col("va").alias("vec_a"),
            F.col("vb").alias("vec_b"),
            F.round("cos_sim", 6).alias("cos_sim_r"),
        )
    )
