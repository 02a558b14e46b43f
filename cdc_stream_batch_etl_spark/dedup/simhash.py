"""SimHash fingerprinting + pigeonhole near-duplicate pairs.

32-bit SimHash over word tokens weighted by term frequency: bit j is set
iff sum over tokens of (tf * (+1 if bit j of md5-hash(token) else -1)) > 0.
Near-dup candidates via the pigeonhole principle: hamming(a,b) <= 3 implies
at least one of 4 byte-segments equal — an equi-join per segment instead of
an all-pairs scan (the 100 TB-safe plan), then exact hamming verification
with xor+bit_count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from . import hash64_expr, hash64_sql

N_BITS = 32
N_SEGMENTS = 4
HAMMING_MAX = 3
#: pigeonhole-bucket cap, the minhash.MAX_BUCKET treatment: a (segment,
#: value) bucket of k docs yields k²/2 candidates, and byte segments
#: give only 4×256 buckets, so a templated corpus degenerates the
#: segment join to all-pairs (the ×64 probe measured exponent 1.13 —
#: 144 s — before the cap; 0.67-class after, matching minhash). Buckets
#: larger than this are dropped IDENTICALLY in Spark and the oracle;
#: at real scale widen the fingerprint (64/128-bit, 16-bit segments)
#: before raising the cap.
MAX_SEG_BUCKET = 64

_FP_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS cnt, {hash64_sql("token")} AS h
  FROM tok GROUP BY 1, 2
), bits AS (
  SELECT doc_id, j,
         sum(CASE WHEN ((h >> j) & 1) = 1 THEN cnt ELSE -cnt END) AS bal
  FROM tf, (SELECT unnest(range({N_BITS})) AS j)
  GROUP BY 1, 2
)
SELECT doc_id,
       CAST(sum(CASE WHEN bal > 0 THEN (1::BIGINT << j) ELSE 0 END) AS BIGINT) AS simhash
FROM bits GROUP BY 1
"""


@register("simhash_fingerprints", oracle=_FP_ORACLE)
def simhash_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One groupBy(doc_id) with 32 conditional-sum aggregate EXPRESSIONS
    instead of a 32× bit-explode: the explode spelling pushed 32 rows
    per (doc, token) through the exchange — the ×64 probe priced that
    at ~2 s per 6 k docs; 32 column aggregates over the un-inflated tf
    table do the identical arithmetic map-side (the oracle keeps the
    explode spelling, which is fine at oracle scale)."""
    docs = load_table(spark, sf_dir, "documents")
    # NOTE r12: fan_out(docs) was tried here and REVERTED — A/B-measured
    # 1.65 s -> 2.58 s warm: the md5 hashing runs AFTER the (doc, token)
    # shuffle (already cluster-wide), so the repartition only added a
    # full-text shuffle in front of a cheap tokenize.
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", F.expr(hash64_expr("token")))
    )
    bals = [
        F.sum(
            F.when(F.expr(f"((h >> {j}) & 1) = 1"), F.col("cnt")).otherwise(
                -F.col("cnt")
            )
        ).alias(f"b{j}")
        for j in range(N_BITS)
    ]
    per_doc = tf.groupBy("doc_id").agg(*bals)
    sh = None
    for j in range(N_BITS):
        term = F.when(F.col(f"b{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0))
        sh = term if sh is None else sh + term
    return per_doc.select("doc_id", sh.cast("bigint").alias("simhash"))


def _seg_sql(h: str, s: int) -> str:
    return f"(({h} >> {8 * s}) & 255)"


_PAIRS_ORACLE = f"""
WITH fp AS ({_FP_ORACLE}),
segs_all AS (
  {" UNION ALL ".join(f"SELECT doc_id, simhash, {s} AS seg, {_seg_sql('simhash', s)} AS seg_val FROM fp" for s in range(N_SEGMENTS))}
), segs AS (
  SELECT doc_id, simhash, seg, seg_val FROM (
    SELECT *, COUNT(*) OVER (PARTITION BY seg, seg_val) AS bsz FROM segs_all
  ) WHERE bsz <= {MAX_SEG_BUCKET}
), cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         a.simhash AS sh_a, b.simhash AS sh_b
  FROM segs a JOIN segs b ON a.seg = b.seg AND a.seg_val = b.seg_val
  WHERE a.doc_id < b.doc_id
)
SELECT doc_a, doc_b,
       CAST(bit_count(xor(sh_a, sh_b)) AS INTEGER) AS hamming
FROM cand
WHERE bit_count(xor(sh_a, sh_b)) <= {HAMMING_MAX}
"""


@register("simhash_near_pairs", oracle=_PAIRS_ORACLE)
def simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persist the tiny (doc_id, simhash) table: the segment self-join
    # references it twice, and without the persist the 3-shuffle
    # fingerprint aggregation runs twice over the corpus. (A fully
    # scan-local fingerprint via nested higher-order functions was
    # measured 12x SLOWER — HOFs are interpreted, not codegen'd — so the
    # relational spelling + persist is the winning shape.)
    fp = simhash_fingerprints(spark, sf_dir).persist()
    # one pass via posexplode — a 4-way union would rescan fp per segment
    segs = fp.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(*[F.expr(_seg_sql("simhash", s)) for s in range(N_SEGMENTS)])
        ).alias("seg", "seg_val"),
    )
    # MAX_SEG_BUCKET cap (mirrored in the oracle): drop degenerate
    # buckets before the self-join so candidate generation stays
    # k²-bounded per bucket, not corpus-quadratic
    bsz = Window.partitionBy("seg", "seg_val")
    segs = (
        segs.withColumn("bsz", F.count("*").over(bsz))
        .filter(F.col("bsz") <= MAX_SEG_BUCKET)
        .drop("bsz")
    )
    cand = (
        segs.alias("a")
        .join(segs.alias("b"), ["seg", "seg_val"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    hamming = F.bit_count(F.expr("sh_a ^ sh_b"))
    return (
        cand.select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
        .filter(F.col("hamming") <= HAMMING_MAX)
    )
