"""SimHash fingerprinting + pigeonhole near-duplicate pairs.

32-bit SimHash over word tokens weighted by term frequency: bit j is set
iff sum over tokens of (tf * (+1 if bit j of md5-hash(token) else -1)) > 0.
Near-dup candidates via the pigeonhole principle: hamming(a,b) <= 3 implies
at least one of 4 byte-segments equal — an equi-join per segment instead of
an all-pairs scan (the 100 TB-safe plan), then exact hamming verification
with xor+bit_count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from . import hash64_expr, hash64_sql

N_BITS = 32
N_SEGMENTS = 4
HAMMING_MAX = 3

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
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count("*").alias("cnt"))
        .withColumn("h", F.expr(hash64_expr("token")))
    )
    bits = (
        tf.select("doc_id", "cnt", "h", F.explode(F.sequence(F.lit(0), F.lit(N_BITS - 1))).alias("j"))
        .groupBy("doc_id", "j")
        .agg(
            F.sum(
                F.when(F.expr("((h >> j) & 1) = 1"), F.col("cnt")).otherwise(-F.col("cnt"))
            ).alias("bal")
        )
    )
    return bits.groupBy("doc_id").agg(
        F.sum(F.when(F.col("bal") > 0, F.expr("shiftleft(1L, j)")).otherwise(F.lit(0)))
        .cast("bigint")
        .alias("simhash")
    )


def _seg_sql(h: str, s: int) -> str:
    return f"(({h} >> {8 * s}) & 255)"


_PAIRS_ORACLE = f"""
WITH fp AS ({_FP_ORACLE}),
segs AS (
  {" UNION ALL ".join(f"SELECT doc_id, simhash, {s} AS seg, {_seg_sql('simhash', s)} AS seg_val FROM fp" for s in range(N_SEGMENTS))}
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
