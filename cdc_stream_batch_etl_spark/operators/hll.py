"""Deterministic HyperLogLog — the register sketch itself, exactly
reproducible cross-engine (Flajolet et al., AofA 2007; completes the
cardinality-sketch pair next to KMV in operators/sketches.py).

`approx_distinct_native` exposes Spark's HLL++ but its registers are
engine-internal, so the driver can only rows-check it (registry.
ROWS_ONLY). This operator builds HLL from the repo's md5-derived
60-bit hashes (dedup.hash64_expr ≡ hash64_sql bit-for-bit), so every
register value AND the raw estimate hash-match a DuckDB oracle — the
sketches.py determinism trick applied to the harder sketch. Per
event_type: bucket = top p=9 hash bits (m=512 registers), rho = count
of leading zeros in the remaining 51 bits + 1, register = max rho;
raw estimate E = α_m·m²/Σ_j 2^(−M_j).

Engine-portable spellings that keep it exact:
- rho needs the MSB position of a 51-bit integer: floor(log2(w)) via
  floating log2 can misround at powers of two, so both engines use
  length(bin(w)) — an integer string length, never a float.
- 2^(−M) terms come from a 53-entry literal array of exact binary
  fractions (Python-generated, embedded in both plans) — no pow().
- Σ_j folds register terms in BUCKET order via the sorted-fold idiom;
  the 512−used empty registers contribute exactly (m − used)·1.0 in
  one closed-form add.
- α_512 is a Python double literal shared by both engines.

The raw estimate is reported WITHOUT the small-range linear-counting
correction (it needs ln(), the not-correctly-rounded op the engine
bans — text/lm.py rule); `empty_registers` (the V of linear counting)
is exported so a consumer can apply it, and n_distinct_exact rides
along as the audit column (the KMV convention). At sf0.01's ~150
distinct users/type the raw estimate is biased exactly as Flajolet
§4 predicts — the sf0.1 pytest checks the ≤5%-class accuracy where
raw HLL is in its operating range (n > 2.5m).

Scale: one events scan → (type, bucket) hash agg (max rho, map-side
partials; ≤ |types|·512 rows out) → |types| sorted-fold agg, plus one
exact-distinct audit agg on the same scan. The sketch is mergeable by
construction (max per register): the streaming twin is a max-monoid
applyInPandasWithState away, same math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..dedup import hash64_expr, hash64_sql
from ..registry import register

HLL_P = 9
HLL_M = 1 << HLL_P  # 512 registers
#: hash64 is 60 bits: top 9 choose the register, the low 51 carry rho
_W_BITS = 60 - HLL_P
ALPHA_M = 0.7213 / (1 + 1.079 / HLL_M)  # Flajolet's α_m for m ≥ 128

#: 2^-M for M in 0..52 — exact binary fractions, literal in both engines
_POW2_NEG = [2.0**-i for i in range(_W_BITS + 2)]
_POW2_NEG_SQL = "[" + ", ".join(repr(x) for x in _POW2_NEG) + "]"

_HLL_ORACLE = f"""
WITH h AS (
  SELECT event_type, {hash64_sql("CAST(user_id AS VARCHAR)")} AS hv
  FROM events
),
parts AS (
  SELECT event_type,
         hv // {1 << _W_BITS} AS bucket,
         hv % {1 << _W_BITS} AS w
  FROM h
),
regs AS (
  SELECT event_type, bucket,
         max(CASE WHEN w = 0 THEN {_W_BITS + 1}
                  ELSE {_W_BITS + 1} - length(bin(w)) END) AS m_j
  FROM parts GROUP BY event_type, bucket
),
folded AS (
  SELECT event_type,
         CAST(count(*) AS BIGINT) AS registers_used,
         CAST(max(m_j) AS BIGINT) AS max_rho,
         list_reduce(
           list(list_extract({_POW2_NEG_SQL}, CAST(m_j AS INTEGER) + 1)
                ORDER BY bucket),
           (a, b) -> a + b) AS used_sum
  FROM regs GROUP BY event_type
),
exact AS (
  SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_distinct_exact
  FROM events GROUP BY event_type
)
SELECT f.event_type, f.registers_used,
       {HLL_M} - f.registers_used AS empty_registers,
       f.max_rho,
       CAST({ALPHA_M!r} AS DOUBLE) * CAST({HLL_M} AS DOUBLE) * CAST({HLL_M} AS DOUBLE)
         / (f.used_sum + ({HLL_M} - f.registers_used) * CAST(1.0 AS DOUBLE)) AS raw_estimate,
       e.n_distinct_exact
FROM folded f JOIN exact e USING (event_type)
ORDER BY event_type
"""


@register("hll_distinct_by_type", oracle=_HLL_ORACLE)
def hll_distinct_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(event_type, registers_used, empty_registers, max_rho,
    raw_estimate, n_distinct_exact) — the md5-deterministic HLL
    register sketch and its raw cardinality estimate per type."""
    ev = load_table(spark, sf_dir, "events")
    h = ev.select(
        "event_type",
        F.expr(hash64_expr("cast(user_id as string)")).alias("hv"),
    )
    # integer div/mod — hv has 60 bits, beyond double's exact range, so
    # a float division here would corrupt the bucket split
    parts = h.select(
        "event_type",
        F.expr(f"hv div {1 << _W_BITS}").alias("bucket"),
        F.expr(f"hv % {1 << _W_BITS}").alias("w"),
    )
    rho = F.when(F.col("w") == 0, F.lit(_W_BITS + 1)).otherwise(
        F.lit(_W_BITS + 1) - F.length(F.bin(F.col("w")))
    )
    regs = parts.groupBy("event_type", "bucket").agg(F.max(rho).alias("m_j"))
    pow2 = F.array(*[F.lit(x) for x in _POW2_NEG])
    # one agg: register count, max rho, bucket-ordered 2^-M fold
    folded = (
        regs.groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("registers_used"),
            F.max("m_j").cast("bigint").alias("max_rho"),
            F.aggregate(
                F.expr(
                    "transform(array_sort(collect_list(struct(bucket, m_j))), "
                    "s -> s.m_j)"
                ),
                F.lit(0.0),
                lambda acc, m: acc + F.element_at(pow2, m.cast("int") + 1),
            ).alias("used_sum"),
        )
    )
    exact = ev.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_distinct_exact")
    )
    est = (
        F.lit(ALPHA_M)
        * F.lit(float(HLL_M))
        * F.lit(float(HLL_M))
        / (F.col("used_sum") + (F.lit(HLL_M) - F.col("registers_used")) * F.lit(1.0))
    )
    return (
        folded.join(exact, "event_type")
        .select(
            "event_type",
            "registers_used",
            (F.lit(HLL_M) - F.col("registers_used")).alias("empty_registers"),
            "max_rho",
            est.alias("raw_estimate"),
            "n_distinct_exact",
        )
        .orderBy("event_type")
    )
