"""Scalar (8-bit) embedding quantization — beyond-reference.

ANN serving at 100 TB is memory-bound: float32 × 64 dims = 256 B/vector,
while per-dimension 8-bit codes are 64 B — a 4× working-set reduction
that usually costs <1% recall (the standard first rung of the FAISS
quantization ladder, before PQ/OPQ). This operator computes the global
per-dimension (min, max) calibration, encodes every vector, and reports
per-vector reconstruction error so the recall/compression trade is
measured, not assumed.

Plan (two passes, mirroring price_deciles' threshold-broadcast shape):
1. calibration: posexplode → groupBy(dim) min/max — 64 output rows,
   map-side combined, order-independent aggregates (min/max are safe
   under IEEE reordering, unlike sums);
2. the 64-row calibration collapses to ONE row of ordered (mns, mxs)
   arrays, broadcast onto the embeddings scan; encode + error are pure
   scan-local array expressions (whole-stage codegen, no shuffle).

Float determinism: the error SUM folds the squared-error array left to
right with a 0.0 seed (`aggregate` in Spark, `list_reduce` in DuckDB —
0.0 + x1 == x1 bitwise, see similarity/centroids.py), and every
arithmetic expression is written with identical parenthesization in both
engines, so mse hash-matches with atol=0. round() on a non-negative
argument is half-away-from-zero in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_QUANTIZE_ORACLE = """
WITH comp AS (
  SELECT i AS pos, CAST(embedding[i] AS DOUBLE) AS val
  FROM embeddings, (SELECT unnest(generate_series(1, len(embedding))) AS i) u
), calib AS (
  SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs
  FROM (SELECT pos, min(val) AS mn, max(val) AS mx FROM comp GROUP BY pos)
), enc AS (
  SELECT vec_id, embedding, mns, mxs,
         [CASE WHEN mxs[i] > mns[i]
               THEN CAST(round((CAST(embedding[i] AS DOUBLE) - mns[i]) * 255 / (mxs[i] - mns[i])) AS INT)
               ELSE 0 END
          for i in generate_series(1, len(embedding))] AS codes
  FROM embeddings CROSS JOIN calib
), err AS (
  SELECT vec_id, codes,
         [CAST(embedding[i] AS DOUBLE)
            - (mns[i] + CAST(codes[i] AS DOUBLE) * (mxs[i] - mns[i]) / 255)
          for i in generate_series(1, len(embedding))] AS errs
  FROM enc
)
SELECT vec_id,
       array_to_string(codes, ',') AS codes,
       list_reduce([e * e for e in errs], (a, b) -> a + b) / len(errs) AS mse,
       list_max([abs(e) for e in errs]) AS max_abs_err
FROM err
"""


@register("embedding_quantize", oracle=_QUANTIZE_ORACLE)
def embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """vec_id → 8-bit codes + reconstruction mse / max-abs error, with
    global per-dimension min-max calibration broadcast onto the scan."""
    emb = load_table(spark, sf_dir, "embeddings")
    comp = emb.select(F.posexplode("embedding").alias("pos0", "valf")).select(
        (F.col("pos0") + 1).alias("pos"), F.col("valf").cast("double").alias("val")
    )
    calib = (
        comp.groupBy("pos")
        .agg(F.min("val").alias("mn"), F.max("val").alias("mx"))
        .agg(
            F.expr("transform(array_sort(collect_list(struct(pos, mn))), s -> s.mn)").alias("mns"),
            F.expr("transform(array_sort(collect_list(struct(pos, mx))), s -> s.mx)").alias("mxs"),
        )
    )
    enc = emb.crossJoin(F.broadcast(calib)).withColumn(
        "codes",
        F.expr(
            """
            transform(sequence(1, size(embedding)), i ->
              CASE WHEN element_at(mxs, i) > element_at(mns, i)
                   THEN cast(round((cast(element_at(embedding, i) as double) - element_at(mns, i))
                                   * 255 / (element_at(mxs, i) - element_at(mns, i))) as int)
                   ELSE 0 END)
            """
        ),
    )
    err = enc.withColumn(
        "errs",
        F.expr(
            """
            transform(sequence(1, size(embedding)), i ->
              cast(element_at(embedding, i) as double)
                - (element_at(mns, i)
                   + cast(element_at(codes, i) as double)
                     * (element_at(mxs, i) - element_at(mns, i)) / 255))
            """
        ),
    )
    return err.select(
        "vec_id",
        # joined to a string (customer_order_sets convention): oracled
        # outputs stay scalar so the driver's value hash is well-defined
        F.array_join("codes", ",").alias("codes"),
        F.expr("aggregate(transform(errs, e -> e * e), 0.0D, (a, b) -> a + b) / size(errs)").alias(
            "mse"
        ),
        F.expr("array_max(transform(errs, e -> abs(e)))").alias("max_abs_err"),
    )
