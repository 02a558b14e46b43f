"""Edit-distance verification for prefix-blocked near-duplicate pairs —
the sorted-neighborhood method.

The character-level rung of the dedup ladder: shingle/MinHash methods
are token-set approximations, but the curation decision for borderline
pairs (OCR noise, small in-place edits) wants the true edit distance.
Running Levenshtein on all pairs is O(N² · L²) — never at scale — so
candidates are scoped twice:

1. BLOCK on a 32-char exact prefix (the corpus's mutated near-dups keep
   their openings).
2. Within a block, order by doc_id and pair each document only with its
   next NEIGHBOR_W successors — the classic sorted-neighborhood window
   (Hernández & Stolfo 1995). Pair count is O(N·W), LINEAR in block
   size. All-pairs-within-block is quadratic in near-dup cluster size:
   the ×8 probe measured exponent 1.99 on that spelling (0.45 → 28.3 s,
   SCALING.md round 6) because replication grows every cluster 8-fold —
   exactly the behavior a 100 TB crawl's template clusters exhibit.

JOIN-SHAPE RULE (the second probe catch this round): the window
predicate must ride the EQUI-JOIN KEY, not a post-join filter. Joining
on blk alone and filtering `rk BETWEEN` afterwards still materializes
every within-block pair before the filter — re-probed at exponent 1.74.
The left side therefore EXPLODES its W successor ranks into join keys,
so the join on (blk, rk) emits exactly the window pairs and nothing
else: re-probed at exponent 0.30 (SCALING.md round 6).

Transitivity makes the window sufficient for dedup purposes: inside a
block, A~B and B~C chain through the neighbor graph, and the components
operator (dedup/components.py) closes the clusters downstream.

Levenshtein is a built-in in both engines computing the same standard
DP — integer-exact, so the oracle is a full-value hash match.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

BLOCK_CHARS = 32
#: sorted-neighborhood window: each doc pairs with its next W block-mates
NEIGHBOR_W = 5

_ORACLE = f"""
WITH b AS (
  SELECT doc_id, text,
         substr(text, 1, {BLOCK_CHARS}) AS blk,
         row_number() OVER (
           PARTITION BY substr(text, 1, {BLOCK_CHARS}) ORDER BY doc_id) AS rk
  FROM documents
), probes AS (
  SELECT doc_id, text, blk, rk + j.j AS target_rk
  FROM b, (SELECT unnest(generate_series(1, {NEIGHBOR_W})) AS j) j
)
SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
       levenshtein(a.text, c.text) AS edit_distance,
       greatest(length(a.text), length(c.text)) AS max_len,
       1.0 - CAST(levenshtein(a.text, c.text) AS DOUBLE)
           / greatest(length(a.text), length(c.text)) AS similarity
FROM probes a JOIN b c ON a.blk = c.blk AND a.target_rk = c.rk
"""


@register("edit_distance_pairs", oracle=_ORACLE)
def edit_distance_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Levenshtein distance and normalized similarity for every
    sorted-neighborhood pair within a 32-char prefix block."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "text",
        F.substring("text", 1, BLOCK_CHARS).alias("blk"),
    ).withColumn(
        "rk", F.row_number().over(Window.partitionBy("blk").orderBy("doc_id"))
    )
    probes = docs.select(
        "doc_id",
        "text",
        "blk",
        "rk",
        F.explode(F.sequence(F.lit(1), F.lit(NEIGHBOR_W))).alias("j"),
    ).select(
        "doc_id", "text", "blk", (F.col("rk") + F.col("j")).alias("target_rk")
    )
    # Both sides are corpus-sized (post-window size estimates are
    # unreliable, and Catalyst picked BuildLeft BROADCAST of the W×
    # exploded text side — measured as the real exponent-1.7 cost at ×8,
    # the copurchase_pairs hazard class). Force a shuffled hash join
    # building on the non-exploded side: one (blk, rk)-keyed shuffle each,
    # no sort, nothing broadcast.
    a, c = probes.alias("a"), docs.hint("shuffle_hash").alias("c")
    dist = F.levenshtein(F.col("a.text"), F.col("c.text"))
    max_len = F.greatest(F.length("a.text"), F.length("c.text"))
    return (
        a.join(
            c,
            (F.col("a.blk") == F.col("c.blk"))
            & (F.col("a.target_rk") == F.col("c.rk")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("c.doc_id").alias("doc_b"),
            dist.alias("edit_distance"),
            max_len.alias("max_len"),
            (F.lit(1.0) - dist.cast("double") / max_len).alias("similarity"),
        )
    )
