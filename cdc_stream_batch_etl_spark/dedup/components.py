"""Connected-components canonicalization over near-duplicate pairs.

Beyond-reference operator — the step that turns *pairs* (dedup/minhash.py)
into a usable dedup decision. Pairwise output is not enough for a training
corpus: if A~B and B~C, keeping "one of each pair" can keep both A and C.
The correct semantics are transitive — group near-dup pairs into
components and keep one canonical document (min doc_id) per component.

This is a genuinely *iterative* algorithm, the class SURVEY.md §2 has no
SQL row for; it is still fully DuckDB-oracled here via a recursive CTE
(reachability closure → min reachable id), so the driver gets a
hash-exact check, not a weaker rows-only one.

Spark implementation: label propagation to fixpoint. Every node starts
labeled with its own id; each round every node takes the min of its label
and its neighbors' labels. Convergence needs O(component diameter) rounds
— for near-dup clusters the diameter is tiny (pairs/triangles/short
chains), so the driver-side loop runs 2-3 rounds in practice; MAX_ITER
bounds pathological chains, and the loop stops on the first round with no
label change. Each round is one shuffle (edge⋈label groupBy); lineage is
truncated per round with localCheckpoint so plans don't grow
exponentially. At 100 TB-with-long-chains scale the same loop upgrades to
the alternating large-star/small-star algorithm (O(log n) rounds,
Kiveris et al., "Connected Components in MapReduce and Beyond") — the
edge list here is near-dup pairs, ~0.1% of corpus size, so the loop cost
is dominated by the one LSH pass that produced the pairs.

Output: every document with its canonical id and a keep/drop flag —
singletons are their own canonical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register
from .minhash import lsh_pairs, pairs_oracle_sql

MAX_ITER = 20

_CC_ORACLE = f"""
WITH RECURSIVE pairs AS (
  {pairs_oracle_sql("documents")}
), edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION
  SELECT doc_b AS src, doc_a AS dst FROM pairs
), walk(node, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, w.lbl FROM walk w JOIN edges e ON w.node = e.src
)
SELECT node AS doc_id,
       min(lbl) AS canonical_id,
       min(lbl) = node AS is_canonical
FROM walk
GROUP BY node
"""


def connected_components(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """Min-label propagation to fixpoint.

    nodes: one column ``id``; edges: ``src``/``dst`` (any orientation).
    Returns (id, label) with label = min id of the component.
    """
    # materialize the (tiny) symmetrized edge list once — every round
    # joins against it, and without this the full upstream pipeline that
    # produced the pairs (LSH candidate gen + verification) would re-run
    # per iteration
    sym = (
        edges.select("src", "dst")
        .union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .localCheckpoint()
    )
    labels = nodes.select("id", F.col("id").alias("label")).localCheckpoint()
    for _ in range(MAX_ITER):
        nb_min = (
            sym.join(labels, sym["src"] == labels["id"])
            .groupBy("dst")
            .agg(F.min("label").alias("nb_label"))
        )
        new_labels = (
            labels.join(nb_min, labels["id"] == nb_min["dst"], "left")
            .select(
                "id",
                F.least(F.col("label"), F.coalesce(F.col("nb_label"), F.col("label"))).alias(
                    "new_label"
                ),
                "label",
            )
            .localCheckpoint()
        )
        changed = new_labels.filter(F.col("new_label") != F.col("label")).count()
        labels = new_labels.select("id", F.col("new_label").alias("label"))
        if changed == 0:
            break
    return labels


@register("dedup_components", oracle=_CC_ORACLE)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    pairs = lsh_pairs(docs.select("doc_id", "text"))
    labels = connected_components(
        docs.select(F.col("doc_id").alias("id")),
        pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")),
    )
    return labels.select(
        F.col("id").alias("doc_id"),
        F.col("label").alias("canonical_id"),
        (F.col("label") == F.col("id")).alias("is_canonical"),
    )
