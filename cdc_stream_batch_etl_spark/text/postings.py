"""Inverted-index construction (term postings) — beyond-reference.

Contamination auditing, corpus search, and TF-IDF-style featurization all
want a term → documents index. At 100 TB the hazard is the posting list
of a stopword-frequency term: an unbounded collect_list holds every
doc_id for 'the' in one aggregation buffer. The standard fix is a CAPPED
posting list: rank documents per term BEFORE collecting, keep the first
POSTING_CAP, and carry exact df / tf totals alongside so the cap loses no
accounting information (the list is a sample, the counts are exact).

Plan shape: one shuffle on the term. The per-(term, doc) tf aggregation,
the rank window, and the final per-term aggregation all partition by the
same key, so Catalyst plans a single Exchange and runs the window + final
agg on the already-partitioned data. Nothing wide crosses the wire: rows
are (token, doc_id, count).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

POSTING_CAP = 16  # posting lists keep the CAP lowest doc_ids; df/tf stay exact


_POSTINGS_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT token, doc_id, count(*) AS tf FROM tok GROUP BY token, doc_id
)
SELECT token,
       count(*) AS df,
       CAST(sum(tf) AS BIGINT) AS tf_total,
       array_to_string((list(doc_id ORDER BY doc_id))[1:{POSTING_CAP}], ',') AS posting
FROM tf
GROUP BY token
"""


@register("term_postings", oracle=_POSTINGS_ORACLE)
def term_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """token → (exact df, exact total tf, first POSTING_CAP doc_ids).
    The rank filter bounds aggregation-buffer memory per term regardless
    of term frequency — a collect_list over ranked-then-capped rows, not
    over the raw posting."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token", "doc_id")
        .agg(F.count("*").alias("tf"))
    )
    rn = F.row_number().over(Window.partitionBy("token").orderBy("doc_id"))
    return (
        tf.withColumn("rn", rn)
        .groupBy("token")
        .agg(
            F.count("*").alias("df"),
            F.sum("tf").cast("bigint").alias("tf_total"),
            # joined to a string (customer_order_sets convention): the
            # driver value-hashes cells, so oracled outputs stay scalar
            F.array_join(
                F.array_sort(
                    F.collect_list(F.when(F.col("rn") <= POSTING_CAP, F.col("doc_id")))
                ),
                ",",
            ).alias("posting"),
        )
    )
