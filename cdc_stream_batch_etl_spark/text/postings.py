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


#: terms below this document frequency are excluded from the sizing
#: report (their lists are a doc_id apiece — noise rows, not storage)
MIN_DF = 2

# VByte length of v (1..5 bytes for v < 2^35): branch-free comparison sum,
# identical integer comparisons in both engines
_VB_SPARK = (
    "(1 + cast(gap >= 128 as int) + cast(gap >= 16384 as int)"
    " + cast(gap >= 2097152 as int) + cast(gap >= 268435456 as int))"
)
_VB_SQL = (
    "(1 + (gap >= 128)::INT + (gap >= 16384)::INT"
    " + (gap >= 2097152)::INT + (gap >= 268435456)::INT)"
)

_COMPRESSION_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
), tf AS (
  SELECT token, doc_id FROM tok GROUP BY token, doc_id
), gaps AS (
  SELECT token,
         doc_id - lag(doc_id, 1, -1) OVER (PARTITION BY token ORDER BY doc_id)
           AS gap
  FROM tf
)
SELECT token,
       CAST(count(*) AS BIGINT) AS df,
       CAST(8 * count(*) AS BIGINT) AS raw_bytes,
       CAST(sum({_VB_SQL}) AS BIGINT) AS vbyte_bytes,
       CAST(sum({_VB_SQL}) AS DOUBLE) / (8 * count(*)) AS compression_ratio
FROM gaps
GROUP BY token
HAVING count(*) >= {MIN_DF}
ORDER BY token
"""


@register("postings_compression_plan", oracle=_COMPRESSION_ORACLE)
def postings_compression_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Index storage sizing: per term, the exact VByte cost of the
    d-gap-encoded posting list vs raw 64-bit doc_ids (the standard
    inverted-index compression model — Witten/Moffat/Bell's gap+VByte;
    Scholer et al., SIGIR 2002). The terms where compression_ratio
    stays near 1 are the rare-term long tail (gaps ≈ id magnitude);
    dense stopword-class terms compress toward 1/8 — this report is
    how an index-build pass budgets storage BEFORE encoding anything.

    The first gap is doc_id − (−1) = doc_id + 1, the store-first-raw
    convention with a strictly positive value even for doc_id 0.

    Plan: one shuffle on the term (the tf dedup, the lag window, and
    the final agg share the token partitioning — same single-Exchange
    shape as term_postings); all arithmetic is integer comparisons
    plus one IEEE division by an exact integer."""
    docs = load_table(spark, sf_dir, "documents")
    tf = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
        .select("token", "doc_id")
        .distinct()
    )
    gap = (
        F.col("doc_id")
        - F.lag("doc_id", 1, -1).over(Window.partitionBy("token").orderBy("doc_id"))
    ).alias("gap")
    vb = F.expr(_VB_SPARK)
    return (
        tf.select("token", gap)
        .groupBy("token")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            (F.lit(8) * F.count("*")).cast("bigint").alias("raw_bytes"),
            F.sum(vb).cast("bigint").alias("vbyte_bytes"),
            (F.sum(vb).cast("double") / (F.lit(8) * F.count("*"))).alias(
                "compression_ratio"
            ),
        )
        .filter(F.col("df") >= MIN_DF)
        .orderBy("token")
    )
