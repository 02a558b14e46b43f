"""Gopher quality-rule scorecard — per-rule pass/fail attrition across
the named heuristic filters of Rae et al. 2021 (Gopher, §A1.1), the
rule set every web-scale corpus pipeline re-implements (MassiveText,
RefinedWeb, FineWeb all start here). Beyond-reference, SURVEY §2.11
text-quality family: doc_quality scores each DOCUMENT, and
corpus_gate_funnel counts SEQUENTIAL survivorship of this repo's own
clean_corpus stages; this reports each canonical Gopher rule
INDEPENDENTLY — the table a curation team reads to see which single
rule is doing the work (or over-firing) before wiring rules into a
sequential gate.

Rules (adapted to this corpus's measured ranges; each row names one):
  word_count      — 50 <= n_tokens <= 100000 (Gopher's length bounds).
  mean_word_len   — mean characters per word in [3, 10].
  stopword_hits   — at least 2 occurrences of the stop-word set
                    (the|a|of|to|and) — Gopher's "2 of 8 stop words".
  max_word_ratio  — most frequent single token <= 20% of the document
                    (the one-token-spam rule; Gopher phrases it as
                    duplicate-line fraction, which needs lines — this
                    corpus is single-line, so the unigram form is the
                    faithful adaptation).
  all_rules       — conjunction of the four.

Output: (rule, rule_idx, n_pass, n_fail, pass_rate) — 5 rows.

Scale: three of four rules are pure per-row expressions fused into one
scan by Catalyst. max_word_ratio needs the per-doc modal token count:
explode -> (doc_id, token) hash agg -> (doc_id) max — two map-side-
partial aggs on the token frame, then ONE sort-merge join back to the
flags frame on doc_id (the frame is doc-cardinality, not token-
cardinality, by then). The final 5-row report is a single aggregate
unpivoted with stack — no per-rule rescans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

MIN_WORDS, MAX_WORDS = 50, 100_000
MIN_MWL, MAX_MWL = 3.0, 10.0
MIN_STOPWORDS = 2
MAX_WORD_RATIO = 0.2
_STOPWORDS_RE = r"\b(the|a|of|to|and)\b"

_GOPHER_ORACLE = f"""
WITH toks AS (
  SELECT doc_id, count(*) AS cnt
  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
  GROUP BY doc_id, tok
),
modal AS (SELECT doc_id, max(cnt) AS max_cnt FROM toks GROUP BY doc_id),
flags AS (
  SELECT
    len(string_split(d.text, ' '))
      BETWEEN {MIN_WORDS} AND {MAX_WORDS} AS r_wc,
    CAST(length(replace(d.text, ' ', '')) AS DOUBLE)
      / len(string_split(d.text, ' '))
      BETWEEN {MIN_MWL} AND {MAX_MWL} AS r_mwl,
    len(regexp_extract_all(d.text, '{_STOPWORDS_RE}')) >= {MIN_STOPWORDS}
      AS r_sw,
    CAST(m.max_cnt AS DOUBLE) / len(string_split(d.text, ' '))
      <= {MAX_WORD_RATIO} AS r_mwr
  FROM documents d JOIN modal m USING (doc_id)
),
agg AS (
  SELECT count(*) AS n,
         sum(CASE WHEN r_wc THEN 1 ELSE 0 END) AS p_wc,
         sum(CASE WHEN r_mwl THEN 1 ELSE 0 END) AS p_mwl,
         sum(CASE WHEN r_sw THEN 1 ELSE 0 END) AS p_sw,
         sum(CASE WHEN r_mwr THEN 1 ELSE 0 END) AS p_mwr,
         sum(CASE WHEN r_wc AND r_mwl AND r_sw AND r_mwr THEN 1 ELSE 0 END)
           AS p_all
  FROM flags
)
SELECT rule, CAST(rule_idx AS BIGINT) AS rule_idx,
       CAST(n_pass AS BIGINT) AS n_pass,
       CAST(n - n_pass AS BIGINT) AS n_fail,
       CAST(n_pass AS DOUBLE) / n AS pass_rate
FROM (
  SELECT 'word_count' AS rule, 0 AS rule_idx, p_wc AS n_pass, n FROM agg
  UNION ALL SELECT 'mean_word_len', 1, p_mwl, n FROM agg
  UNION ALL SELECT 'stopword_hits', 2, p_sw, n FROM agg
  UNION ALL SELECT 'max_word_ratio', 3, p_mwr, n FROM agg
  UNION ALL SELECT 'all_rules', 4, p_all, n FROM agg
)
ORDER BY rule_idx
"""


@register("gopher_rules_report", oracle=_GOPHER_ORACLE)
def gopher_rules_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(rule, rule_idx, n_pass, n_fail, pass_rate) — independent pass
    rates for each adapted Gopher §A1.1 quality rule, plus the AND."""
    docs = load_table(spark, sf_dir, "documents")
    modal = (
        docs.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("cnt"))
        .groupBy("doc_id")
        .agg(F.max("cnt").alias("max_cnt"))
    )
    n_tokens = F.size(F.split(F.col("text"), " "))
    mwl = (
        F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))).cast("double")
        / n_tokens
    )
    flags = docs.join(modal, "doc_id").select(
        n_tokens.between(MIN_WORDS, MAX_WORDS).alias("r_wc"),
        mwl.between(MIN_MWL, MAX_MWL).alias("r_mwl"),
        (F.regexp_count(F.col("text"), F.lit(_STOPWORDS_RE)) >= MIN_STOPWORDS).alias(
            "r_sw"
        ),
        (F.col("max_cnt").cast("double") / n_tokens <= MAX_WORD_RATIO).alias("r_mwr"),
    )

    def hits(c) -> F.Column:
        return F.sum(F.when(c, 1).otherwise(0))

    agg = flags.agg(
        F.count("*").alias("n"),
        hits(F.col("r_wc")).alias("p_wc"),
        hits(F.col("r_mwl")).alias("p_mwl"),
        hits(F.col("r_sw")).alias("p_sw"),
        hits(F.col("r_mwr")).alias("p_mwr"),
        hits(
            F.col("r_wc") & F.col("r_mwl") & F.col("r_sw") & F.col("r_mwr")
        ).alias("p_all"),
    )
    return (
        agg.select(
            F.expr(
                "stack(5, 'word_count', 0L, p_wc, 'mean_word_len', 1L, p_mwl, "
                "'stopword_hits', 2L, p_sw, 'max_word_ratio', 3L, p_mwr, "
                "'all_rules', 4L, p_all) AS (rule, rule_idx, n_pass)"
            ),
            "n",
        )
        .select(
            "rule",
            "rule_idx",
            F.col("n_pass").cast("bigint").alias("n_pass"),
            (F.col("n") - F.col("n_pass")).cast("bigint").alias("n_fail"),
            (F.col("n_pass").cast("double") / F.col("n")).alias("pass_rate"),
        )
        .orderBy("rule_idx")
    )
