"""Event-transition profile — the first-order Markov view of user
behavior streams.

Funnel analysis (operators/funnel.py) asks "did the user reach stage
k?"; the transition matrix asks the dual: FROM each event type, where
do users go next, and with what probability? Product analytics,
session-abandonment models, and synthetic-trace generators all consume
exactly this (prev, next, count, probability) table.

Ordering: transitions pair each event with the user's next event by
(ts, event_id) — the event_id tiebreak makes same-timestamp ordering
deterministic in both engines (the repo-wide total-order rule). The
probability is one integer/integer division per row — engine-exact.

Plan shape at 100 TB: lead() over a user-keyed window is ONE shuffle on
user_id with an in-partition sort (the user_sessions class); the
(prev, next) aggregate that follows is a tiny-cardinality hash-agg with
map-side combine. No self-join — the classic quadratic mistake for
transition counting is events⋈events on adjacency, which this spelling
never materializes.

Reference anchor: beyond-reference (the reference's analytics stop at
per-type counts, ref python/etl_stream.py); composes with
operators/funnel.py and sessions.py.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_ORACLE = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), pairs AS (
  SELECT event_type AS prev_type, next_type, count(*) AS n_transitions
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT prev_type, next_type,
       CAST(n_transitions AS BIGINT) AS n_transitions,
       CAST(n_transitions AS DOUBLE)
         / sum(n_transitions) OVER (PARTITION BY prev_type) AS p_transition
FROM pairs
"""


@register("event_transitions", oracle=_ORACLE)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(prev_type, next_type, n_transitions, p_transition): the user-level
    first-order transition matrix of the events stream."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.groupBy(
        F.col("event_type").alias("prev_type"), "next_type"
    ).agg(F.count("*").alias("n_transitions"))
    wp = Window.partitionBy("prev_type")
    return pairs.select(
        "prev_type",
        "next_type",
        "n_transitions",
        (
            F.col("n_transitions").cast("double")
            / F.sum("n_transitions").over(wp)
        ).alias("p_transition"),
    )


#: matrix-power depth for the path-count operator
PATH_K = 4

_TRANS_CTE = """
seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
),
m AS (
  SELECT event_type AS a, next_type AS b, CAST(count(*) AS BIGINT) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
"""

_PATHS_ORACLE = f"""
WITH {_TRANS_CTE},
md AS (SELECT a, b, CAST(n AS DECIMAL(19,0)) AS n FROM m),
m2 AS (
  SELECT x.a, y.b, CAST(sum(x.n * y.n) AS DECIMAL(38,0)) AS n
  FROM md x JOIN md y ON x.b = y.a
  GROUP BY 1, 2
)
SELECT x.a AS from_type, y.b AS to_type,
       CAST(sum(x.n * y.n) AS DOUBLE) AS n_paths
FROM m2 x JOIN m2 y ON x.b = y.a
GROUP BY 1, 2
ORDER BY from_type, to_type
"""


@register("four_step_path_counts", oracle=_PATHS_ORACLE)
def four_step_path_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted {PATH_K}-step journey volume between event types: the
    K-th power of the INTEGER transition-count matrix, where entry
    (a, b) counts ordered 4-step transition chains a→·→·→·→b with
    multiplicity (each step weighted by how often that edge occurs) —
    the long-horizon companion of top_event_paths' exact 3-grams and
    event_transitions' 1-step matrix. Because user journeys interleave,
    this is the MARKOV composition of steps (edge multiplicities
    multiply), the standard reachability-volume read on a transition
    graph.

    Determinism and magnitude: path volumes grow as count^K — already
    past int64 at a 64× corpus — so the power runs in EXACT
    decimal(38,0) arithmetic (the ABTT playbook: order-independent
    integer sums, no floats in the fold) and only the final read-out
    casts to double (exact to 2^53, correctly rounded beyond,
    identically in both engines).

    Plan: one user-keyed lead() window (the event_transitions shape),
    then joins over the E×E ≤ 25-row matrix — broadcast by AQE, cost
    invisible next to the scan."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    m = (
        ev.select("event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("a"), F.col("next_type").alias("b"))
        .agg(F.count("*").cast("decimal(19,0)").alias("n"))
    )

    def _square(mat: DataFrame) -> DataFrame:
        x = mat.select(F.col("a").alias("xa"), F.col("b").alias("xb"), F.col("n").alias("xn"))
        y = mat.select(F.col("a").alias("ya"), F.col("b").alias("yb"), F.col("n").alias("yn"))
        return (
            x.join(y, F.col("xb") == F.col("ya"))
            .groupBy(F.col("xa").alias("a"), F.col("yb").alias("b"))
            .agg(F.sum(F.col("xn") * F.col("yn")).cast("decimal(38,0)").alias("n"))
        )

    m4 = _square(_square(m))
    return m4.select(
        F.col("a").alias("from_type"),
        F.col("b").alias("to_type"),
        F.col("n").cast("double").alias("n_paths"),
    ).orderBy("from_type", "to_type")


#: ln 2 as a Python literal inlined into both engines — entropy in bits
_LN2 = repr(math.log(2.0))

_ENTROPY_ORACLE = f"""
WITH {_TRANS_CTE},
probs AS (
  SELECT a AS prev_type, b AS next_type, n,
         CAST(n AS DOUBLE) / sum(n) OVER (PARTITION BY a) AS p
  FROM m
),
ranked AS (
  SELECT prev_type, next_type, n, p,
         p * ln(p) AS term,
         row_number() OVER (PARTITION BY prev_type
                            ORDER BY n DESC, next_type) AS rnk
  FROM probs
)
SELECT prev_type,
       CAST(sum(n) AS BIGINT) AS n_transitions,
       CAST(count(*) AS BIGINT) AS n_next_types,
       max(CASE WHEN rnk = 1 THEN next_type END) AS top_next_type,
       max(CASE WHEN rnk = 1 THEN p END) AS top_share,
       round(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(term ORDER BY next_type)), (a, b) -> a + b)
             / CAST('{_LN2}' AS DOUBLE), 9) AS entropy_bits,
       round(exp(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(term ORDER BY next_type)), (a, b) -> a + b)), 9)
         AS perplexity
FROM ranked
GROUP BY prev_type
ORDER BY prev_type
"""


@register("transition_entropy", oracle=_ENTROPY_ORACLE)
def transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per previous event type: how predictable is the next step —
    Shannon entropy (bits) and perplexity (effective branching factor,
    e^H) of the next-type distribution, with the modal next step and
    its share. The summary row analysts read OVER event_transitions'
    full matrix: entropy ≈ log2(|types|) means behavior after that
    event is noise; entropy ≈ 0 means a deterministic funnel edge.

    Determinism: p is an exact integer ratio; p·ln(p) terms fold in
    explicit next_type order (the centroids idiom — ln differs across
    engines in the last ulp) and entropy/perplexity export rounded to
    9 decimals (tfidf convention); ln 2 is a Python literal, so no
    cross-engine log2 enters. top_share re-reads the rank-1 row's p —
    a raw division, exported unrounded.

    Scale: the event_transitions plan (one user-keyed lead window, one
    tiny hash-agg) plus per-prev-type folds over ≤ |types| elements."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("event_type", F.lead("event_type").over(w).alias("next_type"))
        .filter(F.col("next_type").isNotNull())
        .groupBy(F.col("event_type").alias("prev_type"), "next_type")
        .agg(F.count("*").alias("n"))
    )
    wp = Window.partitionBy("prev_type")
    probs = pairs.select(
        "prev_type",
        "next_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wp)).alias("p"),
    )
    ranked = probs.select(
        "prev_type",
        "next_type",
        "n",
        "p",
        (F.col("p") * F.log("p")).alias("term"),
        F.row_number()
        .over(wp.orderBy(F.desc("n"), "next_type"))
        .alias("rnk"),
    )
    fold = F.expr(
        "aggregate(array_sort(collect_list(struct(next_type, term))), 0.0D, "
        "(acc, e) -> acc + e.term)"
    )
    return (
        ranked.groupBy("prev_type")
        .agg(
            F.sum("n").cast("bigint").alias("n_transitions"),
            F.count("*").cast("bigint").alias("n_next_types"),
            F.max(F.when(F.col("rnk") == 1, F.col("next_type"))).alias(
                "top_next_type"
            ),
            F.max(F.when(F.col("rnk") == 1, F.col("p"))).alias("top_share"),
            F.round(-fold / F.lit(float(_LN2)), 9).alias("entropy_bits"),
            F.round(F.exp(-fold), 9).alias("perplexity"),
        )
        .orderBy("prev_type")
    )
