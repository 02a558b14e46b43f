"""RFM scoring — recency/frequency/monetary quintiles per customer.

customer_segments (operators/segments.py) labels customers with the
reference's fixed thresholds; marketing pipelines usually want the
RELATIVE ranking instead: quintile scores 1-5 on each of recency
(days since last order, lower = better), frequency (order count) and
monetary (lifetime spend), concatenated into the classic RFM code
("555" = best). This is the rank-based twin of the threshold segments.

Determinism: quintiles come from ntile(5) over a TOTAL order —
(metric, o_custkey) with the unique customer key as tie-breaker — so
equal metrics split deterministically and identically in both engines
(ntile is position-based; a non-total order would make the cut
engine-dependent). Spend rides exact integer cents; recency is integer
days from the fixed anchor date both engines compute from the data
(max order date).

Scale: one corpus hash-agg onto customers, then three ntile windows on
the |customers| frame. Each ntile is a single-partition sort of that
frame — the global-ranking cost every true quantile split pays; at
100 TB swap ntile for approx-quantile cut points broadcast back
(price_deciles documents the same trade) — and the window input is
customers, not raw orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

_RFM_ORACLE = """
WITH anchor AS (SELECT max(o_orderdate) AS d1 FROM orders),
cust AS (
  SELECT o_custkey,
         CAST(date_diff('day', max(o_orderdate),
                        (SELECT d1 FROM anchor)) AS BIGINT) AS recency_days,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
           AS monetary_cents
  FROM orders GROUP BY 1
)
SELECT o_custkey, recency_days, frequency, monetary_cents,
       CAST(6 - ntile(5) OVER (ORDER BY recency_days, o_custkey) AS INT)
         AS r_score,
       CAST(ntile(5) OVER (ORDER BY frequency, o_custkey) AS INT)
         AS f_score,
       CAST(ntile(5) OVER (ORDER BY monetary_cents, o_custkey) AS INT)
         AS m_score,
       CAST(CAST(6 - ntile(5) OVER (ORDER BY recency_days, o_custkey)
                 AS VARCHAR)
            || CAST(ntile(5) OVER (ORDER BY frequency, o_custkey)
                    AS VARCHAR)
            || CAST(ntile(5) OVER (ORDER BY monetary_cents, o_custkey)
                    AS VARCHAR) AS VARCHAR) AS rfm_code
FROM cust
ORDER BY o_custkey
"""


@register("rfm_scores", oracle=_RFM_ORACLE)
def rfm_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer recency/frequency/monetary metrics with quintile
    scores and the concatenated RFM code (tie-broken on o_custkey)."""
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").cast("bigint").alias("frequency"),
        (F.sum(F.col("o_totalprice").cast("decimal(18,2)")) * 100)
        .cast("bigint")
        .alias("monetary_cents"),
    )
    anchor = cust.agg(F.max("last_order").alias("d1"))
    cust = cust.crossJoin(F.broadcast(anchor)).select(
        "o_custkey",
        F.datediff(F.col("d1"), F.col("last_order"))
        .cast("bigint")
        .alias("recency_days"),
        "frequency",
        "monetary_cents",
    )
    r_q = F.ntile(5).over(Window.orderBy("recency_days", "o_custkey"))
    f_q = F.ntile(5).over(Window.orderBy("frequency", "o_custkey"))
    m_q = F.ntile(5).over(Window.orderBy("monetary_cents", "o_custkey"))
    r_s = (6 - r_q).cast("int")
    f_s = f_q.cast("int")
    m_s = m_q.cast("int")
    return cust.select(
        "o_custkey",
        "recency_days",
        "frequency",
        "monetary_cents",
        r_s.alias("r_score"),
        f_s.alias("f_score"),
        m_s.alias("m_score"),
        F.concat(
            r_s.cast("string"), f_s.cast("string"), m_s.cast("string")
        ).alias("rfm_code"),
    ).orderBy("o_custkey")
