"""Incremental aggregate maintenance — refresh a materialized rollup
from CDC deltas via partial-aggregate merge.

The reference maintains its serving aggregates incrementally: every CDC
event bumps Redis counters in place (incr/incrbyfloat,
/root/reference/python/cdc_processor.py:124-131, 203-205) instead of
recomputing from the base table. This operator is the set-oriented form
of that contract: a stored per-(entity, day) PARTIAL state plus a delta
batch re-aggregates to the refreshed per-entity rollup — never
re-scanning the already-processed history at refresh time.

Shape: events at-or-after CUTOFF_DAY are "the delta batch"; everything
before is "already-folded state". Both sides reduce to (user_id, day)
partials carrying decomposable statistics — count, DECIMAL sum, max —
which merge by one further aggregation (day-level first, so a delta
that overlaps the cutoff day mid-day folds into that day's existing
partial, then entity-level). ``active_days`` falls out as the count of
merged day partials: every statistic here is algebraic, the property
that makes the maintenance exact.

Determinism (full DuckDB oracle): the oracle computes the SAME rollup
DIRECTLY from raw events — the hash match IS the incremental-
maintenance invariant (merge(partial(base), partial(delta)) ==
full recompute), checked cross-engine. Sums ride DECIMAL(18,2)
(functions/money.py convention); count/max/datecount are exact.

Scale: at 100 TB the base partials are a STORED table (written by the
previous refresh — here both sides derive from the same parquet, each
with its cutoff predicate pushed to the scan, visible in PLANS.md).
The refresh then costs O(|state| + |delta|), not O(|history|): one
hash-agg over the delta, a union with calendar-x-entity-sized state,
two more hash-aggs — the exact economics of the reference's counter
bumps, but restartable, exactly-once, and auditable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..registry import register

#: Delta batch = events on/after this day (the driver corpus spans
#: 2024-01; day 25+ gives a realistically small trailing delta).
CUTOFF = "2024-01-25"

_REFRESH_ORACLE = f"""
SELECT user_id,
       count(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       max(value) AS max_value,
       count(DISTINCT CAST(ts AS DATE)) AS active_days
FROM events
GROUP BY user_id
"""


def _partials(ev: DataFrame) -> DataFrame:
    return ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("tot"),
        F.max("value").alias("mx"),
    )


@register("incremental_agg_refresh", oracle=_REFRESH_ORACLE)
def incremental_agg_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rollup refreshed by merging stored pre-CUTOFF day
    partials with the delta batch's partials — proven equal to a full
    recompute by the oracle."""
    ev = load_table(spark, sf_dir, "events")
    state = _partials(ev.filter(F.to_date("ts") < F.lit(CUTOFF)))
    delta = _partials(ev.filter(F.to_date("ts") >= F.lit(CUTOFF)))
    merged = (
        state.unionByName(delta)
        .groupBy("user_id", "day")
        .agg(
            F.sum("n").alias("n"),
            F.sum("tot").alias("tot"),
            F.max("mx").alias("mx"),
        )
    )
    return merged.groupBy("user_id").agg(
        F.sum("n").cast("bigint").alias("n_events"),
        F.sum("tot").cast("double").alias("total_value"),
        F.max("mx").alias("max_value"),
        F.count("*").cast("bigint").alias("active_days"),
    )
