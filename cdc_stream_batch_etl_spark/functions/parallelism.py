"""Scan-width control for CPU-heavy per-row expression trees.

A parquet file is split at row-group boundaries; the synthetic corpus
files (and many real-world small shards) have ONE row group, so Spark
scans them as ONE task and every downstream scan-local expression —
shingle hashing, positional n-grams, md5 fingerprints — serializes onto
a single core no matter how many the executor has.

`fan_out` widens such a scan with an explicit round-robin repartition,
GUARDED so it is a no-op whenever the input is already at least as wide
as the target: at 100 TB a corpus scan has thousands of splits and this
function does nothing (a blind repartition there would shuffle the whole
corpus — the exact anti-pattern the guard exists to prevent). The
shuffle it does introduce on narrow inputs moves only the raw input
bytes, which is strictly cheaper than leaving the per-row compute
serialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame, target: int | None = None) -> DataFrame:
    """Repartition `df` up to `target` partitions (default: cluster
    parallelism) — only if it is currently narrower than that."""
    sc = df.sparkSession.sparkContext
    target = target or sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
