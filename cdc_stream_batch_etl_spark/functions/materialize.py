"""Lineage-breaking materialization with a scale-posture switch.

Several multi-consumer intermediates (LSH shingle frames, graph peel
rounds, star-contraction labels) are materialized once per query so the
expensive subtree does not re-run per consumer. In local mode the right
tool is ``localCheckpoint`` — zero serialization to a reliable store,
blocks in the block manager. But localCheckpoint is a LOCAL-MODE
ASSUMPTION when baked in unconditionally (r12 verdict #9):

- it truncates lineage AND stores blocks executor-locally, so on a real
  cluster one lost executor makes the job unrecoverable (no lineage to
  recompute from, no replica to fetch);
- checkpoint blocks are not released by ``spark.catalog.clearCache()``;
  they are freed by ContextCleaner only when the DataFrame is GC'd, so
  a long driver accumulates them.

``materialize`` keeps the local-mode default and exposes the
scale-safe alternatives behind one env switch, SPARK_GRAFT_MATERIALIZE:

- ``local``      (default) — ``localCheckpoint(eager)``; fastest on
  local[N], the bench posture.
- ``persist``    — ``persist(MEMORY_AND_DISK)`` WITH lineage kept, so an
  executor loss recomputes instead of failing; ``eager=True`` forces the
  fill with a count() action so concurrent consumers cannot race-fill a
  lazy cache (the r12 lsh_recall_eval bimodality).
- ``checkpoint`` — reliable ``checkpoint(eager)`` into
  ``spark.sparkContext.setCheckpointDir`` storage (HDFS/object store on
  a cluster); survives executor loss, the 100 TB posture for frames too
  expensive to ever recompute.

The switch is read per call (not at import) so tests can flip it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.storagelevel import StorageLevel


def materialize(df: DataFrame, eager: bool = True) -> DataFrame:
    """Materialize ``df`` once for multi-consumer reuse (see module doc).

    ``eager=True`` guarantees the frame is computed before any consumer
    stage launches (race-free under concurrent consumption); ``eager=
    False`` defers to first use (fine for strictly sequential rounds).
    """
    mode = os.environ.get("SPARK_GRAFT_MATERIALIZE", "local").lower()
    if mode == "persist":
        out = df.persist(StorageLevel.MEMORY_AND_DISK)
        if eager:
            out.count()
        return out
    if mode == "checkpoint":
        # requires spark.sparkContext.setCheckpointDir on the session;
        # Spark raises a clear error if unset
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
