"""A/B the clean_corpus `materialize_survivors` flag at bench scale.

Round-3 bench saw clean_corpus at 7.23 s (vs 2.83 s in r2) with no code
change in between; hypothesis from the verdict: the survivor recompute
(12 consumers re-deriving the gated/deduped set from parquet) dominates
at sf0.1 when the localCheckpoint default is OFF. This runs ≥3 reps per
arm, interleaved (ABAB...) so JVM warmth and box contention hit both arms
equally, and prints per-rep + min/median per arm.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_stream_batch_etl_spark.text.corpus import clean_corpus
from cdc_stream_batch_etl_spark.session import get_spark

REPS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app="ab_clean_corpus")
spark.read.parquet(f"{sf_dir}/documents.parquet").count()  # warm

results: dict[str, list[float]] = {"off": [], "on": []}
for rep in range(REPS):
    for arm, flag in (("off", False), ("on", True)):
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = clean_corpus(spark, sf_dir, materialize_survivors=flag)
        df.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        results[arm].append(round(dt, 3))
        print(f"rep={rep} arm={arm} t={dt:.3f}s", flush=True)

summary = {
    arm: {
        "samples": v,
        "min": min(v),
        "median": round(statistics.median(v), 3),
    }
    for arm, v in results.items()
}
print(json.dumps(summary))
spark.stop()
