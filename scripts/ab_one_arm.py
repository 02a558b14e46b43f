"""Single-arm clean_corpus timing in a fresh JVM: `python ab_one_arm.py on|off [reps]`.

Companion to ab_clean_corpus.py: one process per arm removes cross-arm
pollution (accumulated localCheckpoint blocks / GC pressure) from the
comparison.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from cdc_stream_batch_etl_spark.session import get_spark
from cdc_stream_batch_etl_spark.text.corpus import clean_corpus

arm = sys.argv[1]
reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
flag = arm == "on"
sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

spark = get_spark(app=f"ab_{arm}")
spark.read.parquet(f"{sf_dir}/documents.parquet").count()

samples = []
for rep in range(reps):
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    clean_corpus(spark, sf_dir, materialize_survivors=flag).write.format("noop").mode(
        "overwrite"
    ).save()
    samples.append(round(time.perf_counter() - t0, 3))
    print(f"arm={arm} rep={rep} t={samples[-1]}s", flush=True)

print(
    json.dumps(
        {
            "arm": arm,
            "samples": samples,
            "min": min(samples),
            "median": round(statistics.median(samples), 3),
        }
    )
)
spark.stop()
