"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized via a count-style action (noop write) so
the measured time includes the whole plan, not just plan construction.

Methodology: each query runs twice and reports the faster run (standard
warm-run benchmarking — the first execution of a plan shape pays one-time
whole-stage-codegen compilation that a resident engine never re-pays;
data is re-scanned from parquet on every run, nothing is cached).

Noise self-identification: the whole run's stderr (which the driver JVM
inherits) is captured to a sidecar file; the JSON carries
``errors`` = count of ERROR-level / stack-frame lines seen during the
window and ``failed_tasks`` = sum of task failures across all stages, so
a contention- or retry-inflated number is distinguishable from a real
regression without forensics (the BENCH_r04 DAGScheduler-trace lesson).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

from cdc_stream_batch_etl_spark import registry
from cdc_stream_batch_etl_spark.session import get_spark

# Headline set: widened as operators land. Keep this representative, not
# exhaustive — the full inventory runs in the correctness gate.
HEADLINE: list[str] = [
    "customer_segments",
    "product_insights",
    "order_analytics",
    "pricing_summary",
    "latest_state",
    "user_activity",
    "alerts_summary",
    "minhash_lsh_pairs",
    "simhash_near_pairs",
    "embed_near_dup_lsh",
    "semantic_dedup",
    "ann_cosine_topk",
    "ann_ivf_topk",
    "doc_token_stats",
    "clean_corpus",
    "asof_purchase_attribution",
    "user_sessions",
    "scd2_history",
    "corpus_bigrams",
    "dedup_components",
    "top_parts_per_brand",
    "span_dedup_coverage",
    "doc_chunks",
    "term_postings",
    "embedding_quantize",
    "ann_pq_topk",
    "doc_lm_score",
    "incremental_dedup",
    "shard_manifest",
    "purchase_context_window",
    "dsir_importance",
    "quality_classifier",
    "source_semantic_diversity",
    "compression_gate",
    # the Arrow-heavy decode pass runs mid-list: at the tail of a ~50-query
    # session it measured 8x slower (accumulated Python-worker/JVM pressure
    # — same-JVM pollution class, SCALING.md), mid-list it is stable
    "image_phash_dedup",
    "ts_similarity_topk",
    "copurchase_pagerank",
    "fulfillment_lag",
    "semantic_dedup_imi",
    "ann_ivfpq_topk",
    "copurchase_pairs",
    "basket_rules",
    "dedup_ledger",
    "token_quota_by_source",
    "winsorize_values",
    "kmv_distinct_by_type",
    "local_supplier_volume",
    "returned_item_report",
]


def _sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1)) if m else float("nan")


def _count_noise(log_path: str) -> int:
    """ERROR-level lines + Java stack frames in the captured stderr."""
    n = 0
    try:
        with open(log_path, errors="replace") as f:
            for line in f:
                if " ERROR " in line or line.startswith("\tat ") or "Exception" in line:
                    n += 1
    except OSError:
        pass
    return n


def _failed_tasks(spark) -> int:
    """Sum task failures over every retained stage of the run."""
    tracker = spark.sparkContext.statusTracker()
    total, misses, i = 0, 0, 0
    while misses < 200:  # stage ids are dense from 0; stop after a long gap
        info = tracker.getStageInfo(i)
        if info is None:
            misses += 1
        else:
            misses = 0
            total += info.numFailedTasks
        i += 1
    return total


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    log_path = os.environ.get("SPARK_GRAFT_BENCH_LOG", "/tmp/bench_stderr.log")
    # fd-level redirect BEFORE the JVM launches so it inherits the fd; the
    # sidecar file is what _count_noise scans after the window closes
    log_fd = os.open(log_path, os.O_WRONLY | os.O_CREAT | os.O_TRUNC, 0o644)
    saved_stderr = os.dup(2)
    sys.stderr.flush()
    os.dup2(log_fd, 2)

    registry.load_all()
    names = [n for n in HEADLINE if n in registry.QUERIES]
    spark = get_spark(
        app="bench",
        # keep every stage's status in memory so the failed-task sweep at the
        # end of the window sees the whole run, not the last 1000 stages
        extra_conf={"spark.ui.retainedStages": "50000"},
    )
    # warm the JVM + parquet footers once, outside the timed region
    spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()

    def run_once(name: str) -> float:
        # queries may persist() intra-query intermediates; drop them
        # between runs so every timed run starts from parquet
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    timings: dict[str, float] = {}
    for name in names:
        samples = [run_once(name), run_once(name)]
        # shared-box contention can inflate a sample several-fold; when the
        # two runs disagree badly, take a third so one spike can't both be
        # the min — still bounded at 3 runs per query
        if max(samples) > 1.5 * min(samples):
            samples.append(run_once(name))
        timings[name] = round(min(samples), 3)

    total = round(sum(timings.values()), 3)
    failed = _failed_tasks(spark)
    # restore stderr before emitting the JSON so the line lands cleanly
    sys.stderr.flush()
    os.dup2(saved_stderr, 2)
    os.close(saved_stderr)
    os.close(log_fd)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(sf_dir),
                "errors": _count_noise(log_path),
                "failed_tasks": failed,
                "errors_log": log_path,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
