"""One-call streaming deployment — the reference's three processor
processes (cdc_processor, stream_processor, + alerts producer) as a set of
concurrently running Structured Streaming queries over shared sources.

The reference runs separate OS processes with two Kafka consumer groups
(SURVEY §2.1 S4); here each output family is an independent streaming
query with its own checkpoint — same isolation, one SparkSession, and the
source is read independently per query (Spark's analog of independent
consumer groups).

Sinks are parquet directories under `out_dir` (the Redis key families as
tables, SURVEY §1.3); checkpoints under `<out_dir>/_checkpoints/<name>`.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming import StreamingQuery

from .analytics import alerts_stream, minute_metrics_stream, velocity_stream
from .cdc_stream import cdc_stats_stream, latest_state_query, parse_envelope


@dataclass
class StreamingPipelines:
    queries: dict[str, StreamingQuery] = field(default_factory=dict)

    def await_all(self, timeout_sec: int = 300) -> None:
        for q in self.queries.values():
            q.awaitTermination(timeout_sec)

    def stop_all(self) -> None:
        for q in self.queries.values():
            if q.isActive:
                q.stop()


def _parquet_sink(df: DataFrame, path: str, checkpoint: str, name: str) -> StreamingQuery:
    return (
        df.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )


def _overwrite_sink(df: DataFrame, path: str, checkpoint: str, name: str) -> StreamingQuery:
    """Complete-mode aggregate → atomically rewritten parquet snapshot
    (the `:latest` key family: each micro-batch replaces the snapshot)."""

    def apply(batch: DataFrame, batch_id: int) -> None:
        batch.localCheckpoint(eager=True).write.mode("overwrite").parquet(path)

    return (
        df.writeStream.outputMode("complete")
        .foreachBatch(apply)
        .option("checkpointLocation", checkpoint)
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )


def start_pipelines(
    raw_cdc: DataFrame,
    events: DataFrame,
    customer: DataFrame,
    nation: DataFrame,
    out_dir: str,
    cdc_table: str = "customers",
) -> StreamingPipelines:
    """Start the full streaming surface:

    - cdc_stats      running (table, op) counters       [complete snapshot]
    - latest_state   W10 cache maintenance              [foreachBatch merge]
    - minute_metrics W1 windowed purchase metrics       [append]
    - velocity       W4 per-product 5-min sums          [append]
    - alerts         W6-W9 union, S6 payload shape      [append]

    `raw_cdc` is a `value`-column stream (Kafka or file); `events` is the
    events-shaped stream; `customer`/`nation` are static dims for the
    stream-static enrichment.
    """
    ck = f"{out_dir}/_checkpoints"
    changes = parse_envelope(raw_cdc, cdc_table)
    p = StreamingPipelines()
    p.queries["cdc_stats"] = _overwrite_sink(
        cdc_stats_stream(changes), f"{out_dir}/cdc_stats", f"{ck}/cdc_stats", "cdc_stats"
    )
    p.queries["latest_state"] = latest_state_query(
        changes, cdc_table, f"{out_dir}/latest_state", f"{ck}/latest_state"
    )
    p.queries["minute_metrics"] = _parquet_sink(
        minute_metrics_stream(events),
        f"{out_dir}/minute_metrics",
        f"{ck}/minute_metrics",
        "minute_metrics",
    )
    p.queries["velocity"] = _parquet_sink(
        velocity_stream(events), f"{out_dir}/velocity", f"{ck}/velocity", "velocity"
    )
    p.queries["alerts"] = _parquet_sink(
        alerts_stream(events, customer, nation),
        f"{out_dir}/alerts",
        f"{ck}/alerts",
        "alerts",
    )
    return p
