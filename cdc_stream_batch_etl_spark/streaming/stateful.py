"""Custom stateful streaming operator via applyInPandasWithState.

Reference: the stream processor keeps a per-customer activity dict in
Redis — ``order_count_today`` read-modify-write, last order time/amount,
24 h TTL (/root/reference/python/stream_processor.py:111-125). That is
running per-key state emitted on every update with timeout-based expiry —
NOT expressible as a watermarked window aggregate (windows emit per
window; this emits the running daily total per event batch and forgets
the key a day after its last activity, exactly like the Redis TTL).

Spark mapping: ``applyInPandasWithState`` with event-time timeout — the
state store replaces Redis, the watermark drives TTL eviction. Arrow
batches keep the Python hop vectorized (the only Python-side operator in
the engine; everything else is JVM codegen).

Scale: state is partitioned by user_id across executors (shuffle on the
grouping key), size is O(active keys × 32 bytes) — bounded by the
timeout eviction, with RocksDB state store as the >memory spill path.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

ACTIVITY_TTL_MS = 24 * 3600 * 1000  # reference's 86400 s Redis TTL

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("order_count_today", LongType()),
        StructField("total_value_today", DoubleType()),
        StructField("last_order_ts_ms", LongType()),
        StructField("last_order_amount", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("cnt", LongType()),
        StructField("total", DoubleType()),
        StructField("last_ts", LongType()),
        StructField("last_amount", DoubleType()),
    ]
)


def _track(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.hasTimedOut:
        # TTL expiry: forget the key, emit nothing (Redis key eviction)
        state.remove()
        return
    cnt, total, last_ts, last_amount = (
        state.get if state.exists else (0, 0.0, 0, 0.0)
    )
    first = True
    for pdf in pdfs:
        if first and cnt:
            # Redis expires at access: if the key sat idle past the TTL,
            # its state is gone before this write lands. The GroupState
            # timeout alone can't express this — a timed-out key with new
            # data in the same micro-batch takes the data path, not the
            # timeout path — so staleness is re-checked here.
            batch_min_ts = int((pdf["ts"].astype("int64") // 1_000_000).min())
            if batch_min_ts - last_ts > ACTIVITY_TTL_MS:
                cnt, total, last_ts, last_amount = 0, 0.0, 0, 0.0
        first = False
        cnt += len(pdf)
        total += float(pdf["value"].sum())
        ts_ms = (pdf["ts"].astype("int64") // 1_000_000).max()
        if ts_ms >= last_ts:
            newest = pdf.loc[(pdf["ts"].astype("int64") // 1_000_000).idxmax()]
            last_ts = int(ts_ms)
            last_amount = float(newest["value"])
    state.update((cnt, total, last_ts, last_amount))
    # evict a day after the key's newest event (event-time TTL), clamped
    # ahead of the watermark (a timeout behind it is rejected — keys whose
    # TTL already elapsed get evicted at the next watermark tick)
    state.setTimeoutTimestamp(
        max(last_ts + ACTIVITY_TTL_MS, state.getCurrentWatermarkMs() + 1)
    )
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "order_count_today": [cnt],
            "total_value_today": [round(total, 2)],
            "last_order_ts_ms": [last_ts],
            "last_order_amount": [last_amount],
        }
    )


def customer_activity_stateful(events: DataFrame, watermark: str = "1 day") -> DataFrame:
    """A21/W3: running per-customer purchase activity with TTL state.

    Works on a stream (update mode; state evicted by event-time timeout)
    and on a batch frame (single pass, no prior state) with the same code.
    """
    purchases = events.filter(events["event_type"] == "purchase").select(
        "user_id", "ts", "value"
    )
    if purchases.isStreaming:
        purchases = purchases.withWatermark("ts", watermark)
    return purchases.groupBy("user_id").applyInPandasWithState(
        _track,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
