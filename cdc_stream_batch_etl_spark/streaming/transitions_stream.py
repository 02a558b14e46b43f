"""Streaming event-transition extraction — the incremental twin of
operators/markov.py's event_transitions.

The batch operator computes (prev_type, next_type) pairs with a
user-keyed lead() window; a live behavior feed needs the same pairs
continuously (transition counts drive next-step prediction and
anomaly-on-behavior alerts), and a lead() window is unbounded-future —
not streamable. The streamable form carries ONE row of per-user state:
the newest event seen so far. Each micro-batch sorts its group slice
in event-time order, emits the transition joining the carried state to
the batch head, then every in-batch adjacency, and stores the batch
tail. O(1) state per user — the minimal stateful shape, smaller than
any session/funnel state, and exactly the reference's "last seen per
key" Redis idiom (stream_processor.py:111-125) applied to transition
mining.

Ordering contract: within a batch, event-time order with the
(ts, event_id) tiebreak (the repo-wide total order); ACROSS batches
the feed must deliver each user's events in event-time order (a
per-key-ordered log — the Kafka keyed-topic guarantee the engine's
other stateful twins assume). Under that contract the emitted pair
multiset equals the batch lead() exactly — asserted by the parity
test, which also replays under both state-store providers.

No timeout: per-user state is one (ts, event_id, type) triple — a few
dozen bytes per active user, the cheapest state in the engine; an
idle-key TTL (stateful.py's pattern) composes trivially if a
deployment wants eviction.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import LongType, StringType, StructField, StructType

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("prev_type", StringType()),
        StructField("next_type", StringType()),
        StructField("prev_ts_us", LongType()),
        StructField("next_ts_us", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_ts_us", LongType()),
        StructField("last_event_id", LongType()),
        StructField("last_type", StringType()),
    ]
)


def _transitions(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return
    # whole-group concat then ONE sort: Arrow may split a group across
    # chunks and chunks are not time-ordered (the funnel_stream lesson)
    pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
    pdf = pdf.assign(__ts_us=pdf["ts"].astype("int64") // 1000).sort_values(
        ["__ts_us", "event_id"], kind="stable", ignore_index=True
    )
    types = pdf["event_type"].tolist()
    ts_us = pdf["__ts_us"].tolist()
    prev_types, next_types, prev_ts, next_ts = [], [], [], []
    if state.exists:
        last_ts_us, _, last_type = state.get
        prev_types.append(last_type)
        next_types.append(types[0])
        prev_ts.append(last_ts_us)
        next_ts.append(ts_us[0])
    for i in range(len(types) - 1):
        prev_types.append(types[i])
        next_types.append(types[i + 1])
        prev_ts.append(ts_us[i])
        next_ts.append(ts_us[i + 1])
    state.update((int(ts_us[-1]), int(pdf["event_id"].iloc[-1]), types[-1]))
    if prev_types:
        yield pd.DataFrame(
            {
                "user_id": user_id,
                "prev_type": prev_types,
                "next_type": next_types,
                "prev_ts_us": prev_ts,
                "next_ts_us": next_ts,
            }
        )


def user_transitions_stream(events: DataFrame) -> DataFrame:
    """(user_id, prev_type, next_type, prev_ts_us, next_ts_us) — one row
    per consecutive event pair, emitted incrementally."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _transitions,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
