"""Streaming multi-touch attribution — credit assignment at purchase
time over the live event feed, reorder-tolerant under a watermark.

operators/attribution.py computes linear and U-shaped credit in batch
by looking FORWARD to the next purchase; a real-time marketing
pipeline cannot look forward — it buffers each user's touches and
settles credit when the purchase arrives. Until round 10 settlement
happened the moment a purchase was PROCESSED, which required each
user's events to arrive in event-time order across micro-batches (and
even then a same-instant touch/purchase pair split across batches with
the purchase first would never settle — the r10 ADVICE item). This
round moves settlement behind the watermark (the r10 verdict's #2
ask), the sessions/trending sealing discipline:

  state = (a) pending: SEALED touches since the last sealed purchase,
          in event order, bounded by the lookback (a touch whose
          watermark age exceeds LOOKBACK_DAYS can never earn credit —
          every future-sealing purchase carries conv_ts ≥ watermark);
          (b) a buffer of UNSEALED events (touches AND purchases)
          whose event time the watermark has not passed yet.

Each invocation merges the batch into the buffer, sorts by the batch
operator's settle order (ts, purchase-last, event_id — a same-instant
purchase catches the touch, and simultaneous purchases settle smallest
event_id first), seals the prefix strictly older than the watermark,
and replays it: sealed touch → pending, sealed purchase → settle
pending within the lookback with the batch operator's linear and
U-shaped rules. Late-arriving events inside the horizon — including a
same-instant touch delivered a batch AFTER its purchase — slot into
the buffer and settle correctly; the ordered-log contract is gone. An
event-time timeout (min unsealed ts, clamped past the watermark) seals
idle keys; availableNow runs fire it on the trailing no-data batch.

Output: one row per SETTLED touch (user_id, conv_id, event_type, pos,
n, linear_credit, position_credit) — the same rows the batch
``attributed_touches`` + credit rules produce. The parity test
shuffles arrivals across micro-batches (bounded displacement under a
small horizon, and arbitrary permutation under a covering horizon) and
asserts the multiset equal to the batch twin, both state-store
providers, restart-exact. Events later than the horizon are dropped by
the engine — the standard watermark discipline, deterministic and
observable, never a silent mis-credit.

State bound: lookback-windowed pending touches + arrival-rate ×
horizon unsealed events per user — invariant to history length.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..operators.attribution import _LOOKBACK_US

#: default reorder horizon (see transitions_stream.WATERMARK)
WATERMARK = "1 hour"

OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("conv_id", LongType()),
        StructField("event_type", StringType()),
        StructField("pos", LongType()),
        StructField("n", LongType()),
        StructField("linear_credit", DoubleType()),
        StructField("position_credit", DoubleType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("pend_ts_us", ArrayType(LongType())),
        StructField("pend_event_id", ArrayType(LongType())),
        StructField("pend_type", ArrayType(StringType())),
        StructField("buf_ts_us", ArrayType(LongType())),
        StructField("buf_event_id", ArrayType(LongType())),
        StructField("buf_kind", ArrayType(LongType())),
        StructField("buf_type", ArrayType(StringType())),
    ]
)


def position_weight(pos: int, n: int) -> float:
    """The batch operator's U-shaped rule: n=1 → 1.0; n=2 → 0.5/0.5;
    n≥3 → 0.4 first, 0.4 last, 0.2/(n−2) each middle."""
    if n == 1:
        return 1.0
    if n == 2:
        return 0.5
    if pos == 1 or pos == n:
        return 0.4
    return 0.2 / (n - 2)


def _settle(user_id: int, conv_id: int, conv_ts: int, pending: list) -> list:
    """Rows for one purchase settling its in-lookback pending touches
    (pending is (ts_us, event_id, type), already event-time sorted)."""
    live = [t for t in pending if conv_ts - t[0] <= _LOOKBACK_US]
    n = len(live)
    return [
        [
            user_id,
            conv_id,
            etype,
            pos,
            n,
            1.0 / n,
            position_weight(pos, n),
        ]
        for pos, (_, _, etype) in enumerate(live, start=1)
    ]


def _update(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        pts, peid, ptype, bts, beid, bkind, btype = state.get
    else:
        pts, peid, ptype, bts, beid, bkind, btype = [], [], [], [], [], [], []
    pending = [list(t) for t in zip(pts, peid, ptype)]
    buf = [list(t) for t in zip(bts, beid, bkind, btype)]

    chunks = [pdf for pdf in pdfs if len(pdf)]
    if chunks:
        pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
        ts_us = pdf["ts"].astype("int64") // 1000
        kind = (pdf["event_type"] == "purchase").astype("int64")
        buf.extend(
            [int(t), int(e), int(k), ty]
            for t, e, k, ty in zip(ts_us, pdf["event_id"], kind, pdf["event_type"])
        )
    # the batch settle order: touches BEFORE purchases at equal ts
    # (inclusive same-instant match), same-ts purchases smallest
    # event_id first (the batch tie rule)
    buf.sort(key=lambda t: (t[0], t[2], t[1]))
    wm_us = state.getCurrentWatermarkMs() * 1000
    n_sealed = 0
    while n_sealed < len(buf) and buf[n_sealed][0] < wm_us:
        n_sealed += 1
    sealed, buf = buf[:n_sealed], buf[n_sealed:]

    out_rows: list[list] = []
    for ts, eid, k, etype in sealed:
        if k:
            out_rows.extend(_settle(user_id, eid, ts, pending))
            pending = []
        else:
            pending.append([ts, eid, etype])
    # lookback eviction against the WATERMARK: every purchase still to
    # seal (buffered or future) has conv_ts ≥ wm_us, so a pending touch
    # older than wm_us − lookback can never earn credit — state stays
    # bounded even for keys that never purchase
    pending = [t for t in pending if wm_us - t[0] <= _LOOKBACK_US]

    if pending or buf:
        state.update(
            (
                [t[0] for t in pending],
                [t[1] for t in pending],
                [t[2] for t in pending],
                [t[0] for t in buf],
                [t[1] for t in buf],
                [t[2] for t in buf],
                [t[3] for t in buf],
            )
        )
        if buf:
            state.setTimeoutTimestamp(max(buf[0][0] // 1000, wm_us // 1000 + 1))
        else:
            # pending-only key (r11 ADVICE): with no unsealed events the
            # key would never be re-invoked and sealed touches would
            # linger forever for a silent user. Wake when the NEWEST
            # pending touch ages past the lookback — at that watermark
            # the eviction above empties pending and state.remove()
            # fires. (pending is sealed in event-time order, so [-1] is
            # the newest.)
            state.setTimeoutTimestamp(
                max((pending[-1][0] + _LOOKBACK_US) // 1000 + 1, wm_us // 1000 + 1)
            )
    else:
        # nothing pending, nothing buffered: the key is forgettable —
        # a later event re-creates state from empty, losing nothing
        state.remove()
    if out_rows:
        yield pd.DataFrame(
            out_rows, columns=[f.name for f in OUTPUT_SCHEMA.fields]
        )


def attribution_stream(events: DataFrame, watermark: str = WATERMARK) -> DataFrame:
    """One row per settled touch, emitted once the watermark seals its
    purchase — the streaming form of multi_touch_attribution's core."""
    src = events.withWatermark("ts", watermark) if events.isStreaming else events
    return (
        src.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
