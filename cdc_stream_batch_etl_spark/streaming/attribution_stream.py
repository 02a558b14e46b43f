"""Streaming multi-touch attribution — credit assignment at purchase
time over the live event feed.

operators/attribution.py computes linear and U-shaped credit in batch
by looking FORWARD to the next purchase; a real-time marketing
pipeline cannot look forward — it BUFFERS each user's touches and
settles credit the moment the purchase arrives. That buffering is this
module: the seventh applyInPandasWithState shape, with per-user state
= the pending (ts, event_id, type) touch list since the last purchase,
bounded by the LOOKBACK_DAYS horizon (touches older than the lookback
relative to the newest event seen are evicted — they could never earn
credit, so state is activity-rate × lookback, not history-sized).

On each purchase the group settles exactly like the batch operator:
pending touches within the lookback, ordered by (ts, event_id), n-way
linear credit and U-shaped position credit; simultaneous purchases
settle in event_id order against the then-current pending list (the
first — smallest event_id — takes the touches, matching the batch
convention that ties resolve to the smallest conv event_id).

Output: one row per SETTLED touch (user_id, conv_id, event_type, pos,
n, linear_credit, position_credit) — the same rows the batch
``attributed_touches`` + credit rules produce, which the parity test
asserts multiset-equal on an ordered feed, per position and credit.

Ordering contract and state algebra: per-key event-time order across
batches (the transitions_stream contract); settlement is deterministic
given that order and NOT idempotent — exactly-once leans on the
checkpointed offset log (kill-restart test).
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
        StructField("ts_us", ArrayType(LongType())),
        StructField("event_id", ArrayType(LongType())),
        StructField("event_type", ArrayType(StringType())),
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
    ts_us, eids, types = (
        state.get if state.exists else ([], [], [])
    )
    pending = [list(t) for t in zip(ts_us, eids, types)]
    chunks = [pdf for pdf in pdfs if len(pdf)]
    if not chunks:
        return
    pdf = chunks[0] if len(chunks) == 1 else pd.concat(chunks, ignore_index=True)
    # touches BEFORE purchases at equal ts: the batch convention is
    # inclusive (a same-instant purchase catches the touch, whatever
    # the event_id order), and same-ts purchases settle smallest
    # event_id first — the batch tie rule
    pdf = pdf.assign(
        __ts_us=pdf["ts"].astype("int64") // 1000,
        __kind=(pdf["event_type"] == "purchase").astype("int64"),
    ).sort_values(
        ["__ts_us", "__kind", "event_id"], kind="stable", ignore_index=True
    )
    out_rows: list[list] = []
    newest = int(pdf["__ts_us"].iloc[-1])
    for ts, eid, etype in zip(
        pdf["__ts_us"], pdf["event_id"], pdf["event_type"]
    ):
        if etype == "purchase":
            out_rows.extend(_settle(user_id, int(eid), int(ts), pending))
            pending = []
        else:
            pending.append([int(ts), int(eid), etype])
    # lookback eviction: a touch that is already out of range of the
    # newest event can never earn credit — bound the state
    pending = [t for t in pending if newest - t[0] <= _LOOKBACK_US]
    state.update(
        (
            [t[0] for t in pending],
            [t[1] for t in pending],
            [t[2] for t in pending],
        )
    )
    if out_rows:
        yield pd.DataFrame(
            out_rows, columns=[f.name for f in OUTPUT_SCHEMA.fields]
        )


def attribution_stream(events: DataFrame) -> DataFrame:
    """One row per settled touch, emitted the moment its purchase
    arrives — the streaming form of multi_touch_attribution's core."""
    return (
        events.select("user_id", "ts", "event_id", "event_type")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
