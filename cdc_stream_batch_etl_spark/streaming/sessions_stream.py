"""Streaming sessionization — native session_window under a watermark.

operators/sessions.py proves the batch semantics of Catalyst's
``session_window`` against the gaps-and-islands SQL oracle; this module
is its STREAMING twin, the last member of the engine's windowed-
streaming family that was batch-only. Dynamic-gap session windows are
the one windowed aggregation whose state merges windows (two open
sessions fuse when a bridging event arrives), so the streaming form
exercises a merge path ``window()`` aggregations never touch — Spark
seals and emits a session in append mode once the watermark passes
session_end + gap (no more events can extend or bridge it).

Reference anchor: the reference tracks per-entity activity with a
calendar-day read-modify-write (stream_processor.py:111-125); gap
sessions are the production analytics refinement of that, and the
batch/stream parity test (tests/test_sessions_stream.py) holds the two
engines' outputs equal on sealed sessions — the same evidence contract
as trending_products.

Scale: one shuffle on user_id; per-key state is the set of OPEN
sessions only, evicted by the watermark — bounded by activity rate x
gap, invariant to corpus history length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.money import dsum
from ..operators.sessions import GAP
from .analytics import WATERMARK


def user_sessions_stream(events: DataFrame) -> DataFrame:
    """Gap-based user sessions; identical graph batch or streaming
    (append mode emits sessions sealed by the watermark)."""
    src = events.withWatermark("ts", WATERMARK) if events.isStreaming else events
    return (
        src.groupBy(F.session_window(F.col("ts"), GAP).alias("sw"), F.col("user_id"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            dsum("value").alias("total_value"),
        )
        .select(
            "user_id",
            "session_start",
            "session_end",
            "n_events",
            "total_value",
            (
                F.unix_micros(F.col("session_end"))
                - F.unix_micros(F.col("session_start"))
            ).alias("duration_us"),
        )
    )
