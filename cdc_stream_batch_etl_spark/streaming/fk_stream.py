"""Streaming referential-integrity monitor — live FK-orphan alerts.

The batch audit (operators/fkaudit.py) reports orphans after the fact;
a CDC pipeline wants them AS THEY ARRIVE: an event naming a user_id
with no customer row is either out-of-order replay or upstream
corruption, and the alert is most useful inside the ingestion window.
This is the streaming twin: the event stream LEFT ANTI joined against
the customer dimension — Spark's stream-static anti-join, which probes
the static side per micro-batch and keeps ZERO streaming state (no
watermark needed: each event is decided within its own micro-batch,
nothing buffers).

The static side is re-read per trigger, so a customer table that
gains rows between triggers reduces (never grows) the orphan set going
forward — matching CDC semantics where a late parent INSERT heals
subsequent children but already-alerted orphans stand (reference:
python/consumer_batch.py applies tables independently, which is
exactly how such windows open).

Scale: the anti-join build side is the customer key column only
(pruned scan); at dimension sizes past broadcast, Spark degrades it to
a shuffled anti-join per micro-batch — same AQE contract as the batch
twin. Alert volume is orphan-sized, not stream-sized.

Parity: tests/test_fk_stream.py drives planted micro-batches (orphans
straddling batch boundaries) and asserts the union of alerts equals
the batch twin on the same data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_event_alerts(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Events whose user_id has no customer row — works unchanged on a
    streaming `events` (stream-static anti-join) or a batch frame (the
    batch twin used for parity)."""
    keys = customers.select(F.col("c_custkey").alias("user_id")).distinct()
    return events.join(keys, "user_id", "left_anti").select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.lit("fk_orphan:events.user_id->customer.c_custkey").alias("alert"),
    )
