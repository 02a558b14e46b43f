"""Bucketed state-table guarantees (VERDICT r1 item 7 / ADVICE medium):

- a micro-batch rewrites ONLY the pk-hash bucket partitions it touches —
  untouched bucket files stay byte-identical on disk;
- an unreadable (corrupt) state table fails the batch instead of being
  mistaken for 'first batch' and silently wiped.
"""

import hashlib
import json
import pathlib

import pytest
from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.streaming.cdc_stream import (
    N_STATE_BUCKETS,
    _merge_latest,
    read_latest_state,
)

SCHEMA = "pk long, op string, ts_ms long, payload_json string"


def _batch(spark, rows):
    return spark.createDataFrame(
        [(k, op, ts, json.dumps({"id": k})) for (k, op, ts) in rows], SCHEMA
    )


def _snapshot(state: str) -> dict[str, str]:
    return {
        str(p.relative_to(state)): hashlib.md5(p.read_bytes()).hexdigest()
        for p in pathlib.Path(state).rglob("*.parquet")
    }


def _bucket(spark, pk: int) -> int:
    return spark.range(1).select(
        F.pmod(F.hash(F.lit(pk).cast("long")), F.lit(N_STATE_BUCKETS)).alias("b")
    ).first()["b"]


def test_untouched_buckets_byte_identical(spark, tmp_path):
    state = str(tmp_path / "state")
    apply = _merge_latest(state)
    apply(_batch(spark, [(k, "c", 1) for k in range(60)]), 0)
    before = _snapshot(state)
    assert len({p.split("/")[0] for p in before}) > 1, "need multiple buckets"

    apply(_batch(spark, [(7, "u", 2)]), 1)
    after = _snapshot(state)

    b7 = f"bucket={_bucket(spark, 7)}"
    for path, digest in before.items():
        if not path.startswith(b7):
            assert after.get(path) == digest, f"untouched {path} was rewritten"
    # the touched bucket WAS rewritten (its old files are gone)
    assert all(p not in after for p in before if p.startswith(b7))

    got = {r.pk: (r.ts_ms, r.op) for r in read_latest_state(spark, state).collect()}
    expect = {k: (1, "c") for k in range(60)}
    expect[7] = (2, "u")
    assert got == expect


def test_empty_batch_is_a_noop(spark, tmp_path):
    state = str(tmp_path / "state")
    apply = _merge_latest(state)
    apply(_batch(spark, [(1, "c", 1), (2, "c", 1)]), 0)
    before = _snapshot(state)
    apply(spark.createDataFrame([], SCHEMA), 1)
    assert _snapshot(state) == before


def test_unreadable_state_fails_batch_instead_of_wiping(spark, tmp_path):
    state_dir = tmp_path / "state"
    apply = _merge_latest(str(state_dir))
    apply(_batch(spark, [(k, "c", 1) for k in range(20)]), 0)

    # corrupt every state file: a read failure is NOT 'first batch'
    files = list(state_dir.rglob("*.parquet"))
    assert files
    for p in files:
        p.write_bytes(b"not a parquet file")

    with pytest.raises(Exception):
        apply(_batch(spark, [(1, "u", 2)]), 1)
    # the corrupt (pre-existing) state was left in place, not overwritten
    # with a batch-only table
    for p in files:
        assert p.read_bytes() == b"not a parquet file"
