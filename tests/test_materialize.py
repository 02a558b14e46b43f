"""functions/materialize.py — the scale-posture switch for lineage-
breaking materialization (r12 verdict #9): localCheckpoint stays the
local-mode default, while SPARK_GRAFT_MATERIALIZE selects a
recomputable persist or a reliable checkpoint for cluster postures.
Every mode must return the same rows; the flag must be read per call."""

import os

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.functions.materialize import materialize


def _frame(spark):
    return spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("m")
    )


def _rows(df):
    return sorted((r.id, r.m) for r in df.collect())


def test_default_is_local_checkpoint(spark, monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_MATERIALIZE", raising=False)
    df = _frame(spark)
    out = materialize(df, eager=True)
    assert _rows(out) == _rows(df)
    # lineage is truncated: the plan bottoms out at the checkpointed RDD
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "LogicalRDD" in plan, plan


def test_persist_mode_keeps_lineage_and_rows(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "persist")
    df = _frame(spark)
    out = materialize(df, eager=True)
    try:
        assert _rows(out) == _rows(df)
        # lineage kept (recomputable on executor loss): still the Range
        # source, not a checkpointed RDD
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" not in plan, plan
        assert out.storageLevel.useMemory or out.storageLevel.useDisk
    finally:
        out.unpersist()


def test_checkpoint_mode_uses_reliable_dir(spark, monkeypatch, tmp_path):
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "checkpoint")
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    df = _frame(spark)
    out = materialize(df, eager=True)
    assert _rows(out) == _rows(df)
    # the reliable checkpoint landed in the configured directory
    written = [
        os.path.join(root, f)
        for root, _, files in os.walk(tmp_path / "ckpt")
        for f in files
    ]
    assert written, "no checkpoint files written"


def test_flag_read_per_call(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MATERIALIZE", "persist")
    a = materialize(_frame(spark))
    monkeypatch.delenv("SPARK_GRAFT_MATERIALIZE")
    b = materialize(_frame(spark))
    try:
        assert _rows(a) == _rows(b)
        plan_b = b._jdf.queryExecution().optimizedPlan().toString()
        assert "LogicalRDD" in plan_b  # back to localCheckpoint
    finally:
        a.unpersist()
