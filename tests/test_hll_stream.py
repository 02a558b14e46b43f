"""Streaming HLL contracts: registers are a commutative idempotent
max-monoid, so the stream's final sketch equals the batch operator's
exactly under adversarial batching, and a kill-restart resumes the
register state without double effects (max is idempotent — replay is
harmless by algebra, offsets make it exact by construction)."""

import pytest
from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.operators.hll import hll_distinct_by_type
from cdc_stream_batch_etl_spark.streaming.hll_stream import hll_stream, readout


def _final_rows(spark, out):
    final = {}
    for r in spark.read.parquet(out).collect():
        prev = final.get(r.event_type)
        if prev is None or r.bid > prev.bid:
            final[r.event_type] = r
    return final


def test_hll_stream_final_state_equals_batch(spark, sf_dir, tmp_path, state_provider):
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    src = tmp_path / "src"
    src.mkdir()
    n = ev.count()
    # uneven reverse-ordered files — adversarial batching; max-merge
    # must land on the same registers regardless
    ev.orderBy(F.desc("event_id")).limit(n // 5).coalesce(1).write.parquet(
        str(src / "b0")
    )
    ev.orderBy(F.desc("event_id")).offset(n // 5).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src) + "/b*")
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    q = (
        hll_stream(stream)
        .writeStream.foreachBatch(
            lambda bdf, bid: bdf.withColumn("bid", F.lit(bid))
            .write.mode("append")
            .parquet(out)
        )
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    final = _final_rows(spark, out)
    batch = {r.event_type: r for r in hll_distinct_by_type(spark, sf_dir).collect()}
    from tests.conftest import assert_state_provider_engaged

    assert_state_provider_engaged(ckpt, state_provider)
    assert set(final) == set(batch)
    for et, b in batch.items():
        s = final[et]
        assert (s.registers_used, s.empty_registers, s.max_rho) == (
            b.registers_used,
            b.empty_registers,
            b.max_rho,
        ), et
        assert s.raw_estimate == b.raw_estimate, et


def test_hll_stream_restart_resumes_registers(spark, sf_dir, tmp_path):
    import shutil

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    staging = str(tmp_path / "staging")
    src = str(tmp_path / "src")
    n = ev.count()
    ev.limit(n // 2).coalesce(1).write.parquet(f"{staging}/b0")
    ev.offset(n // 2).coalesce(1).write.parquet(f"{staging}/b1")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def _run():
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/b*")
        )
        q = (
            hll_stream(stream)
            .writeStream.foreachBatch(
                lambda bdf, bid: bdf.withColumn("bid", F.lit(bid))
                .write.mode("append")
                .parquet(out)
            )
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    shutil.copytree(f"{staging}/b0", f"{src}/b0")
    _run()
    shutil.copytree(f"{staging}/b1", f"{src}/b1")
    _run()  # same checkpoint: resumes with the b0 registers in state
    final = _final_rows(spark, out)
    batch = {r.event_type: r for r in hll_distinct_by_type(spark, sf_dir).collect()}
    for et, b in batch.items():
        s = final[et]
        assert (s.registers_used, s.max_rho, s.raw_estimate) == (
            b.registers_used,
            b.max_rho,
            b.raw_estimate,
        ), et


def test_readout_matches_batch_arithmetic():
    """The Python read-out must be the batch plan's exact arithmetic:
    identical fold order (bucket order), identical closed-form empty
    mass — spot-checked on hand register arrays."""
    from cdc_stream_batch_etl_spark.operators.hll import ALPHA_M, HLL_M, _POW2_NEG

    regs = [0] * HLL_M
    used, empty, mx, est = readout(regs)
    assert (used, empty, mx) == (0, HLL_M, 0)
    assert est == ALPHA_M * float(HLL_M) * float(HLL_M) / float(HLL_M)

    regs[7] = 3
    regs[200] = 1
    used, empty, mx, est = readout(regs)
    assert (used, empty, mx) == (2, HLL_M - 2, 3)
    expected_sum = _POW2_NEG[3] + _POW2_NEG[1] + (HLL_M - 2) * 1.0
    assert est == pytest.approx(
        ALPHA_M * HLL_M * HLL_M / expected_sum, abs=0
    )
