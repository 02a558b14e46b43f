"""Retention drops run_ts partitions (never `latest`) by count or age."""

from pathlib import Path

from cdc_stream_batch_etl_spark.retention import drop_expired_runs, list_runs


def _mk(out, name, *ts):
    for t in ts:
        d = Path(out) / name / f"run_ts={t}"
        d.mkdir(parents=True)
        (d / "part-0.parquet").write_bytes(b"x")
    (Path(out) / name / "latest").mkdir(parents=True)


def test_keep_last(tmp_path):
    _mk(tmp_path, "seg", "20260101_000000", "20260102_000000", "20260103_000000")
    dropped = drop_expired_runs(str(tmp_path), "seg", keep_last=2)
    assert dropped == ["20260101_000000"]
    assert list_runs(str(tmp_path), "seg") == ["20260102_000000", "20260103_000000"]
    assert (Path(tmp_path) / "seg" / "latest").exists()


def test_older_than(tmp_path):
    _mk(tmp_path, "seg", "20260101_000000", "20260105_000000")
    dropped = drop_expired_runs(str(tmp_path), "seg", older_than_ts="20260103_000000")
    assert dropped == ["20260101_000000"]


def test_requires_a_policy(tmp_path):
    _mk(tmp_path, "seg", "20260101_000000")
    import pytest

    with pytest.raises(ValueError):
        drop_expired_runs(str(tmp_path), "seg")
