"""The observe()-based quality gate: metrics are collected BY the write
action itself (no extra scans) and still catch the failure cases the
standalone gate catches."""

from cdc_stream_batch_etl_spark.runner import _observed_write, quality_gate


def test_observed_metrics_match_written_data(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k bigint, v string"
    )
    cnt, fails = _observed_write("t", df, str(tmp_path / "out"))
    assert cnt == 3 and fails == []
    back = spark.read.parquet(str(tmp_path / "out"))
    assert back.count() == 3


def test_observed_gate_flags_null_keys_and_matches_standalone(
    spark, tmp_path
):
    df = spark.createDataFrame(
        [(None, "a"), (2, "b")], "k bigint, v string"
    )
    cnt, fails = _observed_write("t", df, str(tmp_path / "out"))
    assert cnt == 2
    assert fails == ["t: 1 null keys in k"]
    # parity with the standalone (extra-action) spelling
    assert quality_gate("t", df) == fails


def test_observed_gate_flags_empty(spark, tmp_path):
    df = spark.createDataFrame([], "k bigint, v string")
    cnt, fails = _observed_write("t", df, str(tmp_path / "out"))
    assert cnt == 0
    assert fails == ["t: empty result"]
