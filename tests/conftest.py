import os

import pytest


SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="session")
def spark():
    from cdc_stream_batch_etl_spark.session import get_spark

    s = get_spark(app="tests", cores=4, shuffle_partitions=8, driver_memory="8g")
    yield s
    s.stop()


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR


@pytest.fixture(params=["hdfs", "rocksdb"])
def state_provider(spark, request):
    """Run a stateful-streaming test under both state store providers.
    The provider is a session conf read at query START, so setting it
    here covers every query the test starts; restored afterwards."""
    from cdc_stream_batch_etl_spark.session import use_rocksdb_state_store

    use_rocksdb_state_store(spark, request.param == "rocksdb")
    yield request.param
    use_rocksdb_state_store(spark, False)


def assert_state_provider_engaged(ckpt: str, provider: str) -> None:
    """The provider conf is silently ignored if misspelled — prove the
    intended store actually wrote the checkpoint: RocksDB commits
    .changelog/.zip artifacts, the HDFS-backed store .delta/.snapshot
    files."""
    names = [
        n
        for _, _, files in os.walk(os.path.join(ckpt, "state"))
        for n in files
    ]
    if provider == "rocksdb":
        assert any(n.endswith((".changelog", ".zip")) for n in names), names[:10]
        assert not any(n.endswith(".delta") for n in names)
    else:
        assert any(n.endswith((".delta", ".snapshot")) for n in names), names[:10]
