"""SparkSession factory.

The reference (c2012mato/cdc-stream-batch-etl) has no execution engine of its
own — it pushes SQL to Postgres and transforms in pandas (see
/root/reference/python/batch_processor.py:24-97, utils.py:43-50). Here the
session IS the engine: AQE on, UTC timezone pinned (oracle parity), Arrow
enabled for the few pandas-UDF paths.

Scale notes (100 TB):
- ``spark.sql.adaptive.enabled`` + coalescePartitions + skewJoin let the
  runtime re-plan shuffle partition counts and split skewed join partitions.
- ``spark.sql.shuffle.partitions`` defaults to the local core count here;
  on a 1000-executor cluster it should be ~2-3x total cores (set via
  ``SPARK_GRAFT_SHUFFLE_PARTITIONS``).
- parquet filter pushdown / column pruning are left at their defaults (on).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app: str = "cdc-stream-batch-etl-spark",
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the session, tuned for local[N] single-JVM mode."""
    cores = cores if cores is not None else int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    shuffle_partitions = (
        shuffle_partitions
        if shuffle_partitions is not None
        else int(os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", str(cores)))
    )
    driver_memory = driver_memory or os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")

    state_store = os.environ.get("SPARK_GRAFT_STATE_STORE", "hdfs").lower()

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    if state_store == "rocksdb":
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        ).config(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


#: Spark's bundled RocksDB state store — the >JVM-heap streaming-state
#: path. The default HDFS-backed provider keeps every store's working
#: set on-heap; at 100 TB-scale state (e.g. W10's latest-state cache,
#: hash-bucketed at 4096 × ~25 GB, streaming/cdc_stream.py) that heap
#: residency is the bottleneck, while RocksDB keeps state off-heap on
#: local SSD with the same checkpoint contract.
ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state_store(spark: SparkSession, enabled: bool = True) -> None:
    """Switch the streaming state store provider for queries STARTED
    after this call (the provider is fixed per query at start and
    recorded in its checkpoint — restart a query to migrate it).

    Changelog checkpointing is enabled with RocksDB: per-batch uploads
    become the key delta instead of full SST snapshots, which is the
    difference between O(changed keys) and O(store size) commit cost on
    large stores. Env default: SPARK_GRAFT_STATE_STORE=rocksdb makes
    get_spark sessions start with it on."""
    if enabled:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
            "true",
        )
    else:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        spark.conf.unset(
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
        )


def pin_session_for_correctness(spark: SparkSession) -> None:
    """Settings every query assumes, applied idempotently to ANY session
    (the correctness driver may hand us a session we didn't build).

    UTC matters because ``to_date(timestamp)`` / ``datediff`` are
    session-timezone-dependent in Spark while the DuckDB oracle is tz-naive.
    The nanos pin lets the events table (TIMESTAMP(NANOS) parquet, which
    Spark otherwise refuses to read) surface as LongType; catalog.load_table
    converts it back to a microsecond timestamp.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
