"""Structured Streaming CDC pipeline: envelope parse, stats maintenance,
latest-wins state upsert with deletes.

Reference: the CDC processor consumes 4 Debezium topics and per-event
maintains Redis change-log/stats/cache keys (/root/reference/python/
cdc_processor.py:23-212, utils.py:86-94). Here each Redis key family is a
streaming query over one source (SURVEY §3.2 "Spark shape"):

- change-log append      → the parsed stream itself (sink: append)
- cdc:stats counters     → groupBy(table, op).count(), outputMode update
- entity caches (W10)    → foreachBatch latest-wins merge (upsert + delete)

Exactly-once: the reference is at-least-once (auto-commit consumer,
SURVEY §2.9 W12); Structured Streaming checkpointing + idempotent
foreachBatch merge gives exactly-once to the state tables — strictly
stronger, documented deviation.

Kafka vs files: production wiring is `readStream.format("kafka")` (see
sources/kafka.py); tests drive the identical DataFrame graph from a file
source — the transformation code below is source-agnostic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import schemas


def parse_envelope(raw: DataFrame, table: str) -> DataFrame:
    """S5: Kafka value bytes → typed envelope → flat change frame
    (cdc_processor.py:26-43). `raw` must have a `value` (string/binary)
    column, e.g. from readStream.format('kafka')."""
    env = schemas.cdc_envelope(schemas.TABLE_SCHEMAS[table])
    return (
        raw.select(F.from_json(F.col("value").cast("string"), env).alias("e"))
        .select(
            F.col("e.source.table").alias("table"),
            F.col("e.op").alias("op"),
            F.col("e.ts_ms").alias("ts_ms"),
            F.timestamp_millis(F.col("e.ts_ms")).alias("event_time"),
            F.col("e.before").alias("before"),
            F.col("e.after").alias("after"),
        )
    )


def cdc_stats_stream(changes: DataFrame) -> DataFrame:
    """A15/A16: running (table, op) counters — the reference's
    cdc:stats:{table}:{op} Redis counters (cdc_processor.py:46-51) as a
    streaming aggregate (state store replaces Redis)."""
    return changes.groupBy("table", "op").agg(F.count("*").alias("event_count"))


def revenue_stream(changes: DataFrame) -> DataFrame:
    """A17: running revenue total over order creates
    (cdc_processor.py:124-127): metrics:revenue:total as a streaming sum."""
    return (
        changes.filter((F.col("table") == "orders") & (F.col("op") == "c"))
        .select(F.col("after.total_amount").alias("total_amount"))
        .agg(F.sum(F.col("total_amount").cast("decimal(18,2)")).cast("double").alias("total_revenue"))
    )


def _merge_latest(state_path: str):
    """foreachBatch body: latest-wins upsert + delete against a parquet
    state table (W10, cdc_processor.py:72-100).

    Per micro-batch: (1) dedup batch to newest event per pk by
    (ts_ms, batch monotonic id) — resolves c→u→d sequences inside one
    batch (SURVEY §7 hard part); (2) union with current state, keep the
    newest version per pk; (3) atomically overwrite.

    Deletes are retained as TOMBSTONES (op='d' rows kept in state, hidden
    by read_latest_state): dropping them would let a late/re-ordered
    upsert with an older ts_ms resurrect a deleted key — the W11
    out-of-order hazard. Tombstone GC maps to retention policy
    (partition-drop after the watermark horizon), not merge logic.

    Scale: with Delta/Iceberg this becomes a keyed MERGE INTO (no full
    rewrite); parquet overwrite keeps v1 dependency-free and the dedup
    logic — the semantically hard part — identical. State is partitioned
    by pk hash via the shuffle in the window dedup.
    """

    def apply(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        spark = batch.sparkSession
        w = Window.partitionBy("pk").orderBy(F.desc("ts_ms"), F.desc("seq"))
        latest_in_batch = (
            batch.withColumn("seq", F.monotonically_increasing_id())
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select("pk", "op", "ts_ms", "payload_json")
            # epoch id persists into state so cross-batch ts_ms ties break
            # deterministically toward the later arrival (the reference's
            # last-write-wins Redis SET); within-batch ties already broke
            # by seq above
            .withColumn("batch_seq", F.lit(batch_id).cast("long"))
        )
        try:
            current = spark.read.parquet(state_path)
            merged_src = current.unionByName(latest_in_batch)
        except Exception:  # first batch: no state yet
            merged_src = latest_in_batch
        w2 = Window.partitionBy("pk").orderBy(F.desc("ts_ms"), F.desc("batch_seq"))
        new_state = (
            merged_src.withColumn("rn", F.row_number().over(w2))
            .filter(F.col("rn") == 1)
            .select("pk", "op", "ts_ms", "payload_json", "batch_seq")
        )
        # break lineage from the files about to be replaced (distributed
        # materialization — no driver-side collect)
        new_state.localCheckpoint(eager=True).write.mode("overwrite").parquet(state_path)

    return apply


def read_latest_state(spark: SparkSession, state_path: str) -> DataFrame:
    """The queryable cache view: live rows only (tombstones hidden)."""
    return spark.read.parquet(state_path).filter(F.col("op") != "d")


def latest_state_query(changes: DataFrame, table: str, state_path: str, checkpoint: str):
    """Start the W10 cache-maintenance streaming query for one table.
    'r' (snapshot read) ops upsert like creates (SURVEY W13)."""
    keyed = (
        changes.filter(F.col("table") == table)
        .select(
            F.coalesce(F.col("after.id"), F.col("before.id")).alias("pk"),
            "op",
            "ts_ms",
            F.to_json(F.coalesce(F.col("after"), F.col("before"))).alias("payload_json"),
        )
    )
    return (
        keyed.writeStream.outputMode("append")
        .foreachBatch(_merge_latest(state_path))
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
