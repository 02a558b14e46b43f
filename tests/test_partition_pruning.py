"""Partition-pruning contract: a predicate on the partition column must
become PartitionFilters — the non-matching directories are never read.
This plus bucketing (test_bucketing.py) is the full 100 TB layout story:
partitioning prunes the scan, bucketing kills the join shuffle."""

import pytest
from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.catalog import load_table, write_partitioned
from cdc_stream_batch_etl_spark.plans.inspect import plan_string


@pytest.fixture(scope="module")
def day_partitioned_events(spark, sf_dir, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("part") / "events_by_day")
    events = load_table(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    write_partitioned(events, path, "event_date")
    return path


def test_partition_filter_prunes_scan(spark, day_partitioned_events):
    df = spark.read.parquet(day_partitioned_events).filter(
        F.col("event_date") == "2024-01-03"
    )
    plan = plan_string(df)
    assert "PartitionFilters" in plan, plan
    # the date predicate must appear as a partition filter on the scan,
    # not (only) as a post-scan data Filter
    seg = plan.split("PartitionFilters", 1)[1].split("\n")[0]
    assert "event_date" in seg, plan


def test_pruned_read_touches_only_matching_files(spark, day_partitioned_events):
    import glob

    n_days = len(glob.glob(day_partitioned_events + "/event_date=*"))
    assert n_days > 1  # the fixture spans a month of events
    pruned = spark.read.parquet(day_partitioned_events).filter(
        F.col("event_date") == "2024-01-03"
    )
    full = spark.read.parquet(day_partitioned_events)
    # rows under the one matching directory only
    assert pruned.count() < full.count()
    one_day = (
        full.filter(F.col("event_date") == "2024-01-03").count()
    )
    assert pruned.count() == one_day
