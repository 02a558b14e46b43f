"""Semantic properties of the round-4 selection/survivorship operators,
beyond the oracle hash-match test_queries.py already applies."""

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.dedup.survivorship import (
    cluster_representatives,
    incremental_dedup,
)
from cdc_stream_batch_etl_spark.text.importance import TARGET_SOURCE, dsir_importance


def test_dsir_target_docs_score_higher(spark, sf_dir):
    """The point of importance weighting: documents FROM the target domain
    must average a higher importance than the rest of the corpus (the
    model was fit to prefer them)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "source")
    scored = dsir_importance(spark, sf_dir).join(docs, "doc_id")
    rows = (
        scored.groupBy(F.col("source") == TARGET_SOURCE)
        .agg(F.avg("avg_importance").alias("m"))
        .collect()
    )
    means = {r[0]: r["m"] for r in rows}
    assert means[True] > means[False]


def test_dsir_ratios_bracket_the_mean(spark, sf_dir):
    df = dsir_importance(spark, sf_dir)
    bad = df.filter(
        (F.col("min_ratio") > F.col("avg_importance") + 1e-9)
        | (F.col("max_ratio") < F.col("avg_importance") - 1e-9)
        | (F.col("min_ratio") <= 0)
    )
    assert bad.count() == 0


def test_cluster_representative_is_best_member(spark, sf_dir):
    """rep_chars must be the cluster max of n_chars, and the rep must be a
    member of its own cluster."""
    from cdc_stream_batch_etl_spark.dedup.components import dedup_components

    reps = cluster_representatives(spark, sf_dir)
    labels = dedup_components(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id", "n_chars")
    member_max = (
        labels.join(docs, "doc_id")
        .groupBy("canonical_id")
        .agg(F.max("n_chars").alias("best_chars"))
    )
    joined = reps.join(member_max, "canonical_id")
    assert joined.filter(F.col("rep_chars") != F.col("best_chars")).count() == 0
    # rep is a member
    membership = reps.join(
        labels.select(F.col("doc_id").alias("rep_doc_id"), "canonical_id"),
        ["canonical_id", "rep_doc_id"],
        "left_semi",
    )
    assert membership.count() == reps.count()


def test_incremental_dedup_statuses_partition_the_batch(spark, sf_dir):
    df = incremental_dedup(spark, sf_dir)
    incoming = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 2 == 1)
        .count()
    )
    assert df.count() == incoming
    # kept docs have unique digests within the batch
    kept = df.filter(F.col("status") == "kept")
    assert kept.count() == kept.select("content_md5").distinct().count()
    # no kept digest may exist in the base shard
    base_digests = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("doc_id") % 2 == 0)
        .select(F.md5(F.lower(F.trim(F.col("text")))).alias("content_md5"))
        .distinct()
    )
    assert kept.join(base_digests, "content_md5", "left_semi").count() == 0


def test_quality_classifier_decision_boundary_non_vacuous(spark, sf_dir):
    """The fixed weights must actually split the fixture corpus — if every
    doc lands on one side, the gate is decoration, not a filter."""
    from cdc_stream_batch_etl_spark.text.classifier import quality_classifier

    df = quality_classifier(spark, sf_dir)
    kept = df.filter(F.col("keep")).count()
    assert 0 < kept < df.count()


def test_source_semantic_diversity_nonnegative(spark, sf_dir):
    """E||x||^2 - ||Ex||^2 is a variance: negative values would mean the
    two fold paths disagree."""
    from cdc_stream_batch_etl_spark.similarity.diversity import source_semantic_diversity

    df = source_semantic_diversity(spark, sf_dir)
    assert df.filter(F.col("diversity") < 0).count() == 0
    assert df.filter(F.col("n_docs") <= 0).count() == 0
