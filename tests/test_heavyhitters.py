"""CMS-guided heavy hitters: the exact-verify pass must return EXACTLY
the SQL truth even when the sketch is starved into heavy collisions,
and the candidate filter must genuinely prune when it isn't."""

from pyspark.sql import functions as F

from cdc_stream_batch_etl_spark.operators.heavyhitters import (
    cms_heavy_hitters,
)


def _planted(spark):
    # skew plant: keys 1..5 appear 400,300,200,100,60 times; keys
    # 1000..1199 appear twice each (N = 1460, 0.02 support → T = 30)
    rows = []
    for k, n in [(1, 400), (2, 300), (3, 200), (4, 100), (5, 60)]:
        rows += [(k,)] * n
    for k in range(1000, 1200):
        rows += [(k,)] * 2
    return spark.createDataFrame(rows, "k bigint").repartition(8)


def test_exact_answer_survives_starved_sketch(spark):
    df = _planted(spark)
    # width 4 → massive collisions → many false positives; the exact
    # pass must still emit precisely the 5 true heavy hitters
    out = cms_heavy_hitters(df, "k", support=0.02, width=4).collect()
    assert [(r.k, r.cnt) for r in out] == [
        (1, 400),
        (2, 300),
        (3, 200),
        (4, 100),
        (5, 60),
    ]
    # CMS one-sided guarantee: estimate never below the true count
    for r in out:
        assert r.cms_estimate >= r.cnt


def test_candidate_filter_prunes_at_healthy_width(spark):
    df = _planted(spark)
    from cdc_stream_batch_etl_spark.operators import heavyhitters as hh
    from cdc_stream_batch_etl_spark.dedup import hash64_expr

    # reproduce the candidate stage at width 4096 and assert the tail
    # keys (count 2 vs T=30) are pruned BEFORE the exact pass
    n = df.count()
    t = -(-n * 2 // 100)
    cells = (
        df.select("k", F.explode(F.sequence(F.lit(0), F.lit(hh.HH_DEPTH - 1))).alias("d"))
        .select(
            "d",
            (F.expr(hash64_expr("concat(cast(d as string), ':', cast(k as string))")) % 4096).alias("bucket"),
        )
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("counter"))
    )
    est = (
        df.select("k").distinct()
        .select("k", F.explode(F.sequence(F.lit(0), F.lit(hh.HH_DEPTH - 1))).alias("d"))
        .withColumn(
            "bucket",
            F.expr(hash64_expr("concat(cast(d as string), ':', cast(k as string))")) % 4096,
        )
        .join(cells, ["d", "bucket"])
        .groupBy("k")
        .agg(F.min("counter").alias("est"))
    )
    candidates = est.filter(F.col("est") >= t).count()
    assert candidates <= 20, "width 4096 should prune the 200-key tail"
    assert candidates >= 5, "true heavy hitters must never be pruned"
