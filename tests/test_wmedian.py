"""Weighted-median semantics pinned against a direct numpy-style
computation on the driver data — the operator's cumulative-weight
spelling must equal the brute-force 'repeat each price quantity times
and take the lower median' definition."""

from cdc_stream_batch_etl_spark.operators.wmedian import (
    weighted_median_price,
)


def test_matches_bruteforce_expansion(spark, sf_dir):
    import duckdb

    out = {
        (r.l_returnflag, r.l_linestatus): r
        for r in weighted_median_price(spark, sf_dir).collect()
    }
    # Brute force: expand each line item into l_quantity unit rows, take
    # the lower median of the expanded multiset per group.
    brute = duckdb.sql(
        f"""
        WITH expanded AS (
          SELECT l_returnflag, l_linestatus,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS cents
          FROM read_parquet('{sf_dir}/lineitem.parquet')
          CROSS JOIN UNNEST(range(CAST(l_quantity AS BIGINT))) AS u
        ),
        ranked AS (
          SELECT *, row_number() OVER (
                      PARTITION BY l_returnflag, l_linestatus
                      ORDER BY cents) AS rn,
                 count(*) OVER (
                      PARTITION BY l_returnflag, l_linestatus) AS n
          FROM expanded
        )
        SELECT l_returnflag, l_linestatus, min(n) AS n,
               min(CASE WHEN 2 * rn >= n THEN cents END) AS med
        FROM ranked GROUP BY 1, 2
        """
    ).fetchall()
    assert len(brute) == len(out) > 0
    for rf, ls, n, med in brute:
        r = out[(rf, ls)]
        assert r.units_total == n
        assert r.wmedian_cents == med
