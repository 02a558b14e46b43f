"""Every registered query runs at the smoke scale factor and, when it
declares an oracle, hash-matches DuckDB — the same contract the driver's
CORRECTNESS gate applies at sf0.01."""

import pytest

from cdc_stream_batch_etl_spark import registry

from .oracle import assert_df_matches, run_oracle

registry.load_all()


@pytest.mark.parametrize("name", sorted(registry.QUERIES))
def test_query_matches_oracle(spark, sf_dir, name):
    df = registry.QUERIES[name](spark, sf_dir)
    if name in registry.ORACLES:
        assert_df_matches(df, run_oracle(registry.ORACLES[name], sf_dir))
    else:
        assert df.count() >= 0
