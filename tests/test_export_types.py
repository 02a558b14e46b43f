"""Export-type conventions, registry-wide.

The driver's value-hash is type-KIND-sensitive. Two traps are now locked
by tests instead of convention:

1. DecimalType at export (the r11 ``time_series_cv_folds`` hash-fail):
   Spark decimal(p,s) reaches pandas as object-dtype ``decimal.Decimal``
   cells while DuckDB decimals reach pandas as float64, so a value-exact
   result still hash-mismatches. Rule: decimal arithmetic INSIDE the
   plan is encouraged (exact money sums), but every exported column must
   be cast to double / string / bigint.

2. (guard) No exported column may be of a type pandas renders as a
   non-hashable object other than list/array (map/struct would break the
   driver's sort-by-columns step) unless the query is rows-only.

Schema inspection is analysis-only (no job runs), so this sweeps all
registered queries in seconds.
"""

from pyspark.sql import types as T

from cdc_stream_batch_etl_spark import registry

registry.load_all()


def _decimal_fields(schema: T.StructType) -> list[str]:
    return [f.name for f in schema.fields if isinstance(f.dataType, T.DecimalType)]


def test_no_query_exports_decimal_type(spark, sf_dir):
    """No registered query — oracled OR rows-only — may export
    DecimalType (r11 verdict ask #1; tscv was the only violator)."""
    bad: dict[str, list[str]] = {}
    for name, fn in registry.QUERIES.items():
        cols = _decimal_fields(fn(spark, sf_dir).schema)
        if cols:
            bad[name] = cols
    assert not bad, (
        f"DecimalType-exporting queries (cast to double at export in BOTH "
        f"the Spark leg and the oracle): {bad}"
    )


def test_no_oracled_query_exports_map_or_struct(spark, sf_dir):
    """Map/struct cells are unhashable/unsortable in the driver's
    pandas compare; oracled queries must export scalars or arrays."""
    bad: dict[str, list[str]] = {}
    for name in registry.ORACLES:
        schema = registry.QUERIES[name](spark, sf_dir).schema
        cols = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.MapType, T.StructType))
        ]
        if cols:
            bad[name] = cols
    assert not bad, f"map/struct-exporting oracled queries: {bad}"
