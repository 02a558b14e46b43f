"""The SQL UDF tier must agree byte-for-byte with the built-in (hot-path)
expression tier — the UDFs can never drift from the oracled operators."""

from cdc_stream_batch_etl_spark.catalog import register_views
from cdc_stream_batch_etl_spark.functions.udfs import register_text_udfs
from cdc_stream_batch_etl_spark.text.analysis import doc_quality, lang_id


def test_quality_label_udf_matches_builtin(spark, sf_dir):
    register_text_udfs(spark)
    register_views(spark, sf_dir)
    via_udf = {
        r.doc_id: r.q
        for r in spark.sql(
            "SELECT doc_id, quality_label(text) AS q FROM documents"
        ).collect()
    }
    via_builtin = {
        r.doc_id: r.quality_label for r in doc_quality(spark, sf_dir).collect()
    }
    assert via_udf == via_builtin


def test_predicted_lang_udf_matches_builtin(spark, sf_dir):
    register_text_udfs(spark)
    register_views(spark, sf_dir)
    via_udf = {
        r.doc_id: r.p
        for r in spark.sql(
            "SELECT doc_id, predicted_lang(text) AS p FROM documents"
        ).collect()
    }
    via_builtin = {
        r.doc_id: r.predicted_lang for r in lang_id(spark, sf_dir).collect()
    }
    assert via_udf == via_builtin
