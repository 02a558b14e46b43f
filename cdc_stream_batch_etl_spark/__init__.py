"""cdc_stream_batch_etl_spark — a from-scratch PySpark-native engine with the
query/data-processing capabilities of the reference CDC+batch+stream ETL
template (c2012mato/cdc-stream-batch-etl), re-expressed on DataFrames,
Catalyst, and Structured Streaming. See SURVEY.md for the blueprint."""

__version__ = "0.1.0"
