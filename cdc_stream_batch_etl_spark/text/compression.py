"""Compression-ratio quality signal — the Gopher/RedPajama zlib gate.

A document that compresses extremely well is repetitive (boilerplate,
keyword stuffing, generated spam); one that barely compresses is noise
(random ids, base64 blobs). Production corpus filters (Gopher, Rae et
al. 2021; RedPajama-v2 quality signals) bound the zlib ratio from both
sides. The other text gates here are JVM expressions; a DEFLATE pass
has no Catalyst built-in, so this operator is the text-path showcase of
the engine's "slow path done right" tier: an Arrow-batched pandas_udf
(one Python hop per batch, zero shuffles — same tier as the multimodal
codecs, multimodal/binaryops.py), NOT a row-at-a-time Python UDF.

Oracle status: ROWS-ONLY by declared design (registry.ROWS_ONLY).
DuckDB has no zlib/compress function, so no cross-engine SQL oracle can
exist; determinism is still real (zlib level 6 is bit-stable for a
fixed zlib build) and is pytest-gated against directly-computed golden
values plus planted repetitive/incompressible fixtures
(tests/test_compression_gate.py).

Scale: scan-local 1:1 map — partition count = input splits, per-batch
memory bounded by Arrow batch size × max doc length; compression cost
is the point (it runs ONCE at ingest, gating everything downstream).
"""

from __future__ import annotations

import zlib

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..catalog import load_table
from ..registry import register

GZIP_LEVEL = 6
LOW_RATIO = 0.35  # below: repetitive/degenerate
HIGH_RATIO = 1.00  # above: incompressible noise (ratio can exceed 1 on tiny docs)


def _zlib_ratio_fn(texts: pd.Series) -> pd.Series:
    def ratio(t: str | None) -> float | None:
        if t is None:  # SQL NULL propagation, matching the JVM-expression gates
            return None
        raw = t.encode("utf-8")
        if not raw:
            return 1.0
        return len(zlib.compress(raw, GZIP_LEVEL)) / len(raw)

    return texts.map(ratio)


@register("compression_gate")  # rows-only: no zlib in DuckDB (see ROWS_ONLY)
def compression_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc zlib compression ratio + the two-sided keep decision."""
    docs = load_table(spark, sf_dir, "documents")
    # wrapped at call time, not import time — pandas_udf needs an active
    # session to resolve its return type (functions/udfs.py precedent)
    ratio = pandas_udf(_zlib_ratio_fn, "double")(F.col("text"))
    return docs.select(
        "doc_id",
        F.octet_length(F.col("text")).cast("bigint").alias("byte_len"),
        ratio.alias("compression_ratio"),
    ).withColumn(
        "keep",
        (F.col("compression_ratio") > LOW_RATIO)
        & (F.col("compression_ratio") <= HIGH_RATIO),
    )
