"""All-but-the-Top contracts (similarity/abtt.py) beyond the oracle
hash-match: the two-round power-iteration estimate must actually point
at the Gram matrix's top eigenvector (numpy ground truth), and the
isotropy report must separate a planted anisotropic label from an
isotropic one."""

import numpy as np
import pytest
from pyspark.sql import types as T

from cdc_stream_batch_etl_spark.similarity.abtt import (
    QSCALE,
    _direction,
    embedding_isotropy_report,
    embedding_top_direction,
)

_SCHEMA = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def _frame(spark, vecs, labels=None):
    labels = labels or [0] * len(vecs)
    rows = [
        (i + 1, [float(x) for x in v], int(l))
        for i, (v, l) in enumerate(zip(vecs, labels))
    ]
    return spark.createDataFrame(rows, _SCHEMA)


def test_direction_matches_numpy_top_eigenvector(spark):
    """On a corpus WITH a dominant direction (the operator's target
    regime — the sf fixture embeddings are near-isotropic, where any
    direction is equally 'top' and the estimate is legitimately
    arbitrary), the integer-exact two-round estimate must align with
    numpy's exact top eigenvector of AᵀA: two rounds raise the
    eigengap to the 4th power."""
    rng = np.random.RandomState(11)
    shared = rng.rand(64) - 0.5
    shared /= np.linalg.norm(shared) * 2.0
    vecs = [shared * (0.8 + 0.4 * rng.rand()) + (rng.rand(64) - 0.5) * 0.08
            for _ in range(200)]
    df = _frame(spark, vecs)
    got = {r["dim"]: r["s2"] for r in _direction(df).collect()}
    u_hat = np.array([float(got[d]) for d in range(64)])

    q = np.floor(np.array(vecs, dtype=np.float32).astype(np.float64) * QSCALE)
    w, v = np.linalg.eigh(q.T @ q)
    u_true = v[:, -1]
    cos = abs(u_hat @ u_true) / (np.linalg.norm(u_hat) * np.linalg.norm(u_true))
    assert cos >= 0.999, f"power-iteration estimate off target: cos={cos:.4f}"


def test_direction_is_exact_integer_math(spark, sf_dir):
    """The decimal pipeline must equal numpy's exact integer (AᵀA)²p —
    bit-for-bit, not approximately (object-dtype numpy keeps exact ints)."""
    import pyarrow.parquet as pq

    rows = {r["dim"]: r["s2"] for r in _direction(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    ).collect()}
    emb = np.array(
        pq.read_table(f"{sf_dir}/embeddings.parquet").column("embedding").to_pylist(),
        dtype=np.float64,
    )
    # int64 first (floor returns floats), then object for exact big-int
    q = np.floor(emb * QSCALE).astype(np.int64).astype(object)
    p = np.array([1 - 2 * (d % 2) for d in range(q.shape[1])], dtype=object)
    s1 = q.T @ (q @ p)
    s2 = q.T @ (q @ s1)
    for d in range(q.shape[1]):
        assert int(rows[d]) == int(s2[d]), f"dim {d}"


def test_isotropy_report_separates_planted_labels(spark):
    """Label 1: 30 vectors = one shared direction + small noise
    (anisotropic — n_high must dominate). Label 2: 30 near-orthogonal
    one-hot vectors (isotropic — n_high must be ~0)."""
    rng = np.random.RandomState(7)
    shared = rng.rand(64) - 0.5
    shared /= np.linalg.norm(shared) * 2.5  # keep |x| < 1 after noise
    aniso = [shared + rng.rand(64) * 0.02 for _ in range(30)]
    iso = []
    for i in range(30):
        v = np.zeros(64)
        v[i % 64] = 0.4
        v[(i * 7 + 3) % 64] = 0.1 if i % 2 else -0.1
        iso.append(v)
    df = _frame(spark, aniso + iso, [1] * 30 + [2] * 30)
    df.createOrReplaceTempView("_abtt_planted")

    from cdc_stream_batch_etl_spark.similarity.abtt import _direction as dirfn

    # drive the report machinery directly on the planted frame
    from pyspark.sql import functions as F

    from cdc_stream_batch_etl_spark.similarity.abtt import (
        BAND_HIGH,
        _Q_SPARK,
    )
    from cdc_stream_batch_etl_spark.similarity.linalg import dot

    u = dirfn(df).select(
        "dim", F.col("s2").cast("string").cast("double").alias("ud")
    )
    u_arr = u.agg(
        F.expr(
            "transform(array_sort(collect_list(struct(dim, ud))), s -> s.ud)"
        ).alias("u")
    )
    qe = df.select(
        "label", F.expr(f"transform({_Q_SPARK}, x -> cast(x as double))").alias("qd")
    )
    scored = qe.crossJoin(F.broadcast(u_arr)).select(
        "label",
        F.abs(
            dot("qd", "u") / (F.sqrt(dot("qd", "qd")) * F.sqrt(dot("u", "u")))
        ).alias("a"),
    )
    high = {
        r.label: r.n
        for r in scored.groupBy("label")
        .agg(F.sum((F.col("a") >= BAND_HIGH).cast("bigint")).alias("n"))
        .collect()
    }
    assert high[1] == 30, f"anisotropic label not fully high-aligned: {high}"
    assert high[2] <= 3, f"isotropic label reads as aligned: {high}"


def test_report_counts_partition_vectors(spark, sf_dir):
    rows = embedding_isotropy_report(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_vecs == r.n_high + r.n_mid + r.n_low
