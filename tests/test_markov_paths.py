"""four_step_path_counts against an independent exact reference: the
transition matrix is rebuilt with plain pandas groupby and raised to
the 4th power in exact Python-int arithmetic (numpy object dtype), so
any decimal-precision or join-shape bug in the Spark matrix squaring
diverges here even though both engines share the SQL spelling."""

import numpy as np
import pandas as pd

from cdc_stream_batch_etl_spark.catalog import load_table
from cdc_stream_batch_etl_spark.operators.markov import (
    PATH_K,
    four_step_path_counts,
)


def test_path_counts_match_exact_matrix_power(spark, sf_dir):
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    ev["next_type"] = ev.groupby("user_id")["event_type"].shift(-1)
    pairs = ev.dropna(subset=["next_type"])
    types = sorted(set(pairs["event_type"]) | set(pairs["next_type"]))
    idx = {t: i for i, t in enumerate(types)}
    m = np.zeros((len(types), len(types)), dtype=object)
    for (a, b), n in pairs.groupby(["event_type", "next_type"]).size().items():
        m[idx[a], idx[b]] = int(n)
    mk = np.linalg.matrix_power(m, PATH_K)  # exact: object dtype = Python ints

    got = {
        (r.from_type, r.to_type): r.n_paths
        for r in four_step_path_counts(spark, sf_dir).collect()
    }
    want = {
        (a, b): float(mk[idx[a], idx[b]])
        for a in types
        for b in types
        if mk[idx[a], idx[b]] != 0
    }
    assert got == want


def test_path_counts_positive_and_dense(spark, sf_dir):
    """With a handful of event types and thousands of transitions, the
    4-step reachability matrix is dense and strictly positive."""
    rows = four_step_path_counts(spark, sf_dir).collect()
    types = {r.from_type for r in rows} | {r.to_type for r in rows}
    assert len(rows) == len(types) ** 2
    assert all(r.n_paths > 0 for r in rows)
