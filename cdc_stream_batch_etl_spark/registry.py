"""Query/operator registry — the single source of truth for the driver
contract (`__spark_entry__.queries()` / `oracle_sql()`) and the test suite.

Each operator module registers:
  - a callable ``(spark, sf_dir) -> DataFrame`` (Spark-first implementation)
  - optionally, the equivalent ANSI SQL for the DuckDB oracle.

Column names must match between the two — the driver sorts columns by name
before value-hashing.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[..., Any]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every operator module so registration side-effects run.

    Registration order is deliberate: the driver's correctness harness
    iterates ``queries()`` in dict (= registration) order and round 1 only
    reached the first ~50 entries, so the training-data-pipeline families
    (dedup / text / similarity / multimodal) — which lacked driver rows in
    round 1 — register FIRST, followed by the reference-parity operators
    (all of which already have green CORRECTNESS_r01 rows).
    """
    from .dedup import exact, minhash, simhash, ngram, embedding, components  # noqa: F401
    from .text import (  # noqa: F401
        analysis,
        corpus,
        sampling,
        scrub,
        ngrams,
        repetition,
        tfidf,
        contamination,
        lengthdist,
    )
    from .similarity import ann, ivf, centroids  # noqa: F401
    from .multimodal import binaryops  # noqa: F401
    # new in round 2 — register before the already-driver-green parity set
    from .text import composition, decontam, spans, chunking, datacard, postings, lm  # noqa: F401
    from .similarity import kmeans, quantize, pq  # noqa: F401
    from .operators import monitoring, funnel  # noqa: F401
    from . import operators  # noqa: F401
    from .operators import (  # noqa: F401
        segments,
        products,
        orders,
        cdc,
        windows,
        anomalies,
        geo,
        filters,
        summary,
        asof,
        sessions,
        scd,
        binning,
        ranking,
        relational,
        setops,
    )
