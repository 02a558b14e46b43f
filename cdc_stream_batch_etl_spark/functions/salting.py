"""Skew-mitigation utilities: salted joins and two-phase aggregation.

At 100 TB a handful of hot keys (one celebrity customer, one default
product id) can put an entire join or aggregation on one task. Two
standing answers, both semantics-preserving:

- AQE skew-join splitting is ON in the session factory
  (spark.sql.adaptive.skewJoin.enabled) — it handles sort-merge skew
  transparently at runtime and is the first line of defense.
- When AQE can't help (broadcast-ineligible dimension, stateful
  aggregation, or pre-AQE Spark at a customer site), `salted_join` /
  `two_phase_agg` make the spread explicit.

Both are pure plan rewrites — no data characteristics are baked in; the
salt count trades shuffle fan-out for per-task balance.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    key: str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join a skewed fact side to a dimension by exploding the
    dimension n_salts ways and scattering the fact rows uniformly.

    The fact side gets a random salt in [0, n_salts); the dimension is
    replicated once per salt value (explode of a literal range — dim rows
    × n_salts, acceptable because dim ≪ fact). The join key becomes
    (key, salt), so one hot key's rows land on n_salts tasks instead of
    one.

    Row-identical to the unsalted join ONLY for fact-preserving joins:
    inner/left/left_semi/left_anti. Right/full-outer would emit every
    unmatched dimension row once per salt replica (and cross would
    replicate everything), so those are rejected.
    """
    allowed = {"inner", "left", "left_outer", "leftouter", "left_semi",
               "leftsemi", "semi", "left_anti", "leftanti", "anti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"salted_join supports fact-preserving joins only "
            f"(inner/left/left_semi/left_anti), got how={how!r}: the "
            f"replicated dimension would emit unmatched dim rows "
            f"{n_salts} times under right/full joins"
        )
    salted_fact = skewed.withColumn(
        SALT_COL, (F.rand(seed=42) * n_salts).cast("int")
    )
    salted_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_fact.join(salted_dim, [key, SALT_COL], how).drop(SALT_COL)


def two_phase_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """groupBy(key) with a salted pre-aggregation for decomposable
    aggregates (sum/count/min/max).

    Phase 1 groups by (key, salt) — the hot key's rows combine on
    n_salts tasks; phase 2 re-combines the n_salts partials per key.
    `aggs` maps output column name → phase-1 aggregate expression; phase 2
    applies the matching re-combine (sum for sum/count, min/max for
    min/max), inferred from the expression name.
    """
    phase1 = (
        df.withColumn(SALT_COL, (F.rand(seed=42) * n_salts).cast("int"))
        .groupBy(key, SALT_COL)
        .agg(*[expr.alias(name) for name, expr in aggs.items()])
    )
    recombine = []
    for name, expr in aggs.items():
        # Column<'sum(l_quantity)'> → "sum"; str() form is stable across
        # classic and Connect (no private _jc access)
        fn = str(expr).split("'", 1)[1].split("(")[0].strip().lower()
        if fn in ("count", "sum"):
            recombine.append(F.sum(name).alias(name))
        elif fn == "min":
            recombine.append(F.min(name).alias(name))
        elif fn == "max":
            recombine.append(F.max(name).alias(name))
        else:
            raise ValueError(
                f"{name}: only decomposable aggregates (sum/count/min/max) "
                f"support two-phase recombination, got {fn!r}"
            )
    return phase1.groupBy(key).agg(*recombine)
