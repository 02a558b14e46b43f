"""Deterministic money/aggregate helpers for oracle-exact results.

The reference mixes DECIMAL(10,2) (Postgres), Python float, and pandas
float64 (SURVEY.md §7 "Decimal vs float drift"). The engine's rule: any SUM
over a money-like double column is computed in DECIMAL(18,2) (exact,
order-independent — a parallel float sum is not) and the *result* cast to
double so the output schema matches the DuckDB oracle bit-for-bit.

Averages are computed as exact-decimal-sum (as double) divided by count in
double, so both engines perform the identical IEEE division.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(18,2)"


def dsum(col: Column | str, coalesce_zero: bool = False) -> Column:
    """Exact decimal sum of a 2-dp money column, returned as double.

    Mirrors e.g. `COALESCE(SUM(o.total_amount), 0)` (reference
    batch_processor.py:34) with order-independent arithmetic.
    DuckDB oracle spelling:
    ``CAST(COALESCE(SUM(CAST(x AS DECIMAL(18,2))), 0) AS DOUBLE)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.sum(c.cast(DEC))
    if coalesce_zero:
        s = F.coalesce(s, F.lit(0).cast(DEC))
    return s.cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic average: exact decimal sum (as double) / count (double
    division). DuckDB spelling:
    ``CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)
