"""Deterministic (order-independent) numeric aggregates.

Plain double ``sum``/``avg`` depend on partition summation order, so Spark
and the DuckDB oracle can differ in the last ulps — enough to flip a rounded
digit and fail a value-hash compare (SURVEY §7.3.2). For oracle-checked
queries we aggregate through a fixed-point decimal and cast back to double:
exact, associative, engine-independent.

At 100 TB this is also the *right* semantics for money columns — decimal
partial aggregation is exact and still map-side combinable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: enough integer headroom for 1e12 rows of 1e6-scale values
_DEC = "decimal(30,6)"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def sum_exact(col: Column | str) -> Column:
    """Order-independent SUM over doubles (exact at 6 decimal places)."""
    return F.sum(_c(col).cast(_DEC)).cast("double")


def avg_exact(col: Column | str) -> Column:
    """Order-independent AVG over doubles.

    decimal-sum / count, evaluated in double at the end; bit-identical
    between Spark and DuckDB given the same rows.
    """
    return (F.sum(_c(col).cast(_DEC)).cast("double") / F.count(_c(col))).cast("double")


def sum_exact_sql(col: str) -> str:
    """DuckDB oracle twin of :func:`sum_exact`."""
    return f"CAST(SUM(CAST({col} AS DECIMAL(30,6))) AS DOUBLE)"


def avg_exact_sql(col: str) -> str:
    """DuckDB oracle twin of :func:`avg_exact`."""
    return (
        f"CAST(CAST(SUM(CAST({col} AS DECIMAL(30,6))) AS DOUBLE)"
        f" / COUNT({col}) AS DOUBLE)"
    )
