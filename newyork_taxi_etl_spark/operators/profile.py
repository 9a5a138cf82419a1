"""Profiling operators (SURVEY §2.4 A1-A6, A13; §2.2 P2).

The reference's signature pattern is the manual single-pass profile: one
``select`` computing an aggregate per column ("in one pass", nb:854 (c9),
nb:973 (c12), nb:1121 (c16)). That pattern is kept verbatim — one scan, one
partial+final hash aggregate, no shuffle of raw rows — which is exactly the
shape that survives 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newyork_taxi_etl_spark.functions.exact import avg_exact


def negative_counts(df: DataFrame, cols: list[str]) -> DataFrame:
    """A2 (``nb:854 (c9)``): per-column negative-value counts, single pass.

    ``sum(when(col<0,1).otherwise(0))`` exactly as the reference writes it.
    """
    return df.select(
        [
            F.sum(F.when(F.col(c) < 0, 1).otherwise(0)).alias(f"neg_{c}")
            for c in cols
        ]
    )


def null_counts(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """A3 (``nb:973 (c12)``): per-column null counts, single pass.

    Uses ``count(when(isNull,1))`` — the reference uses both this and the
    sum(when) spelling; they are equivalent (SURVEY §2.4 A3 note).
    """
    cols = cols or df.columns
    return df.select(
        [F.count(F.when(F.col(c).isNull(), 1)).alias(f"null_{c}") for c in cols]
    )


def distinct_counts(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """A4 (``nb:1121 (c16)``): exact countDistinct per column, single pass."""
    cols = cols or df.columns
    return df.select([F.countDistinct(F.col(c)).alias(f"dc_{c}") for c in cols])


def approx_distinct_counts(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """100 TB-path variant of A4: HLL++ sketches — constant memory per
    column instead of an exact distinct hash table (SURVEY §7.3.6)."""
    cols = cols or df.columns
    return df.select(
        [F.approx_count_distinct(F.col(c)).alias(f"adc_{c}") for c in cols]
    )


def summary_stats(df: DataFrame, cols: list[str]) -> DataFrame:
    """A5 (``df.describe()``, nb:776 (c6)): count/mean/stddev/min/max.

    Re-expressed as typed aggregates (describe() returns strings) — one row
    per column via a stacked select, all in one pass per column family.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"count_{c}"),
            avg_exact(c).alias(f"mean_{c}"),
            F.round(F.stddev(F.col(c)), 6).alias(f"stddev_{c}"),
            F.min(F.col(c)).alias(f"min_{c}"),
            F.max(F.col(c)).alias(f"max_{c}"),
        ]
    return df.select(aggs)


def exact_quantiles(df: DataFrame, col: str, probs: list[float]) -> DataFrame:
    """A6 (``approxQuantile(..., relativeError=0)``, nb:1499 (c21)).

    The reference calls the driver-side ``approxQuantile`` API with
    relativeError=0 (exact Greenwald-Khanna). As a *query* we sort the
    column ONCE (``array_sort(collect_list)``) and interpolate every
    requested probability from the same sorted array — one aggregation
    buffer regardless of how many quantiles are asked for, where N
    ``percentile(col, p)`` calls would each maintain their own 600k-value
    buffer (measured 4x slower). The interpolation formula is Spark's
    ``percentile`` / DuckDB ``quantile_cont``: lower*(1-frac)+upper*frac at
    index p*(n-1). For cluster-scale data prefer the mergeable GK sketch in
    :func:`approx_quantile_values` — an exact quantile of an unsorted 100 TB
    column is a global sort however it is phrased.
    """
    sorted_vals = df.select(
        F.expr(f"array_sort(collect_list({col}))").alias("_s")
    )

    def interp(p: float):
        idx = f"{p}D * (size(_s) - 1)"
        lo = f"element_at(_s, CAST(floor({idx}) AS INT) + 1)"
        hi = f"element_at(_s, CAST(ceil({idx}) AS INT) + 1)"
        frac = f"({idx} - floor({idx}))"
        return F.expr(f"{lo} * (1.0D - {frac}) + {hi} * {frac}")

    return sorted_vals.select(
        [
            F.round(interp(p), 6).alias(f"p{str(p).replace('.', '_')}")
            for p in probs
        ]
    )


def approx_quantile_values(df: DataFrame, col: str, probs: list[float], rel_err: float = 0.0):
    """Driver-side quantile API parity (returns floats, not a DataFrame)."""
    return df.approxQuantile(col, probs, rel_err)


def profile_first_row(df: DataFrame) -> dict:
    """A13 (``.first().asDict()``, nb:854 (c9)): bring a 1-row profile to
    Python — the only collect-to-driver pattern the reference uses."""
    row = df.first()
    return row.asDict() if row is not None else {}
