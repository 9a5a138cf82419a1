"""Planted-signal floor for the learned quality filter (r8 verdict #4).

Both engines agreeing on quality_logreg_filter proves the arithmetic,
not that the model LEARNS: if a code change zeroed the gradient, oracle
parity would stay green while the scorer returned 0.5 everywhere.  These
tests plant unambiguous junk against clean docs and require the trained
scorer to separate them, plus a numpy cross-check of the GD arithmetic.
"""

from __future__ import annotations

import pyspark.sql.functions as F


def _feats(spark, rows):
    df = spark.createDataFrame(rows, "ntok double, ttr double, szw double")
    return df.select(
        ((F.col("ntok") - F.lit(30.0)) / F.lit(30.0)).alias("x1"),
        ((F.col("ttr") - F.lit(0.2)) * F.lit(5.0)).alias("x2"),
        F.col("szw").alias("x3"),
        F.when((F.col("ntok") >= 30) & (F.col("ttr") >= 0.2), 1.0)
        .otherwise(0.0)
        .alias("y"),
    )


def test_logreg_separates_planted_junk(spark):
    """40x-repeated-token junk (ttr 0.025) vs all-distinct clean docs
    (ttr 1.0): after training, the continuous score must separate the
    classes by a wide margin and the 0.5 threshold must classify every
    planted doc correctly."""
    from newyork_taxi_etl_spark.operators.logreg import (
        logistic_gd,
        logistic_prob,
    )

    rows = [(40.0, 1.0 / 40.0, 0.0)] * 30 + [(40.0, 1.0, 1.0)] * 30
    feats = _feats(spark, rows).localCheckpoint()
    w = logistic_gd(feats, ["x1", "x2", "x3"], "y", steps=8, lr=4.0)
    scored = feats.select("y", logistic_prob(w, ["x1", "x2", "x3"]).alias("p"))
    agg = scored.agg(
        F.min(F.when(F.col("y") == 1.0, F.col("p"))).alias("min_clean"),
        F.max(F.when(F.col("y") == 0.0, F.col("p"))).alias("max_junk"),
        F.sum(
            ((F.col("p") >= 0.5) == (F.col("y") == 1.0)).cast("int")
        ).alias("n_right"),
    ).collect()[0]
    assert agg["min_clean"] > agg["max_junk"] + 0.2, agg
    assert agg["n_right"] == 60, agg


def test_logreg_matches_numpy_reference(spark):
    """The distributed decimal-sum GD must agree with a plain numpy
    implementation of the same update rule (6-dp sigmoid, 12-dp gradient
    rounding) to ~1e-9 — the decimal aggregation changes summation
    ORDER, never the value."""
    import numpy as np

    from newyork_taxi_etl_spark.operators.logreg import logistic_gd

    rng_rows = [
        (20.0 + 7 * (i % 9), (i % 11) / 10.0, float(i % 2))
        for i in range(80)
    ]
    feats = _feats(spark, rng_rows).localCheckpoint()
    w = logistic_gd(feats, ["x1", "x2", "x3"], "y", steps=5, lr=2.0)

    ntok = np.array([r[0] for r in rng_rows])
    ttr = np.array([r[1] for r in rng_rows])
    szw = np.array([r[2] for r in rng_rows])
    y = ((ntok >= 30) & (ttr >= 0.2)).astype(float)
    X = np.column_stack(
        [np.ones_like(y), (ntok - 30.0) / 30.0, (ttr - 0.2) * 5.0, szw]
    )
    wn = np.zeros(4)
    for _ in range(5):
        z = np.round(X @ wn, 6)
        p = np.round(1 / (1 + np.exp(-z)), 6)
        g = np.round((p - y)[:, None] * X, 12).sum(axis=0)
        wn = wn - 2.0 * (g / len(y))
    assert np.allclose(np.array(w), wn, atol=1e-9), (w, wn)
