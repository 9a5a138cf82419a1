"""Count-min sketch operators (approximate frequent items / heavy hitters).

The profiling primitive the reference's describe/profile surface lacks
(NOTES.md roadmap item): estimate per-item frequencies in sublinear space.
Spark ships ``count_min_sketch`` as an opaque binary aggregate; this
implementation instead materializes the counter MATRIX as a (depth x width)
DataFrame so that

* it is engine-portable (the DuckDB oracle rebuilds the identical counters
  — the hash family is seed-prefixed md5, same trick as MinHash in
  functions/text.py, so both engines agree bucket-for-bucket), and
* merge/composition is visible: a CMS is a LINEAR sketch — counters are
  sums, so partial sketches from any partitioning combine by elementwise
  add (here: one hash aggregate), making the result bit-identical under
  repartitioning. That linearity is also the 100 TB story: per-executor
  partial counters are tiny (depth x width), the shuffle moves only
  partial sums (map-side combine), never the token stream.

Estimates are one-sided: est(x) >= true(x) always, and
est(x) <= true(x) + eps*N with prob 1-delta for width=e/eps, depth=ln(1/d).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _bucket_expr(value_expr: str, j: int, width: int) -> str:
    """Portable hash -> bucket: first 8 md5 hex digits of 'j|value', mod
    width. Positive 32-bit range, so ``%`` agrees across engines."""
    return (
        f"CAST(conv(substring(md5(concat('{j}|', {value_expr})), 1, 8), "
        f"16, 10) AS BIGINT) % {width}"
    )


def cms_counters(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(j, bucket, cnt) counter matrix of a count-min sketch over ``col``.

    One narrow explode (xdepth) + ONE hash aggregate on (j, bucket) — at
    most depth*width result rows regardless of input size.
    """
    rows = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.expr(_bucket_expr(col, j, width)).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    return (
        df.select(F.explode(rows).alias("e"))
        .groupBy(F.col("e.j").alias("j"), F.col("e.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimates(
    counters: DataFrame,
    items: DataFrame,
    col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-query the sketch: est_cnt = min_j counters[j, h_j(item)].

    ``items`` is the candidate set (small — heavy-hitter candidates);
    each candidate fans out to ``depth`` lookup rows that hash-join the
    (tiny, broadcast) counter matrix.
    """
    lookups = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.expr(_bucket_expr(col, j, width)).alias("bucket"),
            )
            for j in range(depth)
        ]
    )
    probes = items.select(F.col(col), F.explode(lookups).alias("e")).select(
        col, F.col("e.j").alias("j"), F.col("e.bucket").alias("bucket")
    )
    return (
        probes.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy(col)
        .agg(F.min("cnt").alias("est_cnt"))
    )


def approx_heavy_hitters(
    df: DataFrame,
    col: str,
    support: float = 0.02,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Items whose CMS-estimated frequency is >= support * N.

    One-sided: every TRUE heavy hitter is returned (est >= true); false
    positives are items collided above the threshold — shrink by raising
    ``width``. Candidates here are the distinct values (exact enumeration);
    at 100 TB swap the candidate stage for a sample-based or hierarchical
    (dyadic-range) enumeration and keep the same sketch/estimate dataflow.
    """
    counters = cms_counters(df, col, depth, width)
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    est = cms_estimates(counters, df.select(col).distinct(), col, depth, width)
    return (
        est.crossJoin(F.broadcast(total))
        .filter(F.col("est_cnt") >= F.col("n_total") * F.lit(support))
        .select(col, "est_cnt")
        .orderBy(F.desc("est_cnt"), col)
    )
