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


def _hash_entries(col: str, depth: int, width: int):
    """array<struct<j, bucket>> of all ``depth`` hash buckets for ``col`` —
    the ONE construction every CMS build/probe path (global and grouped)
    explodes, so the hash-entry shape can never drift between the sketch
    and its probes."""
    return F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                F.expr(_bucket_expr(col, j, width)).alias("bucket"),
            )
            for j in range(depth)
        ]
    )


def cms_counters(
    df: DataFrame, col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(j, bucket, cnt) counter matrix of a count-min sketch over ``col``.

    One narrow explode (xdepth) + ONE hash aggregate on (j, bucket) — at
    most depth*width result rows regardless of input size.
    """
    rows = _hash_entries(col, depth, width)
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
    lookups = _hash_entries(col, depth, width)
    probes = items.select(F.col(col), F.explode(lookups).alias("e")).select(
        col, F.col("e.j").alias("j"), F.col("e.bucket").alias("bucket")
    )
    return (
        probes.join(F.broadcast(counters), ["j", "bucket"])
        .groupBy(col)
        .agg(F.min("cnt").alias("est_cnt"))
    )


def sampled_candidates(
    df: DataFrame,
    col: str,
    key_cols: list[str],
    fraction: float = 0.02,
    modulus: int = 10_000,
) -> DataFrame:
    """Distinct values seen in a DETERMINISTIC pseudo-sample of rows.

    The 100 TB candidate stage for :func:`approx_heavy_hitters`: instead of
    exact ``distinct()`` over the full value stream (itself a massive
    shuffle at token scale), keep a row when the first 8 md5 hex digits of
    its ``key_cols`` identity land below ``fraction * modulus``, then
    distinct only the surviving sliver. Sampling ROWS (not values) is what
    preserves the guarantee: an item with true frequency f is absent from
    the sample with probability (1-p)^f <= exp(-p*f), so a true heavy
    hitter (f >= support*N) is missed with probability <= exp(-p*support*N)
    — at p=0.02, support=0.02, N=10^6 that is e^-400; the sample only ever
    misses items too rare to matter. md5 (not murmur) so the DuckDB oracle
    reproduces the identical sample bit-for-bit.

    ``key_cols`` must identify a row (e.g. (doc_id, pos) for an exploded
    token stream) — hashing the value alone would collapse duplicates and
    flatten inclusion probability to p for every item.
    """
    key = F.concat_ws("#", *[F.col(c).cast("string") for c in key_cols])
    bucket = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
        % F.lit(modulus)
    )
    thresh = int(round(fraction * modulus))
    return df.filter(bucket < thresh).select(col).distinct()


def grouped_sampled_candidates(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    key_cols: list[str],
    fraction: float = 0.02,
    modulus: int = 10_000,
) -> DataFrame:
    """Per-group distinct values from ONE deterministic row-sample — the
    100 TB candidate stage for :func:`grouped_heavy_hitters_topk`.

    Same row-identity hash sample as :func:`sampled_candidates` (the
    group column plays no part in the sampling decision), keeping the
    surviving rows' DISTINCT ``(group..., value)`` pairs. Because rows
    are sampled independently of the group, the miss bound holds PER
    (group, item): an item with in-group frequency f escapes the sample
    with probability <= exp(-fraction * f) — a per-language heavy hitter
    is missed only when it is rare inside its own language, i.e. not a
    heavy hitter. The enumeration shuffle shrinks by 1/fraction while
    the per-group sketch/estimate dataflow is untouched.
    """
    key = F.concat_ws("#", *[F.col(c).cast("string") for c in key_cols])
    bucket = (
        F.conv(F.substring(F.md5(key), 1, 8), 16, 10).cast("bigint")
        % F.lit(modulus)
    )
    thresh = int(round(fraction * modulus))
    return df.filter(bucket < thresh).select(*group_cols, col).distinct()


def approx_heavy_hitters(
    df: DataFrame,
    col: str,
    support: float = 0.02,
    depth: int = 4,
    width: int = 256,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Items whose CMS-estimated frequency is >= support * N.

    One-sided: every TRUE heavy hitter is returned (est >= true); false
    positives are items collided above the threshold — shrink by raising
    ``width``. Candidates default to the distinct values (exact
    enumeration — fine up to dashboard scale); pass
    ``candidates=sampled_candidates(...)`` for the 100 TB path, which
    bounds the enumeration shuffle to a hash-sample sliver while keeping
    the same sketch/estimate dataflow and the same one-sided estimates.
    """
    counters = cms_counters(df, col, depth, width)
    total = df.agg(F.count(F.lit(1)).alias("n_total"))
    if candidates is None:
        candidates = df.select(col).distinct()
    est = cms_estimates(counters, candidates, col, depth, width)
    return (
        est.crossJoin(F.broadcast(total))
        .filter(F.col("est_cnt") >= F.col("n_total") * F.lit(support))
        .select(col, "est_cnt")
        .orderBy(F.desc("est_cnt"), col)
    )


def grouped_cms_counters(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """One CMS counter matrix PER GROUP: (group..., j, bucket, cnt).

    Still a linear sketch — the group key simply joins the aggregate key,
    so the shuffle carries at most n_groups * depth * width partial sums
    (map-side combined), never the value stream. The natural shape for
    per-language / per-source profiling of a 100 TB corpus: each group's
    sketch is independently mergeable and the whole matrix stays
    broadcastable while n_groups * depth * width is small.
    """
    rows = _hash_entries(col, depth, width)
    return (
        df.select(*group_cols, F.explode(rows).alias("e"))
        .groupBy(*group_cols, F.col("e.j").alias("j"), F.col("e.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def grouped_heavy_hitters_topk(
    df: DataFrame,
    col: str,
    group_cols: list[str],
    k: int = 5,
    depth: int = 4,
    width: int = 256,
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Top-k items per group by CMS-estimated frequency.

    Same candidate/probe/min-estimate dataflow as
    :func:`approx_heavy_hitters` with the group key carried through the
    counter join, then a per-group rank<=k window — Spark 4 plans
    WindowGroupLimit, so the top-k never globally sorts the estimates.
    Pass ``candidates`` (e.g. a :func:`sampled_candidates` variant keyed by
    group) to bound the enumeration at token scale.
    """
    from pyspark.sql import Window

    counters = grouped_cms_counters(df, col, group_cols, depth, width)
    if candidates is None:
        candidates = df.select(*group_cols, col).distinct()
    lookups = _hash_entries(col, depth, width)
    probes = candidates.select(
        *group_cols, F.col(col), F.explode(lookups).alias("e")
    ).select(
        *group_cols, col, F.col("e.j").alias("j"), F.col("e.bucket").alias("bucket")
    )
    est = (
        probes.join(F.broadcast(counters), [*group_cols, "j", "bucket"])
        .groupBy(*group_cols, col)
        .agg(F.min("cnt").alias("est_cnt"))
    )
    w = Window.partitionBy(*group_cols).orderBy(F.desc("est_cnt"), F.col(col))
    return (
        est.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .orderBy(*group_cols, "rank")
    )


def bloom_bits(
    df: DataFrame, col: str, m: int = 8192, k: int = 4
) -> DataFrame:
    """Set bit positions of a Bloom filter over ``col`` (one-column DF).

    Same seed-prefixed-md5 hash family as the CMS (:func:`_bucket_expr`),
    so the DuckDB oracle rebuilds the identical filter. Output is at most
    ``m`` rows — the broadcastable form of a key SET: at 100 TB this is
    the explicit runtime-filter pattern (ship m bits to every scan task
    instead of shuffling the fact table into a semi join; Spark's own
    injected bloom is size-estimate-gated and opaque, this one is a
    first-class, testable DataFrame).
    """
    pos = F.array(*[F.expr(_bucket_expr(col, j, m)) for j in range(k)])
    return df.select(F.explode(pos).alias("bit")).distinct()


def bloom_maybe_contains(
    bits: DataFrame, items: DataFrame, col: str, m: int = 8192, k: int = 4
) -> DataFrame:
    """Probe: items whose ``k`` bloom bits are ALL set (maybe-present).

    One-sided like every bloom: no false negatives, false positives at
    rate ~(1 - e^(-k*n/m))^k. The bits side broadcasts; the probe side is
    a narrow explode + broadcast join + count==k aggregate keyed by the
    probed value — no shuffle of the (big) probe table beyond its own
    aggregate.
    """
    pos = F.array(*[F.expr(_bucket_expr(col, j, m)) for j in range(k)])
    probes = items.select(F.col(col), F.explode(pos).alias("bit"))
    return (
        probes.join(F.broadcast(bits), "bit")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("_hits"))
        .filter(F.col("_hits") == k)
        .select(col)
    )


def kmv_hash(value: F.Column | str, seed: str = "kmv") -> F.Column:
    """60-bit uniform hash point for KMV/theta sketches.

    First 15 md5 hex digits of ``seed|value`` as a BIGINT in
    [0, 2^60) — the portable hash-point convention of the sketch shelf
    (seed-prefixed md5, identical digit-for-digit in DuckDB via
    ``CAST(('0x' || substring(md5(...), 1, 15)) AS BIGINT)``), wide
    enough that collisions are negligible at any realistic distinct
    count (birthday bound ~2^30 ≈ 1e9 distinct values).
    """
    col = F.col(value) if isinstance(value, str) else value
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(seed + "|"), col.cast("string"))), 1, 15),
        16,
        10,
    ).cast("bigint")


def kmv_bottom_k(points: DataFrame, set_cols: list[str], k: int) -> DataFrame:
    """KMV (bottom-k / theta) sketch per set: the ``k`` smallest distinct
    hash points, ranked.

    ``points`` must carry distinct ``set_cols + [hv]`` rows (dedup them
    first — bottom-k over distinct values is the sketch's definition and
    the distinct is the only corpus-sized aggregate, map-side combined).
    The per-set min-k ranks through a window Spark plans as
    WindowGroupLimit: every map task prunes to its local k smallest
    before the exchange, so the shuffle carries O(sets * k * partitions)
    rows, never the distinct stream. Output: set_cols, hv, rn (1-based).

    The sketch supports the full theta-sketch algebra downstream: the
    k-th smallest point theta estimates distinct as (k-1) * 2^60 / theta,
    union sketches merge by re-ranking the pooled points, and any
    union-bottom-k point that belongs to set A is PROVABLY in A's own
    bottom-k (fewer than k union points below it, so fewer than k of A's)
    — membership against the tiny per-set sketches is exact for the
    points the set-operation estimators look at.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(*set_cols).orderBy("hv")
    return (
        points.withColumn("rn", F.row_number().over(w).cast("int"))
        .filter(F.col("rn") <= k)
    )
