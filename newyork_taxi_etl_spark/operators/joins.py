"""Join operators.

The reference has ZERO joins (SURVEY §2.3) — its one multi-table
relationship is hardcoded as ``airport_ids=[1,132,138]``. The engine
implements the join surface properly, Spark-first:

  * small dimensions are ``broadcast()`` joined — no shuffle of the fact
    table, the build side ships to every executor once;
  * fact-to-fact joins shuffle on the join key and rely on AQE for skew
    splitting;
  * semi/anti joins expressed as ``left_semi``/``left_anti`` (no payload
    columns cross the exchange).

At 100 TB the fact table never moves for dimension enrichment — that is the
entire point of the broadcast-join upgrade over the reference's literal list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def enrich_with_dim(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    how: str = "left",
) -> DataFrame:
    """Broadcast-hash enrichment join (the zone-lookup upgrade, SURVEY §2.3):
    ``trips.join(broadcast(zones), trips.PULocationID == zones.LocationID)``.
    """
    return fact.join(broadcast(dim), fact[fact_key] == dim[dim_key], how)


def star_join(fact: DataFrame, dims: list[tuple[DataFrame, str, str]]) -> DataFrame:
    """Chain broadcast joins over a star schema; each dim is
    (df, fact_key, dim_key)."""
    out = fact
    for dim, fk, dk in dims:
        out = out.join(broadcast(dim), out[fk] == dim[dk], "inner")
    return out


def anti_join(left: DataFrame, right: DataFrame, lk: str, rk: str) -> DataFrame:
    """Rows of left with no match in right (NOT EXISTS)."""
    return left.join(broadcast(right), left[lk] == right[rk], "left_anti")


def semi_join(left: DataFrame, right: DataFrame, lk: str, rk: str) -> DataFrame:
    """Rows of left with at least one match in right (EXISTS)."""
    return left.join(broadcast(right), left[lk] == right[rk], "left_semi")


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str,
    right_cols: list[str],
    prefix: str = "matched_",
) -> DataFrame:
    """Left as-of join: for each left row, the latest right row of the same
    key with right.ts <= left.ts (point-in-time lookup).

    Spark has no native as-of join; the scalable formulation is the
    union+window trick: tag both sides, union them, and take
    ``last(right_value, ignorenulls=True)`` over a per-key window ordered by
    (ts, side) with rows unbounded-preceding..current. Right rows sort
    before left rows at equal timestamps, giving the standard ``>=``
    (inclusive) as-of semantics. Cost: ONE hash shuffle on the key plus a
    per-key sort — identical shape to a sort-merge join, no range
    explosion, no per-key driver loops; this is the 100 TB-safe pattern
    (a naive non-equi range join would be a quadratic nested-loop).
    """
    from pyspark.sql import Window

    l_tagged = left.withColumn("_side", F.lit(1))
    for c in right_cols:
        l_tagged = l_tagged.withColumn(
            f"_r_{c}", F.lit(None).cast(dict(right.dtypes)[c])
        )
    r_tagged = right.select(
        on,
        ts,
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in right_cols],
    )
    for c in left.columns:
        if c not in (on, ts):
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    u = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col(ts).asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = u
    for c in right_cols:
        out = out.withColumn(
            f"{prefix}{c}", F.last(f"_r_{c}", ignorenulls=True).over(w)
        )
    return out.filter(F.col("_side") == 1).select(
        *left.columns, *[f"{prefix}{c}" for c in right_cols]
    )


def range_join_bucketed(
    facts: DataFrame,
    intervals: DataFrame,
    ts: str,
    start: str,
    end: str,
    bucket_seconds: int = 3600,
) -> DataFrame:
    """Interval-containment (range) join, bucketed: match each fact row to
    every interval with ``start <= ts <= end``.

    Spark plans a naive ``ts BETWEEN start AND end`` join as a
    broadcast-nested-loop — quadratic row comparisons. The scalable
    formulation coarsens time into fixed buckets: each fact row has exactly
    ONE bucket, each interval explodes into the buckets it overlaps, the
    join is a hash equi-join on the bucket, and the exact containment
    predicate filters within the bucket. Work is
    O(facts + intervals * interval_len/bucket + matches); each (fact,
    interval) pair meets at most once because the fact side owns a single
    bucket. The interval side stays broadcastable when small; with a huge
    interval table both sides hash-shuffle on the bucket key.
    """
    f = facts.withColumn(
        "_bkt", (F.unix_timestamp(F.col(ts)) / bucket_seconds).cast("long")
    )
    iv = intervals.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                (F.unix_timestamp(F.col(start)) / bucket_seconds).cast("long"),
                (F.unix_timestamp(F.col(end)) / bucket_seconds).cast("long"),
            )
        ),
    )
    return (
        f.join(broadcast(iv), "_bkt")
        .filter(F.col(ts).between(F.col(start), F.col(end)))
        .drop("_bkt")
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    lk: str,
    rk: str,
    n_salt: int = 8,
    salt_on: str | tuple[str, ...] | list[str] | None = None,
) -> DataFrame:
    """Skew-salted inner equi-join: spread a hot join key over ``n_salt``
    shuffle partitions.

    The (large, possibly skewed) left side gets a deterministic salt
    derived from ``salt_on`` (one or more left columns whose COMBINED
    cardinality must be high — a low-cardinality salt source collapses the
    salt space and the hot key still lands on few reducers; pass the row
    identity, e.g. the full key tuple); the right side is exploded
    ``n_salt`` ways so every
    (key, salt) combination still meets its match. The join condition
    becomes (key, salt), so one hot key hashes to ``n_salt`` different
    reducers instead of one — the classic pre-AQE skew fix, still needed
    when AQE's skew-join split can't kick in (e.g. bucketed tables or
    aggregation-after-join pinning the partitioning).

    Cost model: right side is replicated n_salt times (use only when right
    is the small side); result is identical to the plain join.
    """
    if salt_on is None:
        salt_cols = [F.monotonically_increasing_id()]
    elif isinstance(salt_on, str):
        salt_cols = [F.col(salt_on)]
    else:
        salt_cols = [F.col(c) for c in salt_on]
    l = left.withColumn("_salt", F.pmod(F.hash(*salt_cols), F.lit(n_salt)))
    r = right.withColumn(
        "_salt", F.explode(F.expr(f"sequence(0, {n_salt - 1})"))
    )
    out = l.join(r, (l[lk] == r[rk]) & (l["_salt"] == r["_salt"]))
    return out.drop("_salt")


def join_strategy_columns(
    parts: int = 32,
    bcast_bytes: int = 64 * 1024,
    skew_factor: float = 4.0,
    max_salt: int = 32,
) -> tuple:
    """Decision layer over join statistics: (skew_ratio, strategy, n_salt).

    Applies the physical-distribution rules a planner runs over the numbers
    `skew_diagnostics` / `join_size_estimate` produce, as Columns over a
    stats row with ``small_bytes`` (projected bytes of the build side),
    ``big_rows`` and ``max_key_rows`` (hottest join key on the probe side):

    * build side fits the broadcast budget -> ``broadcast`` (no shuffle of
      the probe side at all — skew is then irrelevant: a broadcast join
      has no per-key partition to overflow);
    * hottest key exceeds ``skew_factor`` average post-shuffle partitions
      (``max_key_rows * parts > skew_factor * big_rows``) -> ``salted``
      with n_salt = ceil(max_key_rows / avg_partition_rows) capped at
      ``max_salt`` — enough replicas that the hot key's salted slices land
      back at average partition size (operators.joins.salted_join executes
      it; AQE skew-split is the runtime fallback when it applies);
    * otherwise -> plain ``shuffle`` hash/sort-merge join.

    ``bcast_bytes`` defaults to 64 KiB — deliberately scaled to the local
    test SFs so every rule branch is exercised by real data; a cluster
    deployment passes spark.sql.autoBroadcastJoinThreshold (10 MB) and its
    real shuffle partition count. The RULES are scale-free: each compares
    a size against a budget, not an absolute tuned to this corpus.

    An empty probe side (``big_rows = 0``) has zero skew by definition, so
    the ratio is guarded to 0.0 rather than left to engine-specific
    division semantics (Spark non-ANSI NULL vs ANSI error vs DuckDB
    inf/NULL) — the strategy stays defined (broadcast if the build side
    fits, else shuffle) in both engines.
    """
    ratio = F.when(
        F.col("big_rows") > 0,
        F.col("max_key_rows").cast("double") * F.lit(parts) / F.col("big_rows"),
    ).otherwise(F.lit(0.0))
    strategy = (
        F.when(F.col("small_bytes") <= F.lit(bcast_bytes), F.lit("broadcast"))
        .when(ratio > F.lit(skew_factor), F.lit("salted"))
        .otherwise(F.lit("shuffle"))
    )
    n_salt = (
        F.when(
            strategy == F.lit("salted"),
            F.least(F.lit(max_salt), F.ceil(ratio).cast("int")),
        )
        .otherwise(F.lit(1))
        .cast("int")
    )
    return (
        F.round(ratio, 6).alias("skew_ratio"),
        strategy.alias("strategy"),
        n_salt.alias("n_salt"),
    )
