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


def _pinned_shuffle_partitions(df: DataFrame) -> int:
    """Explicit partition count for the quantile range exchanges.

    ``repartitionByRange`` without a count lets AQE coalesce the exchange,
    and the distributed quantiles read that exchange from two branches
    whose pid values must match — so the count is pinned to the session's
    ``spark.sql.shuffle.partitions`` (the same size the implicit path
    would start from), falling back to 200 (the Spark default) if the
    conf is unreadable.
    """
    try:
        return max(1, int(df.sparkSession.conf.get("spark.sql.shuffle.partitions")))
    except (TypeError, ValueError):
        return 200


def exact_quantiles(df: DataFrame, col: str, probs: list[float]) -> DataFrame:
    """A6 (``approxQuantile(..., relativeError=0)``, nb:1499 (c21)).

    The reference calls the driver-side ``approxQuantile`` API with
    relativeError=0 (exact Greenwald-Khanna). Here the exact quantile is a
    fully DISTRIBUTED selection — no single-task buffer anywhere:

    1. range-partition the non-null column (the one unavoidable shuffle —
       an exact quantile of unsorted data is a global sort however it is
       phrased) and sort within partitions;
    2. per-partition row counts (map-side combined to one row per
       partition) → exclusive prefix offsets, a window over ≤ #partitions
       rows;
    3. within-partition positions via ``monotonically_increasing_id``
       (pid in the high 31 bits, in-partition index in the low 33 —
       projected ABOVE the sort, so ids follow sorted order; it is
       nondeterministic, which also pins it there), so global position =
       offset[pid] + local index with no second full-data shuffle;
    4. broadcast-join the ⌊p(n−1)⌋/⌈p(n−1)⌉ target positions (2 rows per
       probability) and interpolate lower*(1−frac)+upper*frac — Spark
       ``percentile`` / DuckDB ``quantile_cont`` semantics.

    An earlier formulation (``array_sort(collect_list)``) held the whole
    column in ONE aggregation buffer — fine at sf0.1, a single-task OOM at
    100×. This one's memory high-water is a partition. For repeated/looser
    quantiles prefer the mergeable GK sketch (:func:`approx_quantile_values`)
    or the fixed-width histogram gate (``quantile_sketch_gate``).

    Partition-identity pin: the ranged exchange is consumed by TWO plan
    branches (per-partition counts and per-row positions), and the pid/loc
    values must agree between them. ``repartitionByRange`` is therefore
    given an EXPLICIT partition count — a user-specified repartition AQE
    may not coalesce, so both consumers of the (reused) exchange observe
    the same partitioning function. Within a partition, a lost-stage
    recompute can only permute rows among EQUAL values (the sort pins
    everything else), so counts, offsets, and value-at-position are all
    recompute-invariant; only which duplicate holds which ``loc`` can
    change, which is value-neutral.
    """
    v = F.col(col)
    vals = df.select(v.alias("v")).where(v.isNotNull())
    ranged = vals.repartitionByRange(_pinned_shuffle_partitions(df), F.col("v"))

    mid = F.monotonically_increasing_id()
    rows = ranged.sortWithinPartitions("v").select(
        "v",
        F.shiftright(mid, 33).alias("pid"),
        (mid.bitwiseAND(F.lit((1 << 33) - 1))).alias("loc"),
    )
    # tiny: one row per partition, shuffled post-combine. Derived from the
    # SAME id column as the positions (not a separate spark_partition_id
    # branch), so the offsets stay consistent with the data rows even if
    # AQE re-reads the exchange with a different coalescing.
    counts = rows.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql.window import Window

    off_w = Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        "pid", F.coalesce(F.sum("cnt").over(off_w), F.lit(0)).alias("off")
    )
    total = counts.agg(F.sum("cnt").alias("n"))

    # tiny: 1 row per probability, positions computed from n
    idx = F.col("p") * (F.col("n") - 1).cast("double")
    targets = total.select(
        F.explode(F.array(*[F.lit(float(p)) for p in probs])).alias("p"), "n"
    ).select(
        "p",
        F.floor(idx).alias("lo_pos"),
        F.ceil(idx).alias("hi_pos"),
        (idx - F.floor(idx)).alias("frac"),
    )

    global_pos = rows.join(F.broadcast(offsets), "pid").select(
        "v", (F.col("off") + F.col("loc")).alias("gpos")
    )
    picked = global_pos.join(
        F.broadcast(targets),
        (F.col("gpos") == F.col("lo_pos")) | (F.col("gpos") == F.col("hi_pos")),
    )
    per_p = picked.groupBy("p", "frac").agg(
        F.max(F.when(F.col("gpos") == F.col("lo_pos"), F.col("v"))).alias("lo_v"),
        F.max(F.when(F.col("gpos") == F.col("hi_pos"), F.col("v"))).alias("hi_v"),
    )
    q = F.col("lo_v") * (F.lit(1.0) - F.col("frac")) + F.col("hi_v") * F.col("frac")
    quantiles = per_p.select("p", F.round(q, 6).alias("q"))
    return quantiles.groupBy().agg(
        *[
            F.max(F.when(F.col("p") == F.lit(float(p)), F.col("q"))).alias(
                f"p{str(p).replace('.', '_')}"
            )
            for p in probs
        ]
    )


def grouped_exact_quantiles(
    df: DataFrame,
    grp: str,
    col: str,
    probs: list[float],
    broadcast_offsets: bool = True,
) -> DataFrame:
    """Exact per-group quantiles, fully distributed (grouped twin of
    :func:`exact_quantiles`).

    ``percentile(col, p)`` per group buffers each GROUP's values in one
    aggregation buffer — fine while groups are small, a single-task OOM the
    day one group holds a 100 TB table's hot key. Here the same
    range-partition machinery generalizes: partition on (group, value) —
    each group occupies a CONTIGUOUS run of partitions and a contiguous
    ``monotonically_increasing_id`` range inside each — so per-(partition,
    group) counts + the group's first in-partition id give every row its
    within-group global position from one full-data shuffle; targets
    broadcast per (group, probability). Memory high-water is a partition,
    never a group. Output: one row per group, ``cnt`` + one column per
    probability, identical to the ``percentile``/``quantile_cont``
    formulation.

    Same partition-identity pin as :func:`exact_quantiles`: explicit
    partition count so AQE cannot coalesce the two-consumer exchange
    divergently.

    Size of the ``offs`` side table: because range partitioning on
    ``(group, value)`` gives each group a CONTIGUOUS run of partitions,
    the per-(partition, group) table holds at most ``G + P − 1`` rows
    (one per group plus one per partition boundary that splits a group) —
    NOT ``G × P``. It still grows linearly with group cardinality, so for
    a very-high-cardinality group column (``G`` in the hundreds of
    millions) pass ``broadcast_offsets=False`` to join it shuffled on
    ``(pid, g)`` instead of broadcasting; the targets join stays broadcast
    (``G × |probs|`` rows) and should be shuffled the same way at that
    scale.
    """
    from pyspark.sql.window import Window

    g, v = F.col(grp), F.col(col)
    vals = df.select(g.alias("g"), v.alias("v")).where(v.isNotNull())
    ranged = vals.repartitionByRange(
        _pinned_shuffle_partitions(df), F.col("g"), F.col("v")
    )
    mid = F.monotonically_increasing_id()
    rows = ranged.sortWithinPartitions("g", "v").select(
        "g",
        "v",
        F.shiftright(mid, 33).alias("pid"),
        mid.bitwiseAND(F.lit((1 << 33) - 1)).alias("loc"),
    )
    # tiny: one row per (partition, group) — count + the group's first id
    pg = rows.groupBy("pid", "g").agg(
        F.count(F.lit(1)).alias("cnt"), F.min("loc").alias("base")
    )
    off_w = (
        Window.partitionBy("g")
        .orderBy("pid")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = pg.select(
        "pid",
        "g",
        "base",
        F.coalesce(F.sum("cnt").over(off_w), F.lit(0)).alias("off"),
    )
    totals = pg.groupBy("g").agg(F.sum("cnt").alias("n"))

    idx = F.col("p") * (F.col("n") - 1).cast("double")
    targets = totals.select(
        F.col("g").alias("tg"),
        "n",
        F.explode(F.array(*[F.lit(float(p)) for p in probs])).alias("p"),
    ).select(
        "tg",
        "p",
        F.floor(idx).alias("lo_pos"),
        F.ceil(idx).alias("hi_pos"),
        (idx - F.floor(idx)).alias("frac"),
    )
    offs_side = F.broadcast(offs) if broadcast_offsets else offs
    rows_g = rows.join(offs_side, ["pid", "g"]).select(
        "g", "v", (F.col("off") + F.col("loc") - F.col("base")).alias("gpos")
    )
    picked = rows_g.join(
        F.broadcast(targets),
        (F.col("g") == F.col("tg"))
        & ((F.col("gpos") == F.col("lo_pos")) | (F.col("gpos") == F.col("hi_pos"))),
    )
    per = picked.groupBy("g", "p", "frac").agg(
        F.max(F.when(F.col("gpos") == F.col("lo_pos"), F.col("v"))).alias("lo_v"),
        F.max(F.when(F.col("gpos") == F.col("hi_pos"), F.col("v"))).alias("hi_v"),
    )
    q = F.col("lo_v") * (F.lit(1.0) - F.col("frac")) + F.col("hi_v") * F.col("frac")
    quantiles = per.select("g", "p", F.round(q, 6).alias("q"))
    wide = quantiles.groupBy("g").agg(
        *[
            F.max(F.when(F.col("p") == F.lit(float(p)), F.col("q"))).alias(
                f"p{str(p).replace('.', '_')}"
            )
            for p in probs
        ]
    )
    return (
        wide.join(F.broadcast(totals), "g")
        .select(
            F.col("g").alias(grp),
            F.col("n").alias("cnt"),
            *[f"p{str(p).replace('.', '_')}" for p in probs],
        )
        .orderBy(grp)
    )


def ordered_positions(
    df: DataFrame,
    order: list[tuple[str, bool]],
    cum_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-row 1-based global position in a total order, distributed.

    The general form of :func:`exact_quantiles`' selection fold, for the
    rank/ntile/cumsum family: ``row_number().over(Window.orderBy(...))``
    (and every statistic derived from it — Gini rank-weights, NTILE
    stages, nucleus prefix sums) funnels the WHOLE table through one
    task.  Here the same numbers come from:

    1. range-partition on the order key (the one unavoidable shuffle — a
       total order of unsorted data is a global sort however phrased) and
       sort within partitions;
    2. per-partition (count, sum per ``cum_cols``) — map-side combined to
       one row per partition — windowed into exclusive prefix offsets
       over ≤ #partitions rows;
    3. ``monotonically_increasing_id`` projected ABOVE the sort (pid in
       the high 31 bits, in-partition index low 33) so
       ``gpos = offset[pid] + loc + 1`` with no second full-data shuffle;
    4. optional running sums: ``cum_<c> = sum-offset[pid] + the
       within-partition running sum`` — a window PARTITIONED by pid, so
       its state never exceeds one range partition.

    ``order`` is ``[(col, ascending), ...]`` and must be a UNIQUE
    composite key (ties would make loc assignment among equal keys
    recompute-nondeterministic; with a unique key the sort pins every
    row, same argument as :func:`exact_quantiles`).  Cumulative sums are
    carried as DECIMAL(38,0) — order-independent and overflow-safe at
    any scale.  Same partition-identity pin as :func:`exact_quantiles`:
    the ranged exchange feeds two consumers, so the partition count is
    explicit and both branches derive pid from the SAME id column.

    Output: the input columns + ``gpos`` (+ ``cum_<c>`` inclusive of the
    current row, per requested column).
    """
    from pyspark.sql.window import Window

    # contract guard: cumulative sums accumulate as DECIMAL(38,0) — exact
    # only for integral inputs.  A double/decimal-scale column would be
    # silently rounded PER ROW before summing; fail loudly instead.
    _integral = {"tinyint", "smallint", "int", "integer", "bigint", "long"}
    dtypes = dict(df.dtypes)
    for c in cum_cols:
        if dtypes.get(c) not in _integral:
            raise TypeError(
                f"ordered_positions cum_cols must be integral; {c!r} is "
                f"{dtypes.get(c)} — cast explicitly (scaled to ticks) "
                "before calling, or the decimal(38,0) fold would round "
                "each row silently"
            )

    sort_exprs = [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in order
    ]
    ranged = df.repartitionByRange(
        _pinned_shuffle_partitions(df), *sort_exprs
    )
    mid = F.monotonically_increasing_id()
    rows = ranged.sortWithinPartitions(*sort_exprs).select(
        "*",
        F.shiftright(mid, 33).alias("_pid"),
        mid.bitwiseAND(F.lit((1 << 33) - 1)).alias("_loc"),
    )
    pg = rows.groupBy("_pid").agg(
        F.count(F.lit(1)).alias("_cnt"),
        *[
            F.sum(F.col(c).cast("decimal(38,0)")).alias(f"_sum_{c}")
            for c in cum_cols
        ],
    )
    off_w = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offs = pg.select(
        "_pid",
        F.coalesce(F.sum("_cnt").over(off_w), F.lit(0)).alias("_off"),
        *[
            F.coalesce(
                F.sum(f"_sum_{c}").over(off_w),
                F.lit(0).cast("decimal(38,0)"),
            ).alias(f"_off_{c}")
            for c in cum_cols
        ],
    )
    joined = rows.join(F.broadcast(offs), "_pid")
    run_w = (
        Window.partitionBy("_pid")
        .orderBy("_loc")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return joined.select(
        *df.columns,
        (F.col("_off") + F.col("_loc") + 1).cast("bigint").alias("gpos"),
        *[
            (
                F.col(f"_off_{c}")
                + F.sum(F.col(c).cast("decimal(38,0)")).over(run_w)
            )
            .cast("decimal(38,0)")
            .alias(f"cum_{c}")
            for c in cum_cols
        ],
    )


def approx_quantile_values(df: DataFrame, col: str, probs: list[float], rel_err: float = 0.0):
    """Driver-side quantile API parity (returns floats, not a DataFrame)."""
    return df.approxQuantile(col, probs, rel_err)


def profile_first_row(df: DataFrame) -> dict:
    """A13 (``.first().asDict()``, nb:854 (c9)): bring a 1-row profile to
    Python — the only collect-to-driver pattern the reference uses."""
    row = df.first()
    return row.asDict() if row is not None else {}
