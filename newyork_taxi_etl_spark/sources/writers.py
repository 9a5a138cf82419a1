"""Sinks (SURVEY §2.1 S2/S3; §3.3 Delta maintenance).

Delta availability is environment-dependent (SURVEY §7.3.5): when
``delta-spark`` is importable we write Delta and can OPTIMIZE/ZORDER;
otherwise we degrade to partitioned Parquet with a documented
range-partition + sort-within-partitions approximation of Z-ordering
(same data-skipping intent: co-locate rows by the clustering keys so
file-level min/max stats prune scans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

try:  # optional dependency; absent in this container
    from delta.tables import DeltaTable  # type: ignore

    HAVE_DELTA = True
except Exception:  # pragma: no cover
    DeltaTable = None
    HAVE_DELTA = False


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Partitioned sink (S3, ``nb:117830 (c119)``): Delta when available,
    Parquet otherwise. Partition layout is identical either way so partition
    pruning (§4) behaves the same."""
    fmt = fmt or ("delta" if HAVE_DELTA else "parquet")
    df.write.format(fmt).mode(mode).partitionBy(*partition_cols).save(path)


def write_stage(df: DataFrame, path: str) -> None:
    """Stage checkpoint sink (S2, ``nb:61439 (c31)`` et al.) — lineage
    truncation between cleaning stages. The engine's default is one lazy
    pipeline; this exists for parity and for long lineages at scale."""
    df.write.mode("overwrite").parquet(path)


def write_zordered_approx(
    df: DataFrame,
    path: str,
    zorder_cols: list[str],
    partition_cols: list[str] | None = None,
    target_files: int | None = None,
) -> None:
    """Approximate ``OPTIMIZE ... ZORDER BY`` (``nb:120730 (c132)``) without
    Delta: range-partition rows by the clustering keys, then sort within
    partitions, so Parquet row-group min/max stats become selective on those
    keys. True multi-dimensional interleaving is weaker than this for one key
    and stronger for many; for the reference's 2-key (PU,DO) case the
    lexicographic approximation captures most of the skipping benefit.
    """
    out = df
    if target_files:
        out = out.repartitionByRange(target_files, *zorder_cols)
    else:
        out = out.repartitionByRange(*zorder_cols)
    out = out.sortWithinPartitions(*zorder_cols)
    writer = out.write.mode("overwrite")
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def optimize_zorder(spark, path: str, zorder_cols: list[str]) -> None:
    """Real Delta OPTIMIZE ZORDER when delta-spark is present (§3.3)."""
    if not HAVE_DELTA:
        raise NotImplementedError(
            "delta-spark not installed; use write_zordered_approx() instead"
        )
    DeltaTable.forPath(spark, path).optimize().executeZOrderBy(*zorder_cols)
