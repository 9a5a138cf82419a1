"""Deterministic (hash-based) sampling and splitting.

A training-data pipeline needs *reproducible* sampling: the same row must
land in the same sample/split on every run, on every cluster size, with no
coordination. ``df.sample()`` can't give that (seed is per-partition-index,
so any repartition changes the sample). Instead we bucket each row by a
multiplicative hash of its key — a pure projection: no shuffle, no state,
trivially parallel at 100 TB, and expressible identically in ANSI SQL for
the DuckDB oracle.

The reference (Yohanes213/newyork-taxi-etl) has no sampling surface at all —
its closest analog is the hardcoded ``limit(5)`` previews (nb:441 (c3));
this module is part of the training-data extension surface (BASELINE.json
north star).

Hash: Knuth's multiplicative scheme ``(key * 2654435761) mod 2^32`` — the
odd constant is the golden-ratio multiplier, so consecutive ids spread
uniformly across buckets. All arithmetic stays in BIGINT: exact in both
Spark and DuckDB for keys < 2^32 (beyond that, swap in ``xxhash64`` — same
plan shape, no oracle parity).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Knuth multiplicative hash constant: floor(2^32 / golden_ratio), odd.
KNUTH = 2654435761
_M32 = 1 << 32

#: the same bucket expression, for oracle SQL (keep in sync with hash_bucket)
BUCKET_SQL = "(({key} * 2654435761) % 4294967296) % {n}"


def hash_bucket(key: Column | str, n_buckets: int = 100) -> Column:
    """Deterministic bucket in [0, n_buckets) from an integer key column."""
    k = F.col(key) if isinstance(key, str) else key
    return F.pmod(F.pmod(k.cast("bigint") * F.lit(KNUTH), F.lit(_M32)), F.lit(n_buckets))


def hash_sample(df: DataFrame, key: str, percent: int, n_buckets: int = 100) -> DataFrame:
    """Keep rows whose hash bucket < percent — a reproducible percent% sample.

    A pure filter: predicate-pushdown-friendly, shuffle-free, and stable
    under repartitioning (unlike ``DataFrame.sample``).
    """
    return df.filter(hash_bucket(key, n_buckets) < F.lit(percent))


def hash_split(
    df: DataFrame,
    key: str,
    train_pct: int = 80,
    valid_pct: int = 10,
    col_name: str = "split",
) -> DataFrame:
    """Tag each row 'train' / 'valid' / 'test' by hash bucket.

    Disjoint and exhaustive by construction; a row's split never changes as
    the corpus grows (bucket depends only on its key), which is exactly the
    contamination guarantee a train/test split needs.
    """
    b = hash_bucket(key)
    return df.withColumn(
        col_name,
        F.when(b < train_pct, "train")
        .when(b < train_pct + valid_pct, "valid")
        .otherwise("test"),
    )


def stratified_hash_sample(
    df: DataFrame, key: str, stratum: str, rates: dict[str, int], default_rate: int
) -> DataFrame:
    """Per-stratum sampling rates (percent), e.g. downsample dominant languages.

    The deterministic analog of ``DataFrame.sampleBy``: the rate cascade is a
    zero-shuffle ``when`` projection, so rebalancing a 100 TB corpus is one
    scan with the filter pushed to the reader.
    """
    rate = None
    for value, pct in sorted(rates.items()):
        cond = F.col(stratum) == value
        rate = F.when(cond, pct) if rate is None else rate.when(cond, pct)
    rate = F.lit(default_rate) if rate is None else rate.otherwise(default_rate)
    return df.filter(hash_bucket(key) < rate)


def weighted_hash_sample(
    df: DataFrame, key: str, weight: str, k: int, digits: int = 6
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-ES): priority = u^(1/w) with u a hash-uniform in (0,1);
    the k highest priorities are a weighted sample.

    Reproducibility comes from the same multiplicative-hash uniform as
    :func:`hash_sample` (u = (bucket + 0.5) / 2^20), so the sample is
    stable across runs/partitionings and expressible identically in the
    DuckDB oracle. The plan is a pure projection + TakeOrderedAndProject:
    no shuffle, top-k heaps merge on the driver — the 100 TB shape for
    "sample 10k docs proportional to token count". Priorities are rounded
    before ordering (ties then break by key) so the float transcendental
    can't make cross-engine ordering ambiguous.
    """
    n = 1 << 20
    u = (hash_bucket(key, n) + F.lit(0.5)) / F.lit(float(n))
    w = F.col(weight).cast("double")
    priority = F.round(F.pow(u, F.lit(1.0) / w), digits)
    return (
        df.select(F.col(key), F.col(weight), priority.alias("priority"))
        .orderBy(F.desc("priority"), key)
        .limit(k)
    )


def fixed_size_group_sample(
    df: DataFrame, group_cols: list[str], key: str, k: int
) -> DataFrame:
    """Exactly min(k, |group|) rows per group, chosen by md5 rank of the
    row key — the bounded-output sampler a 100 TB pipeline needs where a
    FRACTION sample is useless (per-group quotas for eval sets, prompt
    audits, labeling batches).

    The md5 of the key is a uniform [0,1) draw independent of the group
    column, so within each group the k smallest hashes are a uniform
    without-replacement sample — deterministic, partitioning-invariant,
    and reproducible in SQL. Spark plans the rank<=k filter as
    WindowGroupLimit: each map task pre-prunes to its local top-k PER
    GROUP before the shuffle, so the exchange carries O(groups x k x
    partitions), never the corpus.
    """
    from pyspark.sql.window import Window

    h = F.md5(F.col(key).cast("string"))
    w = Window.partitionBy(*group_cols).orderBy(h, F.col(key))
    return (
        df.withColumn("sample_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("sample_rank") <= k)
    )
