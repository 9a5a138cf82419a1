"""Analytic operators (SURVEY §2.4 A7-A12, §2.5 W1, §2.6 O1-O3).

Each operator is a pure DataFrame->DataFrame function; scans stay outside so
Catalyst sees one lazy plan per query (filter pushdown + column pruning reach
the Parquet scan).

Scale notes: every group-by here is a partial+final hash aggregate (map-side
combine); top-k is sort+limit which Spark plans as TakeOrderedAndProject
(per-partition heap, no global sort); the route-pair group-by is the known
skew point (SURVEY §7.3.6) — AQE skew handling is enabled in the session
factory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from newyork_taxi_etl_spark.functions.datetime import time_of_day_slot
from newyork_taxi_etl_spark.functions.exact import avg_exact


def traffic_congestion(events: DataFrame, ts: str = "ts", value: str = "value") -> DataFrame:
    """A9 multi-agg by slot + O1 sort (``nb:117702 (c114)``).

    Reference computed avg(average_speed), avg(time_take_min), count by
    time_of_day_slot; here over the events table: avg(value), count.
    """
    return (
        events.withColumn("time_of_day_slot", time_of_day_slot(ts))
        .groupBy("time_of_day_slot")
        .agg(
            avg_exact(value).alias("avg_value"),
            F.count(F.lit(1)).alias("trip_count"),
        )
        .orderBy("time_of_day_slot")
    )


def value_by_slot_dow(events: DataFrame, ts: str = "ts", value: str = "value") -> DataFrame:
    """A10 rounded aggs by (slot, day-of-week) (``nb:121693 (c138)``)."""
    return (
        events.withColumn("time_of_day_slot", time_of_day_slot(ts))
        .withColumn("day_of_week", F.dayofweek(F.col(ts)))
        .groupBy("time_of_day_slot", "day_of_week")
        .agg(
            F.round(avg_exact(value), 2).alias("avg_value"),
            F.count(F.lit(1)).alias("trip_count"),
        )
        .orderBy("time_of_day_slot", "day_of_week")
    )


def rank_in_group(df: DataFrame, part_key: str, sub_key: str) -> DataFrame:
    """A7 group-by count + W1 rank within partition (``nb:117225 (c111)``).

    Rank sub-keys by count within each partition key — the reference ranks
    payment types within each rate code. Deterministic tiebreak on sub_key so
    the oracle hash is stable when counts tie on synthetic data (SURVEY §7.5).
    """
    counts = df.groupBy(part_key, sub_key).agg(F.count(F.lit(1)).alias("cnt"))
    w = Window.partitionBy(part_key).orderBy(F.desc("cnt"), F.col(sub_key))
    return counts.withColumn("rnk", F.rank().over(w))


def top_routes(
    events: DataFrame,
    ts: str = "ts",
    src: str = "user_id",
    dst: str = "event_type",
    slots: tuple[str, ...] = ("Afternoon", "Evening"),
    k: int = 10,
) -> DataFrame:
    """O3 top-k routes with ``concat_ws`` label (``nb:122413 (c144)``).

    orderBy+limit plans as TakeOrderedAndProject: each task keeps a k-row
    heap, only k*partitions rows reach the driver-side final — no global
    sort even at 100 TB. Deterministic tiebreak on the route label.
    """
    return (
        events.withColumn("time_of_day_slot", time_of_day_slot(ts))
        .filter(F.col("time_of_day_slot").isin(*slots))
        .groupBy(src, dst)
        .agg(F.count(F.lit(1)).alias("trip_count"))
        .withColumn("route", F.concat_ws(" to ", F.col(src), F.col(dst)))
        .select("route", "trip_count")
        .orderBy(F.desc("trip_count"), F.col("route"))
        .limit(k)
    )


def top_routes_salted(
    events: DataFrame,
    ts: str = "ts",
    src: str = "user_id",
    dst: str = "event_type",
    slots: tuple[str, ...] = ("Afternoon", "Evening"),
    k: int = 10,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-safe two-phase top-k: identical result to :func:`top_routes`.

    The reference's route distribution is heavily skewed (236<->237 dominate,
    SURVEY §7.3.6); a single hash-aggregate shuffles every row of the hot key
    to one reducer. Here phase 1 counts per (salt, route) — the hot key is
    split across ``salt_buckets`` reducers — and phase 2 sums the per-salt
    partials, shuffling at most ``salt_buckets`` rows per route. The salt is
    derived from a row-local column (crc32 of event id), so no
    non-determinism enters the plan; counts are salt-invariant by
    construction. AQE's skew handling covers joins, not aggregates, so this
    is the 100 TB pattern for skewed group-by keys.
    """
    partials = (
        events.withColumn("time_of_day_slot", time_of_day_slot(ts))
        .filter(F.col("time_of_day_slot").isin(*slots))
        .withColumn(
            "_salt",
            F.pmod(F.crc32(F.col("event_id").cast("string")), F.lit(salt_buckets)),
        )
        .groupBy("_salt", src, dst)
        .agg(F.count(F.lit(1)).alias("partial_count"))
    )
    return (
        partials.groupBy(src, dst)
        .agg(F.sum("partial_count").alias("trip_count"))
        .withColumn("route", F.concat_ws(" to ", F.col(src), F.col(dst)))
        .select("route", "trip_count")
        .orderBy(F.desc("trip_count"), F.col("route"))
        .limit(k)
    )


def corr_by_group(df: DataFrame, key: str, x: str, y: str) -> DataFrame:
    """A12 grouped Pearson correlation + avgs (``nb:122567 (c146)``).

    corr is rounded: float summation order differs between engines
    (SURVEY §7.3.2), and corr has no decimal-exact path.
    """
    return (
        df.groupBy(key)
        .agg(
            F.round(F.corr(x, y), 6).alias("corr_xy"),
            avg_exact(x).alias("avg_x"),
            avg_exact(y).alias("avg_y"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .orderBy(key)
    )


def flag_split_stats(
    events: DataFrame,
    flag_ids: list[int],
    id_col: str = "user_id",
    value: str = "value",
) -> DataFrame:
    """A8 avg-by-boolean-flag (``nb:66529 (c105)``) — the airport-pickup
    tip-percent query transplanted: is_flag = id IN (...)."""
    return (
        events.withColumn("is_flag", F.col(id_col).isin(flag_ids))
        .groupBy("is_flag")
        .agg(avg_exact(value).alias("avg_value"), F.count(F.lit(1)).alias("cnt"))
        .orderBy("is_flag")
    )


def group_type_stats(
    events: DataFrame,
    flag_ids: list[int],
    ts: str = "ts",
    id_col: str = "user_id",
    value: str = "value",
) -> DataFrame:
    """A10 4-agg by derived trip_type (``nb:122693 (c147)``): label rows
    airport/non_airport-style via CASE, aggregate rounded stats per type."""
    typed = events.withColumn(
        "trip_type",
        F.when(F.col(id_col).isin(flag_ids), F.lit("flagged")).otherwise(
            F.lit("non_flagged")
        ),
    )
    return (
        typed.groupBy("trip_type")
        .agg(
            F.round(avg_exact(value), 2).alias("avg_value"),
            F.round(avg_exact(F.hour(F.col(ts))), 2).alias("avg_hour"),
            F.count(F.lit(1)).alias("trips"),
        )
        .orderBy("trip_type")
    )


def count_nonnull_by_group(df: DataFrame, key: str, counted: str) -> DataFrame:
    """A11 null-skipping count per group (``nb:116820 (c109)``)."""
    return (
        df.groupBy(key)
        .agg(F.count(F.col(counted)).alias("nonnull_cnt"))
        .orderBy(key)
    )
