"""Feature-engineering operators (SURVEY §1.2 derived columns; c86-c88,
c101-c104, c147). Pure projections — no shuffles, no UDFs."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newyork_taxi_etl_spark.functions.datetime import time_of_day_slot
from newyork_taxi_etl_spark.schema import AIRPORT_IDS


def add_average_speed(df: DataFrame) -> DataFrame:
    """``average_speed`` (nb:64780 (c86)): trip_distance / time_take_min.

    NOTE: distance per MINUTE, not mph — the reference's own bug, kept for
    parity (SURVEY §2.9.4). Aliased avg_speed_mph downstream regardless.
    """
    return df.withColumn(
        "average_speed", F.col("trip_distance") / F.col("time_take_min")
    )


def add_calendar_features(df: DataFrame) -> DataFrame:
    """hour/day-of-week/slot (nb:64802 (c87), nb:64830 (c88))."""
    return (
        df.withColumn("pickup_hour_of_day", F.hour("tpep_pickup_datetime"))
        .withColumn("pickup_day_of_week", F.dayofweek("tpep_pickup_datetime"))
        .withColumn("time_of_day_slot", time_of_day_slot("tpep_pickup_datetime"))
    )


def add_tip_percent(df: DataFrame) -> DataFrame:
    """``tip_percent`` (nb:66196 (c102)): round(tip/total*100, 2).
    total_amount=0 divides to NULL under non-ANSI semantics."""
    return df.withColumn(
        "tip_percent",
        F.round(F.col("tip_amount") / F.col("total_amount") * 100, 2),
    )


def add_airport_flag(df: DataFrame) -> DataFrame:
    """``is_airport_pickup`` (nb:66254 (c104)): PULocationID ∈ {1,132,138}."""
    return df.withColumn("is_airport_pickup", F.col("PULocationID").isin(AIRPORT_IDS))


def add_trip_type(df: DataFrame) -> DataFrame:
    """``trip_type`` + ``tip_pct`` (nb:122693 (c147)). Note tip_pct uses
    fare_amount as denominator — a different ratio than tip_percent
    (SURVEY §1.2) — and nulls out when fare <= 0."""
    return df.withColumn(
        "trip_type",
        F.when(F.col("PULocationID").isin(AIRPORT_IDS), "airport").otherwise(
            "non_airport"
        ),
    ).withColumn(
        "tip_pct",
        F.when(
            F.col("fare_amount") > 0,
            F.col("tip_amount") / F.col("fare_amount") * 100,
        ),
    )


def add_partition_cols(df: DataFrame) -> DataFrame:
    """pickup_year/month/day partition columns (nb:117803 (c118))."""
    return (
        df.withColumn("pickup_year", F.year("tpep_pickup_datetime"))
        .withColumn("pickup_month", F.month("tpep_pickup_datetime"))
        .withColumn("pickup_day", F.dayofmonth("tpep_pickup_datetime"))
    )
