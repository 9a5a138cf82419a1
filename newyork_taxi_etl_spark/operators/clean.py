"""Cleaning operators — the reference's de-facto lineage, re-expressed as
composable DataFrame ops (SURVEY §2.9.1).

Order (golden replay):
  raw → add_duration (c23) → speed_filter (c26) → distance_cap (c29)
      → keep_or_drop (c49) → sign_fix (c55) → fare_validation (c58)
      → passenger_filter (c69) → casts (c80-81) → features (c86-88)

The dead branch (year filter c33, timestamp swap c40, duration cap c43) is
implemented too — the report documents it as strategy — but
``plans.pipeline.defacto_pipeline`` excludes it, matching the executed
notebook (SURVEY §2.9.1).

Every quirk in SURVEY §2.9 is deliberate here:
  * non-ANSI division: x/0.0 -> NULL, so zero-duration rows silently drop
    in speed_filter (§2.9.5);
  * NULL three-valued logic drops null passenger_count and
    RatecodeID ∉ {1,2,3,4} (§2.9.2);
  * fare validation parenthesizes ~(A | B) per the executed notebook, not
    the report's ~(A) | (B) (§2.9.3);
  * keep_or_drop is a first-match-wins when-cascade (§2.9.6).

All ops are built-in column expressions — whole-stage codegen, no UDFs, no
shuffles (pure map-side filters/projections): the whole cleaning pipeline is
a single narrow stage at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MONEY_COLS = [
    "fare_amount",
    "extra",
    "mta_tax",
    "tip_amount",
    "tolls_amount",
    "improvement_surcharge",
    "total_amount",
    "congestion_surcharge",
    "airport_fee",
]


def add_duration(df: DataFrame) -> DataFrame:
    """``time_take_min`` (nb:60999 (c23)): minutes between pickup/dropoff."""
    return df.withColumn(
        "time_take_min",
        (
            F.unix_timestamp("tpep_dropoff_datetime")
            - F.unix_timestamp("tpep_pickup_datetime")
        )
        / 60.0,
    )


def speed_filter(df: DataFrame, max_mph: float = 50.0) -> DataFrame:
    """Speed cap (nb:61073 (c26)): dist/(min/60) <= 50.

    Divides by zero on zero-duration trips; non-ANSI Spark yields NULL and
    the filter silently drops those rows (§2.9.5). Reproduced, not fixed.
    """
    return df.filter(
        (F.col("trip_distance") / (F.col("time_take_min") / 60.0)) <= max_mph
    )


def distance_cap_filter(df: DataFrame, max_distance: float = 50.0) -> DataFrame:
    """Distance cap (nb:61392 (c29)): trip_distance <= 50."""
    return df.filter(F.col("trip_distance") <= max_distance)


def keep_or_drop_filter(df: DataFrame) -> DataFrame:
    """Zero-distance triage (nb:62553 (c49)) — first-match-wins cascade:

    1. KEEP dist=0, payment ∈ {1,2}, fare <= 1  (flag drop / crawl)
    2. KEEP dist=0, payment ∈ {1,2}             (cheap real trips)
    3. DROP dist=0, payment ∈ {3,4,6}           (voided/disputed)
    4. DROP dist=0, duration >= 10, fare = 0    (meter glitch)
    5. DROP dist=0, duration < 5, fare > 20     (fraud-shaped)
    otherwise KEEP.

    Transient ``keep_or_drop`` column is dropped after the filter (P12).
    """
    zero = F.col("trip_distance") == 0
    rule = (
        F.when(zero & F.col("payment_type").isin(1, 2) & (F.col("fare_amount") <= 1), "keep")
        .when(zero & F.col("payment_type").isin(1, 2), "keep")
        .when(zero & F.col("payment_type").isin(3, 4, 6), "drop")
        .when(zero & (F.col("time_take_min") >= 10) & (F.col("fare_amount") == 0), "drop")
        .when(zero & (F.col("time_take_min") < 5) & (F.col("fare_amount") > 20), "drop")
        .otherwise("keep")
    )
    return (
        df.withColumn("keep_or_drop", rule)
        .filter(F.col("keep_or_drop") == "keep")
        .drop("keep_or_drop")
    )


def sign_fix(df: DataFrame, money_cols: list[str] | None = None) -> DataFrame:
    """Negative-money sign flip (nb:63337 (c55)): for payment ∈ {0,1,2}
    negatives are data errors — flip them; for {3,4,6} (refund-shaped) leave
    as-is. This is also where the reference accidentally respells
    ``Airport_fee``→``airport_fee`` (§2.9.7); our reader normalizes at
    ingest instead."""
    cols = money_cols or MONEY_COLS
    fixable = F.col("payment_type").isin(0, 1, 2)
    out = df
    for c in cols:
        out = out.withColumn(
            c, F.when(fixable & (F.col(c) < 0), -F.col(c)).otherwise(F.col(c))
        )
    return out


def fare_validation_filter(df: DataFrame) -> DataFrame:
    """TLC meter-fare validation (nb:63555 (c58)).

    expected = base(rate) + distance_fare + time_fare (greatest of per-mile
    vs per-minute increments, TLC meter rules); keep rows within
    [expected-1, expected+10] — parenthesized ``~(A | B)`` per the executed
    notebook (§2.9.3). RatecodeID ∉ {1,2,3,4} ⇒ expected is NULL ⇒ predicate
    NULL ⇒ row dropped (three-valued logic, §2.9.2).
    """
    distance_fare = F.col("trip_distance") * F.lit(3.50)
    time_fare = F.col("time_take_min") * F.lit(0.70)
    meter = F.greatest(distance_fare, time_fare)
    expected = (
        F.when(F.col("RatecodeID") == 1, F.lit(3.00) + meter)
        .when(F.col("RatecodeID") == 2, F.lit(70.00))
        .when(F.col("RatecodeID") == 3, F.lit(3.00) + meter + F.lit(20.00))
        .when(F.col("RatecodeID") == 4, F.lit(3.00) + meter)
    )
    df = df.withColumn("expected_meter_fare", expected)
    out = df.filter(
        ~(
            (F.col("fare_amount") > F.col("expected_meter_fare") + 10)
            | (F.col("fare_amount") < F.col("expected_meter_fare") - 1)
        )
    )
    return out.drop("expected_meter_fare")


def passenger_filter(df: DataFrame) -> DataFrame:
    """passenger_count > 0 (nb:64146 (c69)); NULLs drop via 3VL (§2.9.2)."""
    return df.filter(F.col("passenger_count") > 0)


def apply_casts(df: DataFrame) -> DataFrame:
    """Schema tightening (nb:64634 (c80), nb:64659 (c81)): long→int for the
    coded columns, timestamp_ntz→timestamp via to_timestamp."""
    return (
        df.withColumn("passenger_count", F.col("passenger_count").cast("int"))
        .withColumn("RatecodeID", F.col("RatecodeID").cast("int"))
        .withColumn("payment_type", F.col("payment_type").cast("int"))
        .withColumn("tpep_pickup_datetime", F.to_timestamp("tpep_pickup_datetime"))
        .withColumn("tpep_dropoff_datetime", F.to_timestamp("tpep_dropoff_datetime"))
    )


# --- dead branch (documented lineage, SURVEY §2.9.1) -----------------------


def year_filter(df: DataFrame, year: int = 2024) -> DataFrame:
    """Keep rows whose pickup year matches (nb:61492 (c33), dead branch)."""
    return df.filter(F.year("tpep_pickup_datetime") == year)


def timestamp_swap_fix(df: DataFrame) -> DataFrame:
    """Swap pickup/dropoff where dropoff < pickup (nb:62065 (c40), dead
    branch): conditional projection + rename-back (P9+P11+P12)."""
    swapped = F.col("tpep_dropoff_datetime") < F.col("tpep_pickup_datetime")
    return (
        df.withColumn(
            "pickup_fixed",
            F.when(swapped, F.col("tpep_dropoff_datetime")).otherwise(
                F.col("tpep_pickup_datetime")
            ),
        )
        .withColumn(
            "dropoff_fixed",
            F.when(swapped, F.col("tpep_pickup_datetime")).otherwise(
                F.col("tpep_dropoff_datetime")
            ),
        )
        .drop("tpep_pickup_datetime", "tpep_dropoff_datetime")
        .withColumnRenamed("pickup_fixed", "tpep_pickup_datetime")
        .withColumnRenamed("dropoff_fixed", "tpep_dropoff_datetime")
    )


def add_duration_recompute(df: DataFrame) -> DataFrame:
    """Recompute time_take_min after the swap fix (dead branch, c41-42)."""
    return add_duration(df)


def duration_cap_filter(df: DataFrame, max_minutes: float = 300.0) -> DataFrame:
    """time_take_min < 300 (nb:62129 (c42), dead branch)."""
    return df.filter(F.col("time_take_min") < max_minutes)
