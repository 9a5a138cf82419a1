"""Property-based checks on the cleaning operators (SURVEY §5.2.4).

Each Hypothesis example generates a BATCH of synthetic taxi-shaped rows and
runs one Spark job over it, asserting invariants that must hold for every
input, not just the golden fixture:

  * sign_fix is idempotent and only ever touches payment_type ∈ {0,1,2};
  * keep_or_drop never drops a row with trip_distance > 0, and always keeps
    zero-distance rows paid by card/cash (rules 1-2 fire first);
  * time_of_day_slot is total and non-null over hours 0-23 and matches the
    reference's bands (Night 0-5, Morning 6-11, Afternoon 12-16,
    Evening 17-20, LateNight 21-23);
  * fare_validation drops every RatecodeID ∉ {1,2,3,4} (NULL expected fare
    ⇒ NULL predicate ⇒ dropped, §2.9.2);
  * speed_filter silently drops zero-duration rows (x/0.0 → NULL in
    non-ANSI mode, §2.9.5).

max_examples is kept small: one example = one Spark job; the point is
branch-space coverage via shrinking, not volume.
"""

from __future__ import annotations

import datetime as dt

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from newyork_taxi_etl_spark.functions.datetime import time_of_day_slot
from newyork_taxi_etl_spark.operators import clean

PAYMENTS = st.sampled_from([0, 1, 2, 3, 4, 6])
RATECODES = st.sampled_from([1, 2, 3, 4, 5, 6, 99])
MONEY = st.floats(
    min_value=-500, max_value=500, allow_nan=False, allow_infinity=False
)

ROW = st.tuples(
    st.floats(min_value=0, max_value=60, allow_nan=False),  # trip_distance
    st.floats(min_value=0, max_value=400, allow_nan=False),  # time_take_min
    PAYMENTS,
    RATECODES,
    MONEY,  # fare_amount
    MONEY,  # tip_amount
)

BATCH = st.lists(ROW, min_size=1, max_size=40)

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)


def _df(spark, rows):
    return spark.createDataFrame(
        [
            (float(d), float(m), int(p), int(r), float(f), float(t))
            for d, m, p, r, f, t in rows
        ],
        "trip_distance double, time_take_min double, payment_type int, "
        "RatecodeID int, fare_amount double, tip_amount double",
    )


@settings(**_SETTINGS)
@given(BATCH)
def test_sign_fix_idempotent_and_scoped(spark, rows):
    df = _df(spark, rows)
    cols = ["fare_amount", "tip_amount"]
    once = clean.sign_fix(df, cols)
    twice = clean.sign_fix(once, cols)
    got_once = sorted(map(tuple, once.collect()))
    got_twice = sorted(map(tuple, twice.collect()))
    assert got_once == got_twice  # idempotent
    for row in once.collect():
        if row.payment_type in (0, 1, 2):
            assert row.fare_amount >= 0 and row.tip_amount >= 0
    # untouchable rows pass through bit-identically
    before = {
        (r.trip_distance, r.time_take_min, r.fare_amount, r.tip_amount)
        for r in df.filter(F.col("payment_type").isin(3, 4, 6)).collect()
    }
    after = {
        (r.trip_distance, r.time_take_min, r.fare_amount, r.tip_amount)
        for r in once.filter(F.col("payment_type").isin(3, 4, 6)).collect()
    }
    assert before == after


@settings(**_SETTINGS)
@given(BATCH)
def test_keep_or_drop_scope(spark, rows):
    df = _df(spark, rows)
    kept = clean.keep_or_drop_filter(df)
    # never drops a moving trip
    assert kept.filter(F.col("trip_distance") > 0).count() == df.filter(
        F.col("trip_distance") > 0
    ).count()
    # zero-distance card/cash rows always survive (rules 1-2 fire first)
    zero_card = (F.col("trip_distance") == 0) & F.col("payment_type").isin(1, 2)
    assert kept.filter(zero_card).count() == df.filter(zero_card).count()
    # zero-distance voided/disputed rows never survive (rule 3)
    zero_void = (F.col("trip_distance") == 0) & F.col("payment_type").isin(3, 4, 6)
    assert kept.filter(zero_void).count() == 0


def test_time_of_day_slot_total_over_hours(spark):
    df = spark.range(24).select(
        F.col("id").cast("int").alias("h"),
        F.make_timestamp(
            F.lit(2024), F.lit(1), F.lit(15), F.col("id"), F.lit(0), F.lit(0)
        ).alias("ts"),
    )
    got = {
        r.h: r.slot
        for r in df.select("h", time_of_day_slot("ts").alias("slot")).collect()
    }
    for h in range(24):
        expected = (
            "Night"
            if h <= 5
            else "Morning"
            if h <= 11
            else "Afternoon"
            if h <= 16
            else "Evening"
            if h <= 20
            else "LateNight"
        )
        assert got[h] == expected, (h, got[h])


@settings(**_SETTINGS)
@given(BATCH)
def test_fare_validation_drops_unknown_ratecodes(spark, rows):
    df = _df(spark, rows)
    kept = clean.fare_validation_filter(df)
    assert kept.filter(~F.col("RatecodeID").isin(1, 2, 3, 4)).count() == 0


@settings(**_SETTINGS)
@given(st.lists(st.floats(min_value=0, max_value=60, allow_nan=False), min_size=1, max_size=20))
def test_speed_filter_drops_zero_duration(spark, distances):
    rows = [(float(d), 0.0, 1, 1, 10.0, 0.0) for d in distances]
    df = _df(spark, rows)
    assert clean.speed_filter(df).count() == 0
