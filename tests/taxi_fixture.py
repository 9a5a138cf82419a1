"""Synthetic taxi-shaped fixture exercising every cleaning-rule branch
(FIXTURES.md A1 branch-coverage list). Each row is labeled by the fate the
reference pipeline should assign it, so tests assert per-stage behavior."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import types as T

from newyork_taxi_etl_spark.schema import TAXI_RAW

BASE = dt.datetime(2024, 1, 15, 8, 0, 0)


def _row(
    rid,
    *,
    pickup=BASE,
    dur_min=10.0,
    passengers=1,
    distance=2.0,
    rate=1,
    flag="N",
    pu=161,
    do=237,
    payment=1,
    fare=None,
    extra=0.0,
    mta=0.5,
    tip=2.0,
    tolls=0.0,
    imp=1.0,
    total=None,
    congestion=2.5,
    airport=0.0,
    null_cluster=False,
):
    # default fare: well inside the validation window for rate 1
    if fare is None:
        fare = 3.00 + max(distance * 3.50, dur_min * 0.70)
    if total is None:
        total = fare + extra + mta + tip + tolls + imp + (congestion or 0) + (airport or 0)
    dropoff = pickup + dt.timedelta(minutes=dur_min)
    if null_cluster:
        passengers = rate = flag = congestion = airport = None
    return (
        rid,
        pickup,
        dropoff,
        passengers,
        float(distance),
        rate,
        flag,
        pu,
        do,
        payment,
        float(fare),
        float(extra),
        float(mta),
        float(tip),
        float(tolls),
        float(imp),
        float(total),
        congestion,
        airport,
    )


#: (row, expected_fate) — fate is the FIRST stage that drops it, or "keep".
LABELED_ROWS = [
    (_row(1), "keep"),                                           # clean standard trip
    (_row(2, distance=60.0, dur_min=90.0), "distance_cap"),      # > 50 mi at 40 mph
    (_row(3, distance=20.0, dur_min=12.0), "speed"),             # 100 mph
    (_row(4, dur_min=0.0), "speed"),                             # div-by-zero -> NULL -> drop (§2.9.5)
    # rule 1 keeps it at keep_or_drop, but expected fare >= 3 means any
    # fare <= 1 later dies at fare validation — faithful to the reference.
    (_row(5, distance=0.0, payment=1, fare=0.5, tip=0.0), "fare_validation"),
    (_row(6, distance=0.0, payment=2, fare=11.0, dur_min=12.0), "keep"),  # rule 2: cheap real, inside window [10.4, 21.4]
    (_row(7, distance=0.0, payment=3, fare=5.0), "keep_or_drop"),    # rule 3: voided
    (_row(8, distance=0.0, payment=6, fare=5.0), "keep_or_drop"),    # rule 3: voided (6)
    (_row(9, distance=0.0, payment=0, fare=0.0, dur_min=15.0), "keep_or_drop"),  # rule 4: meter glitch
    (_row(10, distance=0.0, payment=0, fare=25.0, dur_min=3.0), "keep_or_drop"),  # rule 5: fraud-shaped
    (_row(11, distance=0.0, payment=0, fare=10.0, dur_min=7.0), "fare_validation"),  # rule 6 keep; but fare 10 vs expected 7.9 ok -> compute: expected=3+max(0,4.9)=7.9; fare 10 <= 17.9 and >= 6.9 -> keeps! adjust below
    (_row(12, fare=200.0), "fare_validation"),                   # fare >> expected
    (_row(13, fare=1.0), "fare_validation"),                     # fare << expected
    (_row(14, rate=5), "fare_validation"),                       # rate 5 -> NULL expected (§2.9.2)
    (_row(15, rate=99), "fare_validation"),                      # rate 99 -> NULL expected
    (_row(16, null_cluster=True), "fare_validation"),            # null cluster: rate NULL drops here first
    (_row(17, passengers=0), "passenger"),                       # zero passengers
    (_row(18, rate=2, fare=70.0), "keep"),                       # JFK flat fare
    (_row(19, rate=3, fare=40.0, distance=5.0, dur_min=20.0), "keep"),  # Newark: 3+17.5+20=40.5, within [39.5, 50.5]
    (_row(20, payment=1, fare=-12.0, tip=-2.0, distance=2.0, dur_min=10.0), "sign_fixed_keep"),  # negative money, flipped to 12 -> expected 10 -> within window
    (_row(21, payment=4, distance=0.0, fare=-5.0), "keep_or_drop"),  # rule 3 drop (payment 4)
    (_row(22, pu=132, do=1), "keep"),                            # airport pickup
    (_row(23, pickup=dt.datetime(2023, 12, 31, 23, 50), dur_min=10.0), "keep"),  # out-of-year: kept by de-facto, dropped by documented
    (_row(24, pickup=BASE.replace(hour=2)), "keep"),             # Night slot
    (_row(25, pickup=BASE.replace(hour=13)), "keep"),            # Afternoon slot
    (_row(26, pickup=BASE.replace(hour=18)), "keep"),            # Evening slot
    (_row(27, pickup=BASE.replace(hour=22)), "keep"),            # LateNight slot
    # swapped timestamps (dropoff < pickup): de-facto lineage KEEPS it with a
    # negative duration (the swap fix lives in the dead branch, §2.9.1);
    # fare=10 sits inside the rate-1 window (expected = 3 + max(7, -7) = 10).
    (_row(28, dur_min=-10.0, fare=10.0), "keep"),
]
# row 11 actually survives fare validation (see inline math); relabel it.
LABELED_ROWS[10] = (LABELED_ROWS[10][0], "keep")


def make_taxi_df(spark):
    rows = [r for r, _ in LABELED_ROWS]
    schema = T.StructType(
        [T.StructField("row_id", T.IntegerType())] + list(TAXI_RAW.fields)[1:]
    )
    # reuse TAXI_RAW minus VendorID (row_id takes its slot for labeling)
    return spark.createDataFrame(rows, schema)


def expected_kept_ids():
    return sorted(
        row[0] for row, fate in LABELED_ROWS if fate in ("keep", "sign_fixed_keep")
    )
