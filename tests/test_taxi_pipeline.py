"""Golden-pipeline replay on the branch-coverage fixture (SURVEY §5.2.2)
plus property checks on the cleaning operators (§5.2.4)."""

from __future__ import annotations

from pyspark.sql import functions as F

from newyork_taxi_etl_spark.operators import clean as C
from newyork_taxi_etl_spark.operators import features as X
from newyork_taxi_etl_spark.plans.pipeline import defacto_pipeline, documented_pipeline
from tests.taxi_fixture import LABELED_ROWS, expected_kept_ids, make_taxi_df


def test_defacto_pipeline_keeps_exactly_expected_rows(spark):
    df = make_taxi_df(spark)
    out = defacto_pipeline(df)
    kept = sorted(r.row_id for r in out.select("row_id").collect())
    assert kept == expected_kept_ids()


def test_stage_by_stage_fates(spark):
    """Each labeled row is dropped at exactly the stage its label names."""
    df = C.add_duration(make_taxi_df(spark))
    survivors = {
        "speed": C.speed_filter(df),
    }
    survivors["distance_cap"] = C.distance_cap_filter(survivors["speed"])
    survivors["keep_or_drop"] = C.keep_or_drop_filter(survivors["distance_cap"])
    signed = C.sign_fix(survivors["keep_or_drop"])
    survivors["fare_validation"] = C.fare_validation_filter(signed)
    survivors["passenger"] = C.passenger_filter(survivors["fare_validation"])

    ids = {k: {r.row_id for r in v.select("row_id").collect()} for k, v in survivors.items()}
    for row, fate in LABELED_ROWS:
        rid = row[0]
        if fate == "speed":
            assert rid not in ids["speed"], rid
        elif fate == "distance_cap":
            assert rid in ids["speed"] and rid not in ids["distance_cap"], rid
        elif fate == "keep_or_drop":
            assert rid in ids["distance_cap"] and rid not in ids["keep_or_drop"], rid
        elif fate == "fare_validation":
            assert rid in ids["keep_or_drop"] and rid not in ids["fare_validation"], rid
        elif fate == "passenger":
            assert rid in ids["fare_validation"] and rid not in ids["passenger"], rid
        else:
            assert rid in ids["passenger"], rid


def test_sign_fix_only_touches_fixable_payments_and_is_idempotent(spark):
    df = C.add_duration(make_taxi_df(spark))
    once = C.sign_fix(df)
    twice = C.sign_fix(once)
    # idempotent
    assert once.exceptAll(twice).count() == 0
    # payment 4 row keeps its negative fare; payment 1 row flipped
    rows = {r.row_id: r for r in once.collect()}
    assert rows[21].fare_amount == -5.0
    assert rows[20].fare_amount == 12.0 and rows[20].tip_amount == 2.0


def test_null_cluster_drops_at_fare_validation_not_before(spark):
    df = C.add_duration(make_taxi_df(spark))
    pre = C.keep_or_drop_filter(C.distance_cap_filter(C.speed_filter(df)))
    assert 16 in {r.row_id for r in pre.collect()}
    post = C.fare_validation_filter(C.sign_fix(pre))
    assert 16 not in {r.row_id for r in post.collect()}


def test_slot_bucketing_total_over_hours(spark):
    """Slot CASE covers all 24 hours with the c88 boundaries."""
    from newyork_taxi_etl_spark.functions.datetime import time_of_day_slot

    df = spark.range(24).withColumn(
        "ts", F.expr("timestamp'2024-01-15 00:00:00' + make_interval(0,0,0,0,id)")
    )
    got = {r.id: r.slot for r in df.withColumn("slot", time_of_day_slot("ts")).collect()}
    for h in range(24):
        want = (
            "Night" if h <= 5 else "Morning" if h <= 11 else
            "Afternoon" if h <= 16 else "Evening" if h <= 20 else "LateNight"
        )
        assert got[h] == want, (h, got[h])


def test_average_speed_is_per_minute_bug_preserved(spark):
    """SURVEY §2.9.4: average_speed = distance/minutes (NOT mph)."""
    df = X.add_average_speed(C.add_duration(make_taxi_df(spark)))
    r = {x.row_id: x for x in df.collect()}[1]
    assert abs(r.average_speed - 2.0 / 10.0) < 1e-12


def test_documented_pipeline_drops_out_of_year_row(spark):
    df = make_taxi_df(spark)
    out = documented_pipeline(df)
    kept = {r.row_id for r in out.select("row_id").collect()}
    assert 23 not in kept          # year filter (dead branch) active here
    assert 28 in kept              # swapped row survives after swap fix
    defacto_kept = {r.row_id for r in defacto_pipeline(df).select("row_id").collect()}
    assert 23 in defacto_kept      # de-facto lineage skips the year filter


def test_final_schema_casts(spark):
    out = defacto_pipeline(make_taxi_df(spark))
    dtypes = dict(out.dtypes)
    assert dtypes["passenger_count"] == "int"
    assert dtypes["RatecodeID"] == "int"
    assert dtypes["payment_type"] == "int"
    assert dtypes["tpep_pickup_datetime"] == "timestamp"
    assert not dtypes.get("Airport_fee")  # normalized at ingest in engine


def test_features_tip_percent_null_on_zero_total(spark):
    df = spark.createDataFrame(
        [(10.0, 0.0), (5.0, 50.0)], ["tip_amount", "total_amount"]
    )
    out = X.add_tip_percent(df).collect()
    assert out[0].tip_percent is None     # non-ANSI /0 -> NULL
    assert out[1].tip_percent == 10.0
