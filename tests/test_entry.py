"""Driver-contract smoke tests (mirrors the driver's t1 gate)."""

from __future__ import annotations


def test_entry_returns_rows(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    cols = set(df.columns)
    assert {"time_of_day_slot", "avg_value", "trip_count"} <= cols


def test_every_query_has_callable_and_runs_smoke(spark):
    import __spark_entry__ as e

    qs = e.queries()
    oracles = e.oracle_sql()
    assert qs, "registry is empty"
    # every oracle key must have a query
    assert set(oracles) <= set(qs)
    for name, fn in qs.items():
        df = fn(spark, "/root/testdata/sf0.001")
        assert df.columns, name
