"""DESCRIBE DETAIL analog assertions (VERDICT r1 item 6)."""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_describe_table_detail_fields(spark):
    from newyork_taxi_etl_spark.queries.sinks import describe_table_detail_full

    rows = describe_table_detail_full(spark, SF_SMOKE).collect()
    assert len(rows) == 1
    d = rows[0].asDict()
    assert d["tbl_format"] == "parquet"
    assert d["tbl_name"] == "nyetl_events_detail_tbl"
    assert d["partition_columns"] == "event_month"
    assert d["num_partitions"] >= 1
    # at least one data file per partition directory
    assert d["num_files"] >= d["num_partitions"]


def test_describe_table_detail_registered_drops_file_count(spark):
    # the registered variant must be fully deterministic (value-checkable):
    # same row as the full detail, minus the env-dependent num_files
    from newyork_taxi_etl_spark.registry import queries

    df = queries()["describe_table_detail"](spark, SF_SMOKE)
    assert "num_files" not in df.columns
    assert df.columns == [
        "tbl_format", "tbl_name", "partition_columns", "num_partitions"
    ]
