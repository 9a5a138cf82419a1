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


def test_scd2_invariants(spark):
    """SCD2 history invariants beyond the value oracle: exactly one
    current row per key, closed rows abut their successors (valid_to ==
    successor valid_from), and history grows by exactly the changed-key
    count."""
    from pyspark.sql import functions as F

    from newyork_taxi_etl_spark.registry import queries
    from newyork_taxi_etl_spark.sources.readers import table_path

    hist = queries()["scd2_dimension_history"](spark, SF_SMOKE)
    per = hist.groupBy("custkey").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_cur"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    assert per.filter(F.col("n_cur") != 1).count() == 0
    assert per.filter(~F.col("n_rows").isin(1, 2)).count() == 0
    n_cust = spark.read.parquet(table_path(SF_SMOKE, "customer")).count()
    two_row = per.filter(F.col("n_rows") == 2).count()
    assert hist.count() == n_cust + two_row and two_row > 0
    # closed row's valid_to must equal its successor's valid_from
    bad = (
        hist.filter(~F.col("is_current"))
        .select("custkey", "valid_to")
        .join(
            hist.filter(F.col("is_current")).select("custkey", "valid_from"),
            "custkey",
        )
        .filter(F.col("valid_to") != F.col("valid_from"))
    )
    assert bad.count() == 0
