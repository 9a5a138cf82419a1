"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` smoke-runs the flagship query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 (plus training-data-pipeline extensions) with DuckDB oracles.
Implementation lives in ``newyork_taxi_etl_spark/`` — this file is a thin
re-export so the registry stays importable as a library.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from newyork_taxi_etl_spark import registry  # noqa: E402
from newyork_taxi_etl_spark.session import tune  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (traffic congestion by time-of-day slot) at sf0.001."""
    tune(spark)
    return registry.queries()["traffic_congestion"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    return registry.oracle_sql()
