"""Differential tests: every registered query vs its DuckDB oracle at sf0.01.

This mirrors the driver's t2 correctness gate (SURVEY §5.2.1).
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE
from tests.oracle_harness import compare


def _names():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    from newyork_taxi_etl_spark import registry

    return sorted(registry.queries())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(spark, name):
    ok, msg = compare(spark, name, SF_ORACLE)
    assert ok, msg
