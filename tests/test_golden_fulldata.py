"""Env-gated full-data golden replay (SURVEY §5.2.3, VERDICT r1 item 7).

The real January-2024 NYC taxi parquet is not shipped in this sandbox; when
it exists (path via ``NYC_TAXI_PARQUET``, or the conventional filename in
cwd), replay the de-facto lineage and assert the reference's golden chain
(``nb:507 (c5)`` 2,964,624 raw → ``nb:66233 (c103)`` 2,644,148 cleaned).
Skips cleanly where the file is absent; passes wherever the data exists.
"""

from __future__ import annotations

import os

import pytest

_CANDIDATES = [
    os.environ.get("NYC_TAXI_PARQUET", ""),
    "yellow_tripdata_2024-01.parquet",
    "/root/data/yellow_tripdata_2024-01.parquet",
]
TAXI_PATH = next((p for p in _CANDIDATES if p and os.path.exists(p)), None)


@pytest.mark.skipif(
    TAXI_PATH is None,
    reason="real yellow_tripdata_2024-01.parquet not present "
    "(set NYC_TAXI_PARQUET to enable)",
)
def test_golden_chain_full_data(spark):
    from newyork_taxi_etl_spark.operators import clean as C
    from newyork_taxi_etl_spark.plans.pipeline import defacto_pipeline
    from newyork_taxi_etl_spark.sources.readers import read_taxi_raw

    raw = read_taxi_raw(spark, TAXI_PATH)
    assert raw.count() == 2_964_624  # nb:507 (c5)

    cleaned = defacto_pipeline(raw)
    assert cleaned.count() == 2_644_148  # nb:66233 (c103)

    # post-clean invariants the reference eyeballed (nb:64307-64493 outputs)
    rate_ids = {
        r[0]
        for r in cleaned.select("RatecodeID").distinct().collect()
    }
    assert rate_ids == {1, 2, 3, 4}  # fare validation drops 5/6/99/NULL

    # keep_or_drop stage drops exactly 8,713 rows (nb:62553 (c49) stdout)
    pre = C.distance_cap_filter(
        C.speed_filter(C.add_duration(raw))
    )
    post = C.keep_or_drop_filter(pre)
    assert pre.count() - post.count() == 8_713
