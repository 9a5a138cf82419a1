"""S8 zone-lookup CSV + broadcast enrichment (the one deliberate capability
upgrade over the reference, SURVEY §2.3: the reference never loads the CSV,
hardcoding airport_ids=[1,132,138] at nb:66172 (c101))."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from newyork_taxi_etl_spark.schema import AIRPORT_IDS
from newyork_taxi_etl_spark.sources.readers import read_zones_csv
from tests.taxi_fixture import make_taxi_df

ZONES_CSV = (
    "LocationID,Borough,Zone,service_zone\n"
    "1,EWR,Newark Airport,EWR\n"
    "132,Queens,JFK Airport,Airports\n"
    "138,Queens,LaGuardia Airport,Airports\n"
    "237,Manhattan,Upper East Side South,Yellow Zone\n"
    "236,Manhattan,Upper East Side North,Yellow Zone\n"
)


def test_zones_csv_scan_and_broadcast_enrich(spark, tmp_path):
    path = os.path.join(tmp_path, "zones.csv")
    with open(path, "w") as f:
        f.write(ZONES_CSV)

    zones = read_zones_csv(spark, path)
    assert [f.name for f in zones.schema.fields] == [
        "LocationID", "Borough", "Zone", "service_zone",
    ]
    assert zones.count() == 5

    trips = make_taxi_df(spark)
    enriched = trips.join(
        F.broadcast(zones),
        trips.PULocationID == zones.LocationID,
        "left",
    )
    # left join preserves every trip
    assert enriched.count() == trips.count()
    # the literal-list flag and the joined dimension agree on airports
    both = enriched.select(
        F.col("PULocationID").isin(AIRPORT_IDS).alias("flag_literal"),
        F.col("Zone").rlike("Airport").alias("flag_joined"),
    ).filter(F.col("flag_joined").isNotNull())
    assert both.filter(F.col("flag_literal") != F.col("flag_joined")).count() == 0
    # physical plan: the dimension side broadcasts, the fact side never shuffles
    plan = enriched._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
