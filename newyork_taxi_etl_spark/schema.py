"""Pinned schemas.

The reference relies on Parquet-footer schema inference (``nb:441 (c3)``,
SURVEY §1.2); the engine pins explicit ``StructType``s instead — at 100 TB
footer-sampling schema inference is both a correctness hazard (drifting
files) and a planning cost.

Two families:
  * the NYC-taxi raw/clean schemas (reference parity; ``nb:473 (c4)`` output),
  * the driver's synthetic testdata tables (TESTDATA.md).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# NYC taxi (reference fact table), raw as inferred at nb:473 (c4).
# timestamp_ntz in the raw file; the pipeline casts via to_timestamp
# (nb:64659 (c81)).
# ---------------------------------------------------------------------------
TAXI_RAW = T.StructType(
    [
        T.StructField("VendorID", T.IntegerType()),
        T.StructField("tpep_pickup_datetime", T.TimestampNTZType()),
        T.StructField("tpep_dropoff_datetime", T.TimestampNTZType()),
        T.StructField("passenger_count", T.LongType()),
        T.StructField("trip_distance", T.DoubleType()),
        T.StructField("RatecodeID", T.LongType()),
        T.StructField("store_and_fwd_flag", T.StringType()),
        T.StructField("PULocationID", T.IntegerType()),
        T.StructField("DOLocationID", T.IntegerType()),
        T.StructField("payment_type", T.LongType()),
        T.StructField("fare_amount", T.DoubleType()),
        T.StructField("extra", T.DoubleType()),
        T.StructField("mta_tax", T.DoubleType()),
        T.StructField("tip_amount", T.DoubleType()),
        T.StructField("tolls_amount", T.DoubleType()),
        T.StructField("improvement_surcharge", T.DoubleType()),
        T.StructField("total_amount", T.DoubleType()),
        T.StructField("congestion_surcharge", T.DoubleType()),
        T.StructField("Airport_fee", T.DoubleType()),
    ]
)

#: TLC zone lookup (FIXTURES.md A2). The reference hardcodes
#: airport_ids=[1,132,138] (nb:66172 (c101)); the engine loads the dimension
#: and broadcast-joins it (SURVEY §2.3).
TAXI_ZONES = T.StructType(
    [
        T.StructField("LocationID", T.IntegerType()),
        T.StructField("Borough", T.StringType()),
        T.StructField("Zone", T.StringType()),
        T.StructField("service_zone", T.StringType()),
    ]
)

#: Airport location ids exactly as hardcoded in the reference
#: (nb:66172 (c101), report:500-505).
AIRPORT_IDS = [1, 132, 138]

#: Categorical decoders (report:26-28; decode at nb:117225 (c111)).
RATECODE_NAMES = {
    1: "Standard",
    2: "JFK",
    3: "Newark",
    4: "Nassau/Westchester",
    5: "Negotiated",
    6: "Group ride",
    99: "Unknown",
}
PAYMENT_NAMES = {
    0: "Flex fare",
    1: "Credit card",
    2: "Cash",
    3: "No charge",
    4: "Dispute",
    6: "Voided trip",
}

# ---------------------------------------------------------------------------
# Driver testdata tables (TESTDATA.md; schemas verified via pyarrow).
# ---------------------------------------------------------------------------
EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampNTZType()),
    ]
)

TESTDATA_TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]
