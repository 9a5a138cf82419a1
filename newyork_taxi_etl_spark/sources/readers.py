"""Sources (SURVEY §2.1 S1/S4/S8).

Design notes for scale:
  * Explicit schemas where we own the data contract (taxi) — no footer
    inference over 100k files.
  * Column-name normalization at ingest replaces the reference's accidental
    case-insensitive ``Airport_fee`` -> ``airport_fee`` respelling
    (SURVEY §2.9.7) with an explicit, documented step.
  * Plain ``spark.read.parquet`` keeps predicate pushdown / column pruning /
    partition pruning available to Catalyst (SURVEY §4).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from newyork_taxi_etl_spark import schema as S

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def read_parquet(spark: SparkSession, path: str, schema=None) -> DataFrame:
    """Parquet scan (S1, ``nb:441 (c3)``)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def parquet_rowcount(path: str) -> int:
    """Exact row count of a parquet file/directory from footer metadata —
    no Spark job, no data pages read (r14 ADVICE: adaptive-k derivations
    on otherwise fully stage-cached paths should not pay a corpus scan
    just to learn n).  Footer num_rows is exact by the parquet spec, so
    this equals ``spark.read.parquet(path).count()``."""
    import pyarrow.parquet as pq

    if os.path.isfile(path):
        return pq.ParquetFile(path).metadata.num_rows
    total = 0
    for root, _dirs, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet") and not fn.startswith((".", "_")):
                total += pq.ParquetFile(
                    os.path.join(root, fn)
                ).metadata.num_rows
    return total


def load_tables(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: list[str] | None = None
) -> dict[str, DataFrame]:
    """Load the driver's testdata tables (TESTDATA.md)."""
    names = names or S.TESTDATA_TABLES
    return {n: spark.read.parquet(table_path(sf_dir, n)) for n in names}


def register_views(
    spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR, names: list[str] | None = None
) -> None:
    """Register testdata tables as temp views for the SQL surface (§3.2)."""
    for name, df in load_tables(spark, sf_dir, names).items():
        df.createOrReplaceTempView(name)


def read_events(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Events scan with timestamp-type normalization to TIMESTAMP (LTZ).

    The driver testdata has shipped ``events.ts`` two ways across rounds:
    parquet TIMESTAMP(NANOS) (Spark 4 only reads it via
    ``spark.sql.legacy.parquet.nanosAsLong`` — convert with integer
    division, a double roundtrip would lose precision above 2^53, then
    ``timestamp_micros``) and parquet timestamp[us] with no timezone
    (Spark 4 infers TIMESTAMP_NTZ, which ``withWatermark`` and every
    window/streaming operator reject). Normalize both to TIMESTAMP; the
    session timezone is pinned UTC (session.DYNAMIC_CONFS) so the NTZ cast
    preserves wall-clock values and matches DuckDB's naive-timestamp read.
    """
    df = spark.read.parquet(table_path(sf_dir, "events"))
    t = dict(df.dtypes).get("ts")
    if t == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif t == "timestamp_ntz":
        df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def read_taxi_raw(spark: SparkSession, path: str) -> DataFrame:
    """Taxi fact scan with pinned schema + explicit name normalization.

    Replaces the reference's reliance on (a) footer inference and (b) the
    case-insensitive ``Airport_fee`` respelling side effect (nb:63337 (c55)).
    """
    df = read_parquet(spark, path, schema=S.TAXI_RAW)
    return df.withColumnRenamed("Airport_fee", "airport_fee")


def read_zones_csv(spark: SparkSession, path: str) -> DataFrame:
    """Zone-lookup CSV (S8) — never actually loaded by the reference
    (README.md:20; distilled to airport_ids at nb:66172 (c101)); the engine
    loads it properly for the broadcast-join enrichment path."""
    return spark.read.csv(path, header=True, schema=S.TAXI_ZONES)


def zones_from_literals(spark: SparkSession) -> DataFrame:
    """Minimal in-memory zone dimension for environments without the CSV —
    airports per the reference literal list, everything else 'Other'."""
    rows = [(i, "Airport" if i in S.AIRPORT_IDS else "Other") for i in range(1, 266)]
    from newyork_taxi_etl_spark.localrel import local_rows_df

    return local_rows_df(spark, rows, ["LocationID", "zone_kind"])


def is_airport(col):
    """``PULocationID.isin([1,132,138])`` (P6, nb:66254 (c104))."""
    return F.col(col).isin(S.AIRPORT_IDS) if isinstance(col, str) else col.isin(S.AIRPORT_IDS)
