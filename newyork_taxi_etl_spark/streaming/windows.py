"""Time-window operators (SURVEY §7.1 M4 extension; no streams exist in the
reference — time-series behavior there is plain timestamp columns).

The same ``F.window``/``F.session_window`` expressions work in batch and in
Structured Streaming; batch mode is what the DuckDB oracle checks, streaming
mode is exercised via ``run_stream_availablenow`` (readStream → watermark →
windowed agg → memory sink).

Scale notes: tumbling/sliding windows are hash aggregates on (window, key) —
partial aggregation applies; session windows require a per-key sort (Spark
plans UpdatingSessionsExec); watermarks bound state size in streaming mode.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newyork_taxi_etl_spark.functions.exact import avg_exact


def tumbling_agg(
    df: DataFrame, ts: str = "ts", dur: str = "1 hour", value: str = "value"
) -> DataFrame:
    """Tumbling-window count/avg."""
    return (
        df.groupBy(F.window(ts, dur).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            avg_exact(value).alias("avg_value"),
        )
        .select(F.col("w.start").alias("w_start"), "cnt", "avg_value")
        .orderBy("w_start")
    )


def sliding_agg(
    df: DataFrame,
    ts: str = "ts",
    dur: str = "1 hour",
    slide: str = "30 minutes",
    value: str = "value",
) -> DataFrame:
    """Sliding-window count/avg (each row lands in dur/slide windows)."""
    return (
        df.groupBy(F.window(ts, dur, slide).alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            avg_exact(value).alias("avg_value"),
        )
        .select(F.col("w.start").alias("w_start"), "cnt", "avg_value")
        .orderBy("w_start")
    )


def session_agg(
    df: DataFrame,
    key: str = "user_id",
    ts: str = "ts",
    gap: str = "30 minutes",
) -> DataFrame:
    """Session windows per key (gap-based)."""
    return (
        df.groupBy(F.col(key), F.session_window(ts, gap).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(key, F.col("w.start").alias("session_start"), "n_events")
        .orderBy(key, "session_start")
    )


def run_stream_availablenow(
    spark,
    src_df: DataFrame,
    stage_dir: str,
    ts: str = "ts",
    dur: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Real Structured Streaming pass over a bounded source:
    stage the batch input to parquet, readStream it → withWatermark →
    tumbling count → memory sink, Trigger.AvailableNow (drain all input,
    then stop).

    Staging exists because the driver's raw events file stores nanosecond
    timestamps Spark can't stream-read directly (see sources.readers.
    read_events); the staged copy has the repaired schema.
    """
    src_df.write.mode("overwrite").parquet(stage_dir)
    stream = (
        spark.readStream.schema(src_df.schema)
        .format("parquet")
        .option("path", stage_dir)
        .load()
    )
    agg = (
        stream.withWatermark(ts, watermark)
        .groupBy(F.window(ts, dur).alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("w_start"), "cnt")
    )
    name = f"stream_out_{uuid.uuid4().hex[:8]}"
    q = (
        agg.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.table(name).orderBy("w_start")
