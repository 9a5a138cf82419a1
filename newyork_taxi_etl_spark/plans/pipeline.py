"""Named pipelines composing the cleaning/feature operators.

Two lineages (SURVEY §2.9.1):
  * ``defacto_pipeline`` — what the notebook actually executed and shipped
    (the golden 2,964,624 → 2,644,148 path);
  * ``documented_pipeline`` — what the report describes (adds year filter,
    timestamp swap, duration cap — the notebook's abandoned branch).

Both are single lazy plans: no checkpoint materialization unless the caller
opts in via ``checkpoint_each_stage`` (the reference wrote every stage to
Parquet, nb:61439 (c31) et al. — at 100 TB that is 8 full rewrites of the
fact table, so the engine defaults to one fused narrow stage and keeps
checkpointing as an explicit lineage-truncation tool).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from newyork_taxi_etl_spark.operators import clean as C
from newyork_taxi_etl_spark.operators import features as X

DEFACTO_STAGES: list[tuple[str, Callable[[DataFrame], DataFrame]]] = [
    ("1_add_duration", C.add_duration),
    ("2_speed_filter", C.speed_filter),
    ("3_distance_cap", C.distance_cap_filter),
    ("4_keep_or_drop", C.keep_or_drop_filter),
    ("5_sign_fix", C.sign_fix),
    ("6_fare_validation", C.fare_validation_filter),
    ("7_passenger_filter", C.passenger_filter),
    ("8_casts", C.apply_casts),
    ("9_average_speed", X.add_average_speed),
    ("10_calendar", X.add_calendar_features),
]

DOCUMENTED_STAGES: list[tuple[str, Callable[[DataFrame], DataFrame]]] = [
    ("1_add_duration", C.add_duration),
    ("2_speed_filter", C.speed_filter),
    ("3_distance_cap", C.distance_cap_filter),
    ("4_year_filter", C.year_filter),
    ("5_timestamp_swap", C.timestamp_swap_fix),
    ("6_duration_recompute", C.add_duration_recompute),
    ("7_duration_cap", C.duration_cap_filter),
    ("8_keep_or_drop", C.keep_or_drop_filter),
    ("9_sign_fix", C.sign_fix),
    ("10_fare_validation", C.fare_validation_filter),
    ("11_passenger_filter", C.passenger_filter),
    ("12_casts", C.apply_casts),
    ("13_average_speed", X.add_average_speed),
    ("14_calendar", X.add_calendar_features),
]


def run_stages(
    df: DataFrame,
    stages: list[tuple[str, Callable[[DataFrame], DataFrame]]],
    checkpoint_each_stage: str | None = None,
) -> DataFrame:
    """Fold the stage list over the input; optionally materialize each stage
    to ``{checkpoint_each_stage}/{stage_name}`` (S2 parity)."""
    out = df
    for name, fn in stages:
        out = fn(out)
        if checkpoint_each_stage:
            path = f"{checkpoint_each_stage}/{name}"
            out.write.mode("overwrite").parquet(path)
            out = out.sparkSession.read.parquet(path)
    return out


def defacto_pipeline(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """The golden-replay lineage (SURVEY §2.9.1)."""
    return run_stages(df, DEFACTO_STAGES, checkpoint_dir)


def documented_pipeline(df: DataFrame, checkpoint_dir: str | None = None) -> DataFrame:
    """The report's described lineage, incl. the notebook's dead branch."""
    return run_stages(df, DOCUMENTED_STAGES, checkpoint_dir)
