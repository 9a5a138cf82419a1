"""Behavioral analytics over the ``events`` stream table: funnel
conversion and cohort retention — the two product-analytics staples every
event-warehouse query engine ships (reference has no event surface at all;
training-data-extension of the north star, same family as
``user_event_profile`` / the window queries).

Scale shape: both queries reduce the event stream with ONE hash aggregate
on ``user_id`` (map-side-combinable partial mins/distincts), then operate
on per-user rows — O(users), not O(events) — and broadcast the tiny
dimension aggregates (stage totals, cohort sizes). No window over the raw
event stream, no self-join of events.
"""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from newyork_taxi_etl_spark.registry import register
from newyork_taxi_etl_spark.sources.readers import read_events

_STAGES = ("signup", "view", "click", "purchase")

_EPOCH = datetime.date(2024, 1, 1)  # corpus start; fixed so week numbering
# is engine-portable (ISO-week functions differ between Spark and DuckDB)


@register(
    "funnel_conversion",
    f"""
    WITH per_user AS (
      SELECT user_id,
             {', '.join(f"min(CASE WHEN event_type = '{s}' THEN ts END) AS t{i}" for i, s in enumerate(_STAGES, start=1))}
      FROM events GROUP BY user_id
    ),
    f AS (
      SELECT COUNT(*) AS n_total,
             SUM(CASE WHEN t1 IS NOT NULL THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN t1 IS NOT NULL AND t2 > t1 THEN 1 ELSE 0 END) AS n2,
             SUM(CASE WHEN t1 IS NOT NULL AND t2 > t1 AND t3 > t2
                 THEN 1 ELSE 0 END) AS n3,
             SUM(CASE WHEN t1 IS NOT NULL AND t2 > t1 AND t3 > t2 AND t4 > t3
                 THEN 1 ELSE 0 END) AS n4
      FROM per_user
    )
    SELECT 1 AS stage_idx, 'signup' AS stage, CAST(n1 AS BIGINT) AS users,
           ROUND(CAST(n1 AS DOUBLE) / n_total, 6) AS conversion FROM f
    UNION ALL
    SELECT 2, 'view', CAST(n2 AS BIGINT),
           ROUND(CAST(n2 AS DOUBLE) / n1, 6) FROM f
    UNION ALL
    SELECT 3, 'click', CAST(n3 AS BIGINT),
           ROUND(CAST(n3 AS DOUBLE) / n2, 6) FROM f
    UNION ALL
    SELECT 4, 'purchase', CAST(n4 AS BIGINT),
           ROUND(CAST(n4 AS DOUBLE) / n3, 6) FROM f
    ORDER BY stage_idx
    """,
    doc="4-stage funnel (signup -> view -> click -> purchase), monotone "
    "first-occurrence semantics: a user reaches stage k iff the first "
    "times of stages 1..k strictly increase — computed from ONE hash "
    "aggregate over events (4 conditional mins per user), so the reduction "
    "is O(users) rows after a single map-side-combinable shuffle; stage "
    "counts + step conversion rates unpivoted from the 1-row total. The "
    "sequential-dependency trap (stage k's window depends on stage k-1) is "
    "deliberately avoided: strict monotonicity over first-occurrences "
    "needs no per-stage re-scan and is the standard warehouse funnel",
)
def funnel_conversion(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    per_user = ev.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == s, F.col("ts"))).alias(f"t{i}")
            for i, s in enumerate(_STAGES, start=1)
        ]
    )
    reach = [F.col("t1").isNotNull()]
    for i in range(2, len(_STAGES) + 1):
        reach.append(reach[-1] & (F.col(f"t{i}") > F.col(f"t{i-1}")))
    f = per_user.agg(
        F.count(F.lit(1)).alias("n_total"),
        *[
            F.sum(F.when(cond, 1).otherwise(0)).alias(f"n{i}")
            for i, cond in enumerate(reach, start=1)
        ],
    )
    prev = ["n_total", "n1", "n2", "n3"]
    rows = F.array(
        *[
            F.struct(
                F.lit(i).alias("stage_idx"),
                F.lit(s).alias("stage"),
                F.col(f"n{i}").cast("bigint").alias("users"),
                F.round(
                    F.col(f"n{i}").cast("double") / F.col(prev[i - 1]), 6
                ).alias("conversion"),
            )
            for i, s in enumerate(_STAGES, start=1)
        ]
    )
    return (
        f.select(F.explode(rows).alias("r")).select("r.*").orderBy("stage_idx")
    )


@register(
    "cohort_retention",
    f"""
    WITH wk AS (
      SELECT user_id,
             CAST(date_diff('day', DATE '{_EPOCH}', CAST(ts AS DATE)) // 7
                  AS INT) AS week
      FROM events
    ),
    cohort AS (
      SELECT user_id, MIN(week) AS cohort_week FROM wk GROUP BY user_id
    ),
    sizes AS (
      SELECT cohort_week, COUNT(*) AS n_cohort FROM cohort GROUP BY cohort_week
    ),
    activity AS (
      SELECT DISTINCT user_id, week FROM wk
    )
    SELECT c.cohort_week,
           a.week - c.cohort_week AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           s.n_cohort AS n_cohort,
           ROUND(CAST(COUNT(*) AS DOUBLE) / s.n_cohort, 6) AS retention
    FROM activity a
    JOIN cohort c USING (user_id)
    JOIN sizes s ON c.cohort_week = s.cohort_week
    GROUP BY c.cohort_week, week_offset, s.n_cohort
    ORDER BY c.cohort_week, week_offset
    """,
    doc="cohort retention matrix: users cohorted by first-activity week "
    "(fixed corpus epoch, not ISO weeks — engine-portable numbering), "
    "retention = share of the cohort active in each subsequent week. "
    "Dataflow: week extraction is narrow; cohorts and per-week activity "
    "are each ONE user-keyed aggregate; the final matrix joins per-user "
    "rows (O(users*weeks), not O(events)) with the cohort-size dimension "
    "broadcast. The standard warehouse retention query, shuffle-bounded "
    "by the user dimension",
)
def cohort_retention(spark, sf_dir):
    ev = read_events(spark, sf_dir)
    wk = ev.select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit(_EPOCH)) / F.lit(7)
        )
        .cast("int")
        .alias("week"),
    )
    cohort = wk.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    sizes = cohort.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("n_cohort")
    )
    activity = wk.distinct()
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
        .join(F.broadcast(sizes), "cohort_week")
        .select(
            "cohort_week",
            "week_offset",
            F.col("n_active").cast("bigint").alias("n_active"),
            "n_cohort",
            F.round(
                F.col("n_active").cast("double") / F.col("n_cohort"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "week_offset")
    )
