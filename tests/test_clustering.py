"""Unit tests for Lloyd k-means (operators/clustering.py) on planted
clusters: assignment must recover well-separated groups regardless of
partitioning, deterministically."""

from __future__ import annotations

from pyspark.sql import functions as F

from newyork_taxi_etl_spark.operators.clustering import (
    cluster_profile,
    kmeans_assign,
)


def _planted(spark):
    # 3 tight clusters around (0,0), (10,0), (0,10); ids interleaved so the
    # seed vectors (lowest 3 ids) land one per true cluster
    pts = []
    centers = [(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)]
    for i in range(30):
        cx, cy = centers[i % 3]
        off = (i // 3) * 0.01
        pts.append((i, [cx + off, cy - off]))
    return spark.createDataFrame(pts, "vec_id long, embedding array<double>")


def test_planted_clusters_recovered(spark):
    df = _planted(spark)
    assigned = kmeans_assign(df, k=3, n_iter=3)
    rows = assigned.collect()
    by_true = {}
    for r in rows:
        by_true.setdefault(r["vec_id"] % 3, set()).add(r["cid"])
    # every true cluster maps to exactly one predicted cid, all distinct
    assert all(len(s) == 1 for s in by_true.values())
    assert len({next(iter(s)) for s in by_true.values()}) == 3


def test_cluster_profile_sizes(spark):
    df = _planted(spark)
    prof = cluster_profile(kmeans_assign(df, k=3, n_iter=3)).collect()
    assert sorted(r["n_members"] for r in prof) == [10, 10, 10]


def test_assignment_deterministic_across_partitioning(spark):
    df = _planted(spark)
    a1 = {
        (r["vec_id"], r["cid"])
        for r in kmeans_assign(df.repartition(7), k=3, n_iter=2).collect()
    }
    a2 = {
        (r["vec_id"], r["cid"])
        for r in kmeans_assign(df.coalesce(1), k=3, n_iter=2).collect()
    }
    assert a1 == a2


def test_assignment_plan_has_no_corpus_shuffle(spark):
    """The argmin assignment must be a broadcast-join expression: no hash
    exchange of the corpus, no window, no Python."""
    df = _planted(spark)
    assigned = kmeans_assign(df, k=3, n_iter=1)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning(vec_id" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
