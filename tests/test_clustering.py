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


def test_kmeans_matches_numpy_reference(spark):
    """The Spark Lloyd rounds must reproduce a NumPy reference that follows
    the same spec exactly (lowest-id seeding, squared-distance argmin with
    lower-cid ties, elementwise-mean update, assignment from the final
    round) — on deterministic but unstructured data, not just planted
    clusters."""
    import numpy as np

    n, d, k, iters = 60, 5, 4, 3
    # deterministic pseudo-random vectors (no RNG state, reproducible)
    vecs = [
        [((i * 31 + j * 17) % 23) / 23.0 - 0.5 for j in range(d)]
        for i in range(n)
    ]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )

    from newyork_taxi_etl_spark.operators.clustering import kmeans_assign

    got = {
        r["vec_id"]: r["cid"] for r in kmeans_assign(df, k=k, n_iter=iters).collect()
    }

    X = np.array(vecs)
    cents = X[:k].copy()
    assign = None
    for _ in range(iters):
        d2 = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)  # numpy argmin takes the lowest index on ties
        for c in range(k):
            members = X[assign == c]
            if len(members):
                cents[c] = members.mean(axis=0)
    ref = {i: int(assign[i]) for i in range(n)}
    assert got == ref
