"""Unit tests for deterministic hash sampling/splitting operators.

These assert the properties that motivate hash bucketing over
``DataFrame.sample`` (see operators/sampling.py docstring): reproducibility,
stability under repartitioning, and split disjointness/exhaustiveness.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from newyork_taxi_etl_spark.operators import sampling as ops
from tests.conftest import SF_ORACLE
from newyork_taxi_etl_spark.sources.readers import table_path


def _docs(spark):
    return spark.read.parquet(table_path(SF_ORACLE, "documents"))


def test_split_is_disjoint_and_exhaustive(spark):
    docs = _docs(spark)
    tagged = ops.hash_split(docs, "doc_id")
    counts = dict(
        tagged.groupBy("split").count().collect()[i][0:2]
        for i in range(tagged.select("split").distinct().count())
    )
    assert sum(counts.values()) == docs.count()
    assert set(counts) <= {"train", "valid", "test"}
    # ~80/10/10 within loose tolerance on 500 docs
    total = sum(counts.values())
    assert 0.7 < counts["train"] / total < 0.9


def test_sample_stable_under_repartition(spark):
    docs = _docs(spark)
    ids_a = {r[0] for r in ops.hash_sample(docs, "doc_id", 10).select("doc_id").collect()}
    ids_b = {
        r[0]
        for r in ops.hash_sample(docs.repartition(7), "doc_id", 10)
        .select("doc_id")
        .collect()
    }
    assert ids_a == ids_b and ids_a  # same draw regardless of partitioning


def test_split_assignment_stable_as_corpus_grows(spark):
    docs = _docs(spark)
    full = {r[0]: r[1] for r in ops.hash_split(docs, "doc_id").select("doc_id", "split").collect()}
    subset = {
        r[0]: r[1]
        for r in ops.hash_split(docs.filter(F.col("doc_id") < 100), "doc_id")
        .select("doc_id", "split")
        .collect()
    }
    assert all(full[k] == v for k, v in subset.items())


def test_stratified_rates_respected(spark):
    docs = _docs(spark)
    sampled = ops.stratified_hash_sample(docs, "doc_id", "lang", {"en": 20}, 60)
    en_keep = sampled.filter(F.col("lang") == "en")
    en_expected = docs.filter(
        (F.col("lang") == "en") & (ops.hash_bucket("doc_id") < 20)
    )
    assert en_keep.count() == en_expected.count()
    non_en = sampled.filter(F.col("lang") != "en").count()
    non_en_all = docs.filter(F.col("lang") != "en").count()
    assert 0.4 < non_en / non_en_all < 0.8


def test_weighted_sample_matches_python_reference(spark):
    """weighted_hash_sample must reproduce the A-ES formula exactly: the
    Spark result is compared against a bit-identical Python evaluation
    (same multiplicative-hash uniform, same pow, same rounding), and the
    weighting must actually bias selection (heavy items dominate top-k)."""
    from newyork_taxi_etl_spark.operators.sampling import weighted_hash_sample

    n, k = 400, 40
    rows = [(i, 1 if i % 2 == 0 else 50) for i in range(n)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = [
        (r["doc_id"], r["priority"])
        for r in weighted_hash_sample(df, "doc_id", "w", k=k).collect()
    ]

    def prio(i, w):
        u = ((i * 2654435761) % (1 << 32) % (1 << 20) + 0.5) / float(1 << 20)
        return round(u ** (1.0 / w), 6)

    ref = sorted(
        ((i, prio(i, w)) for i, w in rows), key=lambda t: (-t[1], t[0])
    )[:k]
    assert got == ref
    # weighting bias: heavy (odd) ids must dominate the sample
    heavy = sum(1 for i, _ in got if i % 2 == 1)
    assert heavy > k * 0.8
