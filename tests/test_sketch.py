"""Count-min sketch guarantees (operators/sketch.py): one-sided estimates,
linearity (partitioning invariance), and bounded counter cardinality."""

from __future__ import annotations

from pyspark.sql import functions as F

from newyork_taxi_etl_spark.operators.sketch import (
    approx_heavy_hitters,
    cms_counters,
    cms_estimates,
)


def _toks(spark):
    # skewed token stream: token_i appears ~ (40 - i) times
    rows = [(f"tok{i}",) for i in range(40) for _ in range(40 - i)]
    return spark.createDataFrame(rows, "tok string")


def test_estimate_never_undercounts(spark):
    df = _toks(spark)
    exact = {
        r["tok"]: r["cnt"]
        for r in df.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    counters = cms_counters(df, "tok", depth=4, width=64)
    est = {
        r["tok"]: r["est_cnt"]
        for r in cms_estimates(
            counters, df.select("tok").distinct(), "tok", depth=4, width=64
        ).collect()
    }
    assert set(est) == set(exact)
    assert all(est[t] >= exact[t] for t in exact)


def test_linearity_partitioning_invariance(spark):
    df = _toks(spark)
    a = sorted(
        map(tuple, cms_counters(df.repartition(13), "tok", 4, 64).collect())
    )
    b = sorted(map(tuple, cms_counters(df.coalesce(1), "tok", 4, 64).collect()))
    assert a == b


def test_counter_cardinality_bounded(spark):
    counters = cms_counters(_toks(spark), "tok", depth=4, width=64)
    assert counters.count() <= 4 * 64


def test_heavy_hitters_contains_all_true_hitters(spark):
    df = _toks(spark)
    n = df.count()
    exact_heavy = {
        r["tok"]
        for r in df.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 0.03 * n)
        .collect()
    }
    got = {
        r["tok"]
        for r in approx_heavy_hitters(df, "tok", support=0.03, width=64).collect()
    }
    assert exact_heavy <= got  # one-sided: no false negatives


def _keyed_toks(spark):
    # same skew as _toks but with a (doc_id, pos) row identity for sampling
    rows = [
        (i, j + 1, f"tok{i}") for i in range(40) for j in range(40 - i)
    ]
    return spark.createDataFrame(rows, "doc_id long, pos int, tok string")


def test_sampled_candidates_subset_and_deterministic(spark):
    from newyork_taxi_etl_spark.operators.sketch import sampled_candidates

    df = _keyed_toks(spark)
    all_vals = {r["tok"] for r in df.select("tok").distinct().collect()}
    s1 = {
        r["tok"]
        for r in sampled_candidates(df, "tok", ["doc_id", "pos"], 0.3).collect()
    }
    s2 = {
        r["tok"]
        for r in sampled_candidates(
            df.repartition(7), "tok", ["doc_id", "pos"], 0.3
        ).collect()
    }
    assert s1 == s2  # md5 row-hash: invariant under partitioning
    assert s1 <= all_vals
    assert 0 < len(s1) < len(all_vals)  # a real sample, not all/nothing


def test_sampled_heavy_hitters_keep_true_hitters(spark):
    from newyork_taxi_etl_spark.operators.sketch import (
        sampled_candidates,
    )

    df = _keyed_toks(spark)
    n = df.count()
    exact_heavy = {
        r["tok"]
        for r in df.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") >= 0.03 * n)
        .collect()
    }
    # p=0.3, support*n ~ 24 -> miss prob per hitter <= e^-7
    cand = sampled_candidates(df, "tok", ["doc_id", "pos"], 0.3)
    got = {
        r["tok"]
        for r in approx_heavy_hitters(
            df, "tok", support=0.03, width=64, candidates=cand
        ).collect()
    }
    assert exact_heavy <= got
    sampled_only = {r["tok"] for r in cand.collect()}
    assert got <= sampled_only  # candidates bound the output set


def test_bloom_no_false_negatives_and_bounded_bits(spark):
    from newyork_taxi_etl_spark.operators.sketch import (
        bloom_bits,
        bloom_maybe_contains,
    )

    keys = spark.range(0, 50).select(F.col("id").alias("key"))
    probes = spark.range(0, 500).select(F.col("id").alias("key"))
    bits = bloom_bits(keys, "key", m=1024, k=3)
    assert bits.count() <= 1024
    passed = {
        r["key"]
        for r in bloom_maybe_contains(bits, probes, "key", m=1024, k=3).collect()
    }
    assert set(range(50)) <= passed  # one-sided: every true key passes
    assert len(passed) < 500  # and the filter actually filters


def test_bloom_partitioning_invariance(spark):
    from newyork_taxi_etl_spark.operators.sketch import bloom_bits

    keys = spark.range(0, 200).select(F.col("id").alias("key"))
    a = sorted(r["bit"] for r in bloom_bits(keys, "key").collect())
    b = sorted(
        r["bit"] for r in bloom_bits(keys.repartition(9), "key").collect()
    )
    assert a == b


def _grouped_toks(spark):
    # two groups with DIFFERENT heavy hitters: g=a dominated by tokA,
    # g=b by tokB; shared tail tokens
    rows = (
        [("a", "tokA")] * 50
        + [("b", "tokB")] * 50
        + [("a", f"t{i}") for i in range(20)]
        + [("b", f"t{i}") for i in range(20)]
    )
    return spark.createDataFrame(rows, "g string, tok string")


def test_grouped_counters_are_per_group_sketches(spark):
    """The grouped counter matrix restricted to one group equals the
    plain sketch of that group's stream — the group key only partitions
    the sketch, it never mixes counters."""
    from newyork_taxi_etl_spark.operators.sketch import grouped_cms_counters

    df = _grouped_toks(spark)
    grouped = grouped_cms_counters(df, "tok", ["g"], depth=4, width=64)
    for g in ("a", "b"):
        got = sorted(
            (r["j"], r["bucket"], r["cnt"])
            for r in grouped.filter(F.col("g") == g).collect()
        )
        want = sorted(
            map(
                tuple,
                cms_counters(
                    df.filter(F.col("g") == g).select("tok"), "tok", 4, 64
                ).collect(),
            )
        )
        assert got == want, g


def test_grouped_topk_finds_per_group_hitters(spark):
    from newyork_taxi_etl_spark.operators.sketch import (
        grouped_heavy_hitters_topk,
    )

    df = _grouped_toks(spark)
    top1 = {
        r["g"]: r["tok"]
        for r in grouped_heavy_hitters_topk(
            df, "tok", ["g"], k=1, depth=4, width=64
        ).collect()
    }
    assert top1 == {"a": "tokA", "b": "tokB"}


def test_grouped_counters_partitioning_invariance(spark):
    from newyork_taxi_etl_spark.operators.sketch import grouped_cms_counters

    df = _grouped_toks(spark)
    a = sorted(
        map(
            tuple,
            grouped_cms_counters(df.repartition(13), "tok", ["g"], 4, 64).collect(),
        )
    )
    b = sorted(
        map(
            tuple,
            grouped_cms_counters(df.coalesce(1), "tok", ["g"], 4, 64).collect(),
        )
    )
    assert a == b


def test_grouped_sampled_candidates_keep_per_group_hitters(spark):
    """The grouped candidate sample keeps every per-group heavy hitter
    (row-identity sampling makes the miss bound per (group, item):
    exp(-p*f) with f the IN-GROUP frequency), is a subset of the exact
    per-group distinct pairs, and is deterministic — and the grouped
    top-1 through the sampled candidate stage still finds each group's
    dominant token."""
    from pyspark.sql import functions as F

    from newyork_taxi_etl_spark.operators.sketch import (
        grouped_heavy_hitters_topk,
        grouped_sampled_candidates,
    )

    rows = [
        ("a", "tokA", i) for i in range(60)
    ] + [
        ("b", "tokB", i) for i in range(60)
    ] + [
        ("a", f"t{i}", 100 + i) for i in range(15)
    ] + [
        ("b", f"t{i}", 200 + i) for i in range(15)
    ]
    df = spark.createDataFrame(rows, "g string, tok string, rid int")
    cand = grouped_sampled_candidates(
        df, "tok", ["g"], ["g", "rid"], fraction=0.3, modulus=10_000
    )
    got = {(r["g"], r["tok"]) for r in cand.collect()}
    exact = {(r["g"], r["tok"]) for r in df.select("g", "tok").distinct().collect()}
    assert got <= exact and got  # subset, non-empty
    # heavy hitters (f=60, p=0.3 -> miss prob e^-18) must survive
    assert ("a", "tokA") in got and ("b", "tokB") in got
    # deterministic: same sample on a different partitioning
    again = {
        (r["g"], r["tok"])
        for r in grouped_sampled_candidates(
            df.repartition(13), "tok", ["g"], ["g", "rid"],
            fraction=0.3, modulus=10_000,
        ).collect()
    }
    assert again == got
    top1 = {
        r["g"]: r["tok"]
        for r in grouped_heavy_hitters_topk(
            df, "tok", ["g"], k=1, depth=4, width=64, candidates=cand
        ).collect()
    }
    assert top1 == {"a": "tokA", "b": "tokB"}
