"""Floors on the quality gates (round-4 verdict #2).

The gate queries (`ann_recall_at_k`, `ann_recall_trained`,
`quantile_sketch_gate`, `grouped_quantile_gate`, `minhash_jaccard_gate`)
value-check the MEASURED recall/error against the DuckDB oracle — both
engines agreeing proves the measurement, not its quality. If a parameter
change tanked LSH recall back to the single-band 0.14, every oracle would
stay green. These tests assert the documented floors, so a quality
regression fails pytest even when both engines agree.

Floors sit below the measured sf0.01 values (LSH 0.86, IVF p4 0.98,
IVF-km 0.90, PQ-ADC 0.22, histogram rel_err ≤ 0.0024, minhash max err
0.118) with margin for corpus regeneration jitter, but far above any
plausible broken state.
"""

from __future__ import annotations

import pytest

from tests.conftest import SF_ORACLE


def _rows(spark, name):
    from newyork_taxi_etl_spark.registry import queries

    return {  # keyed rows for the method-shaped gates
        r["method"]: r.asDict()
        for r in queries()[name](spark, SF_ORACLE).collect()
    }


def test_ann_recall_floors(spark):
    rec = _rows(spark, "ann_recall_at_k")
    assert rec["lsh"]["recall"] >= 0.8, rec
    assert rec["ivf_p4"]["recall"] >= 0.9, rec
    # the sweep must stay monotone in n_probe — more probes, never less recall
    assert (
        rec["ivf_p1"]["recall"]
        <= rec["ivf_p2"]["recall"]
        <= rec["ivf_p4"]["recall"]
    ), rec


def test_ann_recall_trained_floors(spark):
    rec = _rows(spark, "ann_recall_trained")
    assert rec["ivf_km"]["recall"] >= 0.85, rec
    # documented compression price of m=4,k=4 (2 bits/subspace) — the floor
    # asserts "not broken", the curve is read from the k=16 point beside it
    assert rec["pq_adc"]["recall"] >= 0.2, rec
    # the curve must rise with codebook size: k=16 strictly beats k=4
    assert rec["pq_adc_k16"]["recall"] >= 0.3, rec
    assert rec["pq_adc_k16"]["recall"] > rec["pq_adc"]["recall"], rec
    # trained codebooks must never LOSE to their own seeds (the gain is
    # data-limited on this isotropic corpus — see the query docstring)
    assert rec["pq_adc_t16"]["recall"] >= rec["pq_adc_k16"]["recall"], rec


def test_ann_recall_ivfpq_floor(spark):
    """Composed IVF-PQ (IVFADC) recall@10 floors: raw-vector ADC measured
    0.40 at sf0.01 / 0.30 at sf0.1 — cell pruning beats pure PQ-t16
    (0.34) on this corpus because the probed cells drop distractors ADC
    would falsely rank high.  Residual encoding measured 0.30 / 0.24 —
    WORSE here (near-isotropic embeddings give the coarse quantizer
    nothing to explain, so cross-cell residual frames decohere the
    shared codebook; it pays on low-intrinsic-dimension data).  Floors
    sit under the measurements with regeneration-jitter margin, far
    above any broken-quantizer state."""
    rec = _rows(spark, "ann_recall_ivfpq")
    assert rec["ivfpq"]["recall"] >= 0.25, rec
    assert rec["ivfpq_res"]["recall"] >= 0.15, rec


def test_ann_recall_sq8_floor(spark):
    """SQ8 (8-bit-per-dim affine codec) vs exact L2 top-10: measured 1.0
    at sf0.01 — 8 bits on 64 dims loses ~0.4% of the dynamic range per
    dim, far below this corpus's neighbor gaps.  Floor at 0.8 catches a
    broken codec (wrong step, clamp, or fold) while tolerating corpus
    regeneration."""
    rec = _rows(spark, "ann_recall_sq8")
    assert rec["sq8_adc"]["recall"] >= 0.8, rec


def test_quantile_sketch_error_bounds(spark):
    from newyork_taxi_etl_spark.registry import queries

    row = queries()["quantile_sketch_gate"](spark, SF_ORACLE).collect()[0]
    assert row["p50_rel_err"] <= 0.01, row
    assert row["p99_rel_err"] <= 0.01, row


def test_grouped_quantile_within_bound(spark):
    from newyork_taxi_etl_spark.registry import queries

    rows = queries()["grouped_quantile_gate"](spark, SF_ORACLE).collect()
    assert rows, "gate returned no groups"
    bad = [r["l_returnflag"] for r in rows if not r["approx_within_1pct"]]
    assert not bad, f"groups outside 1% quantile bound: {bad}"


def test_minhash_error_bounds(spark):
    from newyork_taxi_etl_spark.registry import queries

    row = queries()["minhash_jaccard_gate"](spark, SF_ORACLE).collect()[0]
    # k=16 signatures: E[err] ~ sqrt(j(1-j)/16) <= 0.125; the 800-pair grid
    # measured mean 0.0016 / max 0.118 — a signature bug lands ~0.5
    assert row["mean_abs_err"] <= 0.02, row
    assert row["max_abs_err"] <= 0.25, row


def test_join_strategy_chooser_hits_every_branch(spark):
    """At sf0.01 the three priced joins land in three different branches —
    the chooser is a data-driven decision, not a constant."""
    from newyork_taxi_etl_spark.registry import queries

    rows = {
        r["join_name"]: r.asDict()
        for r in queries()["join_strategy_choice"](spark, SF_ORACLE).collect()
    }
    assert rows["lineitem_x_supplier_on_suppkey"]["strategy"] == "broadcast"
    assert rows["lineitem_x_orders_on_orderkey"]["strategy"] == "shuffle"
    skewed = rows["events_self_on_event_type"]
    assert skewed["strategy"] == "salted" and skewed["n_salt"] > 1, skewed


def test_join_strategy_rule_boundaries(spark):
    """Unit-level check of the decision columns on synthetic stat rows:
    broadcast wins below the byte budget even when skewed; the salt count
    tracks the hot key's multiple of the average partition."""
    from pyspark.sql import functions as F

    from newyork_taxi_etl_spark.operators.joins import join_strategy_columns

    rows = [
        # (name, small_bytes, big_rows, max_key_rows)
        ("fits_budget_even_skewed", 1000, 1000, 900),
        ("big_and_skewed", 100_000, 32_000, 8_000),   # ratio 8 -> salt 8
        ("big_not_skewed", 100_000, 32_000, 1_000),   # ratio 1 -> shuffle
        ("salt_capped", 100_000, 32, 32),             # ratio 32 -> cap 32
    ]
    df = spark.createDataFrame(
        rows, "join_name string, small_bytes long, big_rows long, max_key_rows long"
    ).select("*", *join_strategy_columns(parts=32, bcast_bytes=64 * 1024))
    got = {r["join_name"]: (r["strategy"], r["n_salt"]) for r in df.collect()}
    assert got["fits_budget_even_skewed"] == ("broadcast", 1)
    assert got["big_and_skewed"] == ("salted", 8)
    assert got["big_not_skewed"] == ("shuffle", 1)
    assert got["salt_capped"] == ("salted", 32)


def test_join_strategy_empty_probe_defined(spark):
    """An empty probe side (big_rows=0) must yield a DEFINED decision —
    skew_ratio 0.0, never a NULL falling through to an accidental branch
    (non-ANSI Spark: x/0 -> NULL; ANSI: error; DuckDB: inf) — broadcast if
    the build side fits, else shuffle."""
    from newyork_taxi_etl_spark.operators.joins import join_strategy_columns

    rows = [
        ("empty_probe_small_build", 1000, 0, 0),
        ("empty_probe_big_build", 100_000, 0, 0),
    ]
    df = spark.createDataFrame(
        rows, "join_name string, small_bytes long, big_rows long, max_key_rows long"
    ).select("*", *join_strategy_columns(parts=32, bcast_bytes=64 * 1024))
    got = {
        r["join_name"]: (r["skew_ratio"], r["strategy"], r["n_salt"])
        for r in df.collect()
    }
    assert got["empty_probe_small_build"] == (0.0, "broadcast", 1)
    assert got["empty_probe_big_build"] == (0.0, "shuffle", 1)


def test_join_strategy_rules_monotone(spark):
    """Rule monotonicity over a grid: shrinking the build side never flips
    broadcast->non-broadcast, and raising the hottest key count never
    flips salted->shuffle (holding everything else fixed)."""
    from pyspark.sql import functions as F

    from newyork_taxi_etl_spark.operators.joins import join_strategy_columns

    rows = [
        (f"b{b}_m{m}", b, 32_000, m)
        for b in (1_000, 64 * 1024, 64 * 1024 + 1, 10_000_000)
        for m in (10, 1_000, 4_000, 8_000, 32_000)
    ]
    df = spark.createDataFrame(
        rows,
        "join_name string, small_bytes long, big_rows long, max_key_rows long",
    ).select("*", *join_strategy_columns(parts=32, bcast_bytes=64 * 1024))
    got = {
        (r["small_bytes"], r["max_key_rows"]): (r["strategy"], r["n_salt"])
        for r in df.collect()
    }
    bs = sorted({b for b, _ in got})
    ms = sorted({m for _, m in got})
    for m in ms:
        # broadcast region is a prefix in small_bytes
        flags = [got[(b, m)][0] == "broadcast" for b in bs]
        assert flags == sorted(flags, reverse=True), (m, flags)
    for b in bs:
        # above the broadcast budget, salted region is a suffix in max_key
        if b > 64 * 1024:
            flags = [got[(b, m)][0] == "salted" for m in ms]
            assert flags == sorted(flags), (b, flags)
            salts = [got[(b, m)][1] for m in ms]
            assert salts == sorted(salts), (b, salts)  # salt grows with skew


def test_pq_training_knee_on_planted_low_intrinsic_dim(spark):
    """The per-subspace Lloyd training operator's VALUE, demonstrated
    (round-5 verdict #4): on the driver's near-isotropic corpus trained PQ
    only edges out the seed codebook (0.34 vs 0.32 — 16 codewords per
    16-dim subspace cannot quantize white noise), so this test PLANTS a
    corpus with real low-intrinsic-dimension structure: a product code —
    each of the 4 subspaces independently picks one of 16 well-separated
    unit directions (+ sigma=0.05 noise), so the 64-dim corpus has 4
    effective degrees of freedom and a PERFECT size-16-per-subspace PQ
    codebook exists. The first 16 vectors (the seed codebook) are
    restricted to only 4 of the 16 values per subspace — a stale/
    unrepresentative codebook with poor coverage. One Lloyd round
    (the existing `_pq_parts(train=True)` chain, probed through the
    production `_pq_adc_topk`) reassigns and recenters the codewords into
    the occupied regions and must lift recall@10 by >= 0.2 absolute
    (measured: 0.30 -> 0.60, fully deterministic: seeded generator,
    decimal-exact means, id-tie-broken rankings). A full-coverage seed
    sanity leg pins the other side: when the seeds already cover every
    value, untrained is already good (>= 0.7) — the knee is coverage, not
    magic."""
    import numpy as np
    from pyspark.sql import functions as F

    from newyork_taxi_etl_spark.operators import similarity as S
    from newyork_taxi_etl_spark.queries.similarity import _pq_adc_topk

    rng = np.random.default_rng(5)
    V, D, M, N, sig = 16, 16, 4, 400, 0.05
    values = rng.normal(0, 1, (M, V, D))
    values /= np.linalg.norm(values, axis=2, keepdims=True)
    choice = rng.integers(0, V, (N, M))
    body = np.concatenate(
        [values[s][choice[:, s]] + rng.normal(0, sig, (N, D)) for s in range(M)],
        axis=1,
    )
    qids = [30, 77, 123, 250, 399]

    def recall_pair(seeds):
        vecs = np.concatenate([seeds, body])
        emb = spark.createDataFrame(
            [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
            "vec_id int, embedding array<double>",
        )
        qs = emb.filter(F.col("vec_id").isin(qids))
        bf = S.brute_force_topk(emb, qs, k=10).select("query_id", "cand_id")
        tot = bf.count()
        out = []
        for train in (False, True):
            got = _pq_adc_topk(
                emb, k=10, k_codes=16, train=train, query_ids=qids
            ).select("query_id", "cand_id")
            out.append(got.join(bf, ["query_id", "cand_id"], "semi").count() / tot)
        return out

    seed_choice = rng.integers(0, 4, (16, M))
    low_cov = np.concatenate(
        [
            values[s][seed_choice[:, s]] + rng.normal(0, sig, (16, D))
            for s in range(M)
        ],
        axis=1,
    )
    untrained, trained = recall_pair(low_cov)
    assert trained - untrained >= 0.2, (untrained, trained)
    assert untrained <= 0.45 and trained >= 0.5, (untrained, trained)

    full_cov = np.concatenate(
        [values[s] + rng.normal(0, sig, (V, D)) for s in range(M)], axis=1
    )
    sane_untrained, sane_trained = recall_pair(full_cov)
    assert sane_untrained >= 0.7, sane_untrained
    assert sane_trained >= sane_untrained, (sane_untrained, sane_trained)


def test_truncation_recall_curve_monotone(spark):
    """The dimension/accuracy curve must anchor at recall 1.0 for the
    full dimension (identity by construction) and never DECREASE as more
    dims are kept — a broken slice or ranking would violate one of the
    two immediately."""
    from newyork_taxi_etl_spark.registry import queries

    rows = {
        r["dim"]: r["recall"]
        for r in queries()["ann_truncation_recall"](spark, SF_ORACLE).collect()
    }
    assert rows[64] == 1.0, rows
    assert rows[16] <= rows[32] <= rows[64], rows


def test_sample_k_per_group_exact_quota_and_invariance(spark):
    """fixed_size_group_sample returns exactly min(k, |group|) rows per
    group, the same rows under any partitioning, and plans the rank
    filter as WindowGroupLimit (map-side pre-prune)."""
    from pyspark.sql import functions as F

    from newyork_taxi_etl_spark.operators.sampling import (
        fixed_size_group_sample,
    )
    from newyork_taxi_etl_spark.sources.readers import table_path

    docs = spark.read.parquet(table_path(SF_ORACLE, "documents"))
    out = fixed_size_group_sample(docs, ["lang"], "doc_id", 3)
    per = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert per == {g: min(3, n) for g, n in sizes.items()}
    again = fixed_size_group_sample(docs.repartition(13), ["lang"], "doc_id", 3)
    assert sorted(map(tuple, out.select("lang", "doc_id").collect())) == sorted(
        map(tuple, again.select("lang", "doc_id").collect())
    )
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "WindowGroupLimit" in plan


def test_cascade_rerank_lift_floor(spark):
    """The two-stage cascade must buy back real recall: at sf0.01 the
    full-dim rerank of the 50-candidate truncated shortlist reaches 0.48
    recall@10 vs 0.18 for the direct 16-dim search — floor the lift at
    +0.2 so a broken stage-2 (or a shortlist that stopped covering the
    true top-10) fails even when both engines agree."""
    from newyork_taxi_etl_spark.registry import queries

    row = queries()["ann_cascade_rerank"](spark, SF_ORACLE).collect()[0]
    assert row["total"] > 0
    assert row["recall_cascade"] >= row["recall_direct"] + 0.2, row


def test_knn_indexed_eval_delta_bounded_by_agreement(spark):
    """The index-probe eval twin's accuracy delta is CAUSED by neighbor
    disagreement: when the index returns the exact 1-NN, the predicted
    labels are identical, so |n_correct_exact - n_correct_index| can
    never exceed (n_queries - n_nn_agree).  Assert that invariant per
    class, floor the overall NN agreement (recall@1 of the 2-probe/8-list
    IVF index, measured ~0.50 at sf0.01 — the per-query twin of
    ann_recall_trained's gate), and pin the sample contract: exactly
    min(512, corpus) queries, each counted once."""
    from newyork_taxi_etl_spark.registry import queries
    from newyork_taxi_etl_spark.sources.readers import table_path

    rows = (
        queries()["knn_label_accuracy_indexed"](spark, SF_ORACLE).collect()
    )
    n_corpus = spark.read.parquet(
        table_path(SF_ORACLE, "embeddings")
    ).count()
    assert sum(r["n_queries"] for r in rows) == min(512, n_corpus)
    for r in rows:
        assert abs(r["n_correct_exact"] - r["n_correct_index"]) <= (
            r["n_queries"] - r["n_nn_agree"]
        ), r
    agree = sum(r["n_nn_agree"] for r in rows) / sum(
        r["n_queries"] for r in rows
    )
    assert agree >= 0.35, agree  # broken probe/quantizer -> near 0


def test_ann_ranking_quality_invariants_and_floors(spark):
    """The graded ranking metrics must respect their algebra — with
    binary relevance, every hit is worth between disc(10) and disc(1),
    so NDCG is pinched between recall-derived bounds; a query with any
    hit has first relevant rank <= 10, so MRR >= 0.1 x hit-rate — and
    the measured quality of the 2-probe/8-list IVF index (recall@10
    0.46, MRR 1.0, NDCG 0.60 at sf0.01) is floored so a broken
    quantizer/probe fails even when both engines agree."""
    from newyork_taxi_etl_spark.queries.similarity import (
        _DISC_I,
        _IDCG_I,
        _MRR_I,
        _RANK_QUERY_N,
    )
    from newyork_taxi_etl_spark.registry import queries
    from newyork_taxi_etl_spark.sources.readers import table_path

    assert _IDCG_I == sum(_DISC_I)
    assert list(_DISC_I) == sorted(_DISC_I, reverse=True)
    assert _MRR_I[0] == 10**12

    row = queries()["ann_ranking_quality"](spark, SF_ORACLE).collect()[0]
    n_corpus = spark.read.parquet(
        table_path(SF_ORACLE, "embeddings")
    ).count()
    assert row["n_queries"] == min(_RANK_QUERY_N, n_corpus)
    for m in ("recall_at10", "mrr_at10", "ndcg_at10"):
        assert 0.0 <= row[m] <= 1.0, (m, row)
    # hit-count consistency: recall is exactly hits / (10 n)
    assert abs(
        row["recall_at10"]
        - row["n_hits_total"] / (10.0 * row["n_queries"])
    ) < 1e-6, row
    # NDCG pinched by per-hit discount bounds (worst/best placement)
    lo = row["recall_at10"] * 10 * _DISC_I[-1] / _IDCG_I
    hi = row["recall_at10"] * 10 * _DISC_I[0] / _IDCG_I
    assert lo - 1e-6 <= row["ndcg_at10"] <= hi + 1e-6, (lo, hi, row)
    # any-hit queries have first relevant rank <= 10
    hit_rate = (row["n_queries"] - row["n_zero_hit"]) / row["n_queries"]
    assert row["mrr_at10"] >= 0.1 * hit_rate - 1e-6, row
    assert row["mrr_at10"] <= hit_rate + 1e-6, row
    # measured-quality floors for THIS index config on THIS corpus
    assert row["recall_at10"] >= 0.30, row
    assert row["mrr_at10"] >= 0.70, row
    assert row["ndcg_at10"] >= 0.45, row


def test_ann_ranking_quality_partitioning_invariant(spark):
    """Every ranking-metric numerator is an exact integer sum and every
    rank is deterministically tie-broken (4-dp cosine, then cand_id), so
    the emitted row must be identical under a different shuffle
    parallelism — a layout-dependent result would mean a nondeterministic
    quantizer assignment or an unstable top-K somewhere in the probe."""
    from newyork_taxi_etl_spark.registry import queries

    base = queries()["ann_ranking_quality"](spark, SF_ORACLE).collect()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        alt = queries()["ann_ranking_quality"](spark, SF_ORACLE).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert sorted(map(tuple, base)) == sorted(map(tuple, alt))
