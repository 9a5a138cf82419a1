"""Invariant tests for the late-round-9 additions.

Engine agreement (the oracle mirror) proves both engines compute the same
number; these tests pin the SEMANTIC claims each docstring makes — the
floors, orderings, and self-consistencies that would silently break even
with both engines agreeing.
"""

from __future__ import annotations

import math

from tests.conftest import SF_ORACLE, SF_SMOKE


def _rows(spark, name, sf=SF_ORACLE):
    from newyork_taxi_etl_spark.registry import queries

    return [r.asDict() for r in queries()[name](spark, sf).collect()]


def test_quality_auc_discriminates(spark):
    (r,) = _rows(spark, "quality_auc_rank")
    # the scorer is trained to reproduce the teacher rule; its ranking
    # must be far above chance on its own training labels
    assert r["auc"] >= 0.95, r
    assert r["n_pos"] > 0 and r["n_neg"] > 0, r
    # distinct 6-dp scores can never exceed the doc count
    assert r["n_distinct_scores"] <= r["n_pos"] + r["n_neg"], r


def test_calibration_bins_partition_and_ece_consistent(spark):
    rows = _rows(spark, "quality_calibration_ece")
    n = sum(r["n_docs"] for r in rows)
    assert n > 0
    # every bin's mean prediction sits inside the bin (float-boundary
    # slack: the FLOOR(p*10) binning follows double arithmetic)
    for r in rows:
        lo, hi = r["bin"] / 10 - 1e-9, (r["bin"] + 1) / 10 + 1e-9
        assert lo <= r["mean_p"] <= hi, r
    # the single ECE value equals the n-weighted mean absolute gap
    ece = sum(r["n_docs"] * r["gap"] for r in rows) / n
    assert math.isclose(rows[0]["ece"], ece, abs_tol=2e-6), (rows[0], ece)


def test_two_core_peels_monotone_and_converged(spark):
    rows = _rows(spark, "graph_two_core")
    assert [r["iteration"] for r in rows] == list(range(9))
    for a, b in zip(rows, rows[1:]):
        assert b["n_nodes"] <= a["n_nodes"], (a, b)
        assert b["n_edges"] <= a["n_edges"], (a, b)
    last, prev = rows[-1], rows[-2]
    # flat tail = converged within the 8 unrolled peels
    assert (last["n_nodes"], last["n_edges"]) == (
        prev["n_nodes"],
        prev["n_edges"],
    ), rows
    # 2-core property: min degree 2 means sum(deg) >= 2n, i.e. edges >= nodes
    if last["n_nodes"]:
        assert last["n_edges"] >= last["n_nodes"], last


def test_pmi_ordering_and_floor(spark):
    rows = _rows(spark, "pmi_collocations")
    assert 0 < len(rows) <= 15
    assert all(r["c_xy"] >= 5 for r in rows)
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True), pmis


def test_dp_histogram_release_consistent(spark):
    rows = _rows(spark, "dp_noisy_histogram")
    assert all(r["noisy_count"] >= 0 for r in rows)
    l1 = sum(abs(r["noisy_count"] - r["true_count"]) for r in rows)
    assert rows[0]["total_l1_error"] == l1, (rows[0], l1)
    # integer-rounded Laplace noise must actually be applied as rounded
    for r in rows:
        released = max(r["true_count"] + round(r["noise"]), 0)
        assert r["noisy_count"] == released, r


def test_benford_partition_and_chi_consistent(spark):
    rows = _rows(spark, "benford_first_digit")
    assert [r["digit"] for r in rows] == list(range(1, 10))
    assert abs(sum(r["obs_frac"] for r in rows) - 1.0) < 1e-4
    chi = sum(round(r["chi_term"] * 1e6) for r in rows) / 1e6
    assert math.isclose(rows[0]["chi_square"], chi, abs_tol=2e-6)


def test_target_encoding_loo_removes_leakage(spark):
    (r,) = _rows(spark, "target_encoding_loo")
    # naive encode contains the row's own label: its corr must dominate
    assert r["corr_naive"] >= r["corr_loo"], r
    assert r["leakage_delta"] >= 0, r
    # event_type is uninformative of value on this corpus: LOO ~ chance
    assert abs(r["corr_loo"]) < 0.05, r


def test_hll_overlap_covers_all_pairs(spark):
    from newyork_taxi_etl_spark.registry import queries
    from newyork_taxi_etl_spark.sources.readers import table_path

    rows = _rows(spark, "hll_overlap_sketch_matrix")
    n_src = (
        spark.read.parquet(table_path(SF_ORACLE, "documents"))
        .select("source")
        .distinct()
        .count()
    )
    assert len(rows) == n_src * (n_src - 1) // 2, (len(rows), n_src)
    assert all(r["union_within_5pct"] and r["inter_within_5pct"] for r in rows)


def test_curriculum_stages_ordered_cut(spark):
    rows = _rows(spark, "curriculum_quality_stages", SF_SMOKE)
    assert [r["stage"] for r in rows] == [1, 2, 3, 4]
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1, sizes
    for a, b in zip(rows, rows[1:]):
        # ordered cut: everything in stage i scores >= everything in i+1
        assert a["min_p"] >= b["max_p"], (a, b)
        assert a["mean_p"] >= b["mean_p"], (a, b)


def test_kaplan_meier_monotone_and_conserved(spark):
    rows = _rows(spark, "kaplan_meier_conversion")
    surv = [r["surv_unconverted"] for r in rows]
    assert all(0.0 <= s <= 1.0 for s in surv)
    assert all(a >= b for a, b in zip(surv, surv[1:])), surv
    risks = [r["n_risk"] for r in rows]
    assert all(a > b for a, b in zip(risks, risks[1:])), risks
    # risk-set conservation: every user leaves exactly once
    assert risks[0] == sum(r["n_converted"] + r["n_censored"] for r in rows)
    # KM with zero censoring must equal the empirical survival fraction
    if not any(r["n_censored"] for r in rows):
        n = risks[0]
        left = n
        for r in rows:
            left -= r["n_converted"]
            assert abs(r["surv_unconverted"] - left / n) < 5e-6, r


def test_lsh_scurve_monotone_and_calibrated(spark):
    rows = _rows(spark, "lsh_scurve_calibration")
    assert sum(r["n_pairs"] for r in rows) == 64 * 63 // 2
    # empirical collision rate must rise with cosine (on populated buckets)
    pop = [r for r in rows if r["n_pairs"] >= 50]
    emps = [r["emp_rate"] for r in pop]
    assert emps == sorted(emps), emps
    # theory tracks measurement within 0.1 wherever the estimate has mass
    assert all(r["calib_gap"] <= 0.1 for r in pop), pop


def test_token_fertility_sane(spark):
    rows = _rows(spark, "token_fertility_by_lang")
    for r in rows:
        # a <=4-char greedy segmentation can only split words, never merge
        assert r["subword_tokens"] >= r["ws_tokens"], r
        assert r["fertility"] >= 1.0, r
        assert 0 < r["chars_per_subword"] <= 4.0, r


def test_chao1_bounds(spark):
    (r,) = _rows(spark, "chao1_vocab_richness")
    # Chao1 is a lower-bound ESTIMATE of total richness: never below
    # observed, and coverage consistent with it
    assert r["chao1_estimate"] >= r["d_obs"], r
    assert 0 < r["coverage_frac"] <= 1.0, r
    assert r["f1"] >= 0 and r["f2"] >= 0 and r["n_tokens"] >= r["d_obs"], r


def test_gini_bounds_and_shares(spark):
    (r,) = _rows(spark, "gini_revenue_concentration")
    assert 0.0 <= r["gini"] <= 1.0, r
    # Lorenz shares nest and dominate uniformity
    assert r["top1pct_share"] <= r["top10pct_share"] <= 1.0, r
    assert r["top10pct_share"] >= 0.1 - 1e-6, r
    # zero-revenue customers exist on this corpus and are counted
    assert 0 <= r["n_zero_revenue"] < r["n_customers"], r


def test_pareto_skyline_is_exactly_the_nondominated_set(spark):
    rows = _rows(spark, "pareto_skyline_parts")
    assert rows, "frontier must be non-empty"
    pts = [(r["p_retailprice"], r["p_size"]) for r in rows]
    # no frontier member dominates another (internal consistency)
    for a in pts:
        for b in pts:
            if a != b:
                assert not (
                    a[0] <= b[0] and a[1] >= b[1] and (a[0] < b[0] or a[1] > b[1])
                ), (a, b)
    # every excluded part is dominated by some frontier member
    import duckdb

    con = duckdb.connect()
    allp = con.execute(
        "SELECT p_partkey, p_retailprice, p_size FROM "
        f"read_parquet('{SF_ORACLE}/part.parquet')"
    ).fetchall()
    con.close()
    keys = {r["p_partkey"] for r in rows}
    for pk, price, size in allp:
        if pk in keys:
            continue
        assert any(
            q[0] <= price and q[1] >= size and (q[0] < price or q[1] > size)
            for q in pts
        ), pk


def test_good_turing_mass_accounting(spark):
    rows = {r["r"]: r for r in _rows(spark, "good_turing_smoothing")}
    assert set(rows) == {0, 1, 2, 3, 4, 5}
    # unseen mass equals singleton share and is strictly positive here
    assert rows[0]["gt_mass"] > 0
    assert rows[0]["n_r1"] == rows[1]["n_r"]
    # adjusted counts discount: r* < r for the low-r buckets on a
    # heavy-tailed shingle distribution (N_{r+1} < N_r)
    for r in (1, 2):
        if rows[r]["r_star"] is not None and rows[r]["n_r"] > 0:
            assert rows[r]["r_star"] == round(
                (r + 1) * rows[r]["n_r1"] / rows[r]["n_r"], 6
            )
    # every bucket's mass fraction is a valid probability share
    assert all(0 <= v["gt_mass"] <= 1 for v in rows.values())


def test_mmd_moment_drift_detects_planted_shift(spark):
    import random

    from newyork_taxi_etl_spark.queries.similarity import moment_mmd2_split

    rng = random.Random(7)
    rows = []
    for vid in range(200):
        base = [round(rng.gauss(0, 0.1), 4) for _ in range(64)]
        shifted = vid % 2 == 0
        if shifted:
            base[0] = round(base[0] + 0.5, 4)  # mean shift in dim 1
        rows.append((vid, [float(x) for x in base], 1 if shifted else 0,
                     1 if rng.random() < 0.5 else 0))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, side int, null_side int"
    )
    (drift,) = moment_mmd2_split(emb, "side").collect()
    (null,) = moment_mmd2_split(emb, "null_side").collect()
    # planted 0.5 mean shift in one dim -> mmd2 ~ 2*0.25; null split is
    # sampling noise orders of magnitude below
    assert drift.mmd2 > 0.3, drift
    assert null.mmd2 < 0.05, null
    assert drift.mmd2 > 10 * null.mmd2
    # registered query invariants: both rows present, components sum
    regs = _rows(spark, "mmd_moment_drift")
    assert {r["split"] for r in regs} == {"parity_null", "label0"}
    for r in regs:
        assert abs(r["mmd2"] - (r["mean_term"] + r["var_term"])) < 2e-6
        assert r["mmd2"] >= 0


def test_mmr_prefers_diverse_over_redundant(spark, tmp_path):
    import math

    # planted geometry: probe 0; vecs 10/11 near-identical, both ~cos 0.9
    # to the probe; vec 12 slightly less relevant but orthogonal to 10/11.
    # Pure relevance ranks 10, 11, 12; MMR must skip the near-dup 11 at
    # step 2 and take 12 — the exact redundancy-collapse MMR exists for.
    def unit(v):
        n = math.sqrt(sum(x * x for x in v))
        return [float(x / n) for x in v]

    d = 64
    e = [[0.0] * d for _ in range(5)]
    probe = [0.0] * d
    probe[0] = 1.0
    a = [0.0] * d; a[0] = 0.9; a[1] = 0.436          # cos ~0.9 to probe
    b = [0.0] * d; b[0] = 0.9; b[1] = 0.43; b[2] = 0.073   # ~= a
    c = [0.0] * d; c[0] = 0.85; c[2] = -0.527        # orthogonal-ish to a, b
    fillers = []
    for i in range(6):
        f = [0.0] * d
        f[3 + i] = 1.0                                # cos 0 to everything
        fillers.append(f)
    rows = (
        [(0, unit(probe), 0), (1, unit(fillers[0]), 0), (2, unit(fillers[1]), 0),
         (10, unit(a), 0), (11, unit(b), 0), (12, unit(c), 0)]
        + [(20 + i, unit(f), 0) for i, f in enumerate(fillers[2:])]
    )
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    emb.write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    from newyork_taxi_etl_spark.registry import queries

    out = [
        r.asDict()
        for r in queries()["mmr_diverse_topk"](spark, str(tmp_path)).collect()
        if r.query_id == 0
    ]
    by_step = {r["step"]: r["cand_id"] for r in out}
    assert by_step[1] == 10, by_step          # most relevant first
    assert by_step[2] == 12, by_step          # diversity beats redundancy
    assert 11 not in (by_step[2],), by_step
    # mmr scores non-increasing in step (shrinking set, growing penalty)
    scores = [r["mmr_score"] for r in sorted(out, key=lambda r: r["step"])]
    assert all(scores[i] >= scores[i + 1] - 1e-9 for i in range(len(scores) - 1))
    # registered corpus run: 5 distinct picks per query, step-1 = argmax simq
    reg = _rows(spark, "mmr_diverse_topk")
    for qid in {r["query_id"] for r in reg}:
        picks = [r for r in reg if r["query_id"] == qid]
        assert len({r["cand_id"] for r in picks}) == 5
        s1 = [r for r in picks if r["step"] == 1][0]
        assert s1["simq"] == max(r["simq"] for r in picks)


def test_wasserstein_matches_scipy_and_planted_shift(spark):
    (r,) = _rows(spark, "wasserstein_value_drift")
    assert r["w1"] >= 0 and 0 <= r["w1_norm"] <= 1
    # independent numpy recomputation of W1 on the same split
    import duckdb
    import numpy as np

    con = duckdb.connect()
    df = con.execute(
        "SELECT CAST(ts AS DATE) < DATE '2024-01-16' AS a, value "
        f"FROM read_parquet('{SF_ORACLE}/events.parquet') "
        "WHERE value IS NOT NULL"
    ).fetchdf()
    con.close()
    va = np.round(df[df.a].value.values * 100).astype(np.int64)
    vb = np.round(df[~df.a].value.values * 100).astype(np.int64)
    ticks = np.unique(np.concatenate([va, vb]))
    fa = np.searchsorted(np.sort(va), ticks, side="right") / len(va)
    fb = np.searchsorted(np.sort(vb), ticks, side="right") / len(vb)
    w1 = float(np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(ticks))) / 100.0
    assert abs(r["w1"] - w1) < 1e-5, (r["w1"], w1)
    assert r["n_a"] == len(va) and r["n_b"] == len(vb)


def test_kfold_cv_folds_partition_and_generalize(spark):
    rows = _rows(spark, "logreg_kfold_cv")
    assert [r["fold"] for r in rows] == [0, 1, 2]
    n = rows[0]["n_train"] + rows[0]["n_val"]
    for r in rows:
        assert r["n_train"] + r["n_val"] == n      # folds partition the corpus
        assert r["n_val"] > 0 and r["n_train"] > r["n_val"]
        # the 3-param scorer learns the teacher rule well on every fold
        assert r["val_acc"] >= 0.8, r
        # linear model on disjoint hash folds: no material overfit
        assert abs(r["train_acc"] - r["val_acc"]) < 0.1, r
    accs = [r["val_acc"] for r in rows]
    assert max(accs) - min(accs) < 0.15            # CV spread is bounded
