"""Dedup functionality on planted duplicates — the oracle queries prove
engine-equivalence; these prove the operators actually CATCH near-dups
(the driver corpus has none, SURVEY-level non-vacuity)."""

from __future__ import annotations

from pyspark.sql import functions as F

from newyork_taxi_etl_spark.operators import dedup as D

BASE = (
    "the fast key order sort table scan merge part window small hash "
    "join query row data slow filter customer line batch value group"
)


def _docs(spark):
    rows = [
        (1, BASE, "en"),
        (2, BASE, "en"),                                   # exact dup of 1
        (3, BASE.replace("window", "pane"), "en"),         # near-dup of 1
        (4, "completely different words entirely here now", "en"),
        (5, BASE + " trailing extra tokens appended here", "en"),  # near-dup
        (6, "orthogonal vocabulary zone alpha beta gamma delta", "de"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text", "lang"])


def test_exact_dedup_groups_planted_dups(spark):
    out = {r.keeper: r.copies for r in D.dedup_exact(_docs(spark)).collect()}
    assert out[1] == 2          # docs 1+2 collapse
    assert out.get(3) == 1


def test_minhash_lsh_finds_planted_near_dups(spark):
    sigs = D.with_minhash(_docs(spark), k=4)
    pairs = {(r.id_a, r.id_b) for r in D.lsh_candidate_pairs(sigs).collect()}
    assert (1, 2) in pairs                      # exact dup always collides
    # near-dups share most shingles -> high band-collision probability;
    # with planted 90%+ overlap at least one of (1,3)/(1,5) must surface
    assert pairs & {(1, 3), (1, 5), (2, 3), (2, 5)}
    assert (4, 6) not in pairs                  # unrelated docs don't pair


def test_jaccard_verify_scores_planted_pairs(spark):
    pairs = D.shingle_jaccard_pairs(_docs(spark), "lang", threshold=0.3)
    got = {(r.id_a, r.id_b): r.jaccard for r in pairs.collect()}
    assert got[(1, 2)] == 1.0
    assert 0.5 < got[(1, 5)] < 1.0
    assert (1, 4) not in got


def test_simhash_hamming_close_for_near_dups(spark):
    sigs = D.with_simhash(_docs(spark), bits=16)
    pairs = D.hamming_pairs(sigs, max_dist=3)
    got = {(r.id_a, r.id_b): r.hamming for r in pairs.collect()}
    assert got[(1, 2)] == 0                     # identical text, identical sig
    sig = {r.doc_id: r.simhash for r in sigs.select("doc_id", "simhash").collect()}
    ham_14 = sum(a != b for a, b in zip(sig[1], sig[4]))
    ham_13 = sum(a != b for a, b in zip(sig[1], sig[3]))
    assert ham_13 <= ham_14                     # near-dup at least as close


def test_band_cap_drops_hot_bucket_keeps_rest(spark):
    # 30 identical boilerplate docs -> every band bucket they share holds 30
    # members (435 pairs of zero dedup signal); two genuine near-dups ride
    # alongside. cap=8 must drop ONLY the boilerplate bucket's pairs.
    rows = [(i, "legal boilerplate header identical on every page", "en")
            for i in range(100, 130)]
    rows += [(1, BASE, "en"), (2, BASE, "en")]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    sigs = D.with_minhash(docs, k=4)

    uncapped = {(r.id_a, r.id_b)
                for r in D.lsh_candidate_pairs(sigs).collect()}
    capped = {(r.id_a, r.id_b)
              for r in D.lsh_candidate_pairs(sigs, max_band_size=8).collect()}

    boiler = {(a, b) for a in range(100, 130) for b in range(100, 130) if a < b}
    assert boiler <= uncapped           # uncapped pays the quadratic bucket
    assert (1, 2) in uncapped
    assert capped & boiler == set()     # cap removes the hot bucket entirely
    assert (1, 2) in capped             # small buckets are untouched
    # everything the cap removed was boilerplate; nothing else changed
    assert uncapped - capped <= boiler | {
        p for p in uncapped if (p[0] >= 100) != (p[1] >= 100)
    }


def test_band_cap_noop_when_no_hot_buckets(spark):
    sigs = D.with_minhash(_docs(spark), k=4)
    base = {(r.id_a, r.id_b) for r in D.lsh_candidate_pairs(sigs).collect()}
    capped = {(r.id_a, r.id_b)
              for r in D.lsh_candidate_pairs(sigs, max_band_size=64).collect()}
    assert base == capped


def test_passage_dedup_finds_planted_shared_section(spark):
    """Two LONG documents that are globally distinct but share ONE
    32-token boilerplate section at DIFFERENT offsets (48 vs 56 tokens
    in — fixed-grid chunking misaligns here; content-defined boundaries
    do not): doc-level shingle Jaccard stays far below any dedup
    threshold, yet passage-level CDC+LSH must surface the pair with a
    jaccard-1.0 segment.  Also asserts the negative: unrelated docs
    produce no pairs."""
    from newyork_taxi_etl_spark.operators.dedup import (
        passage_dup_pairs,
        shingle_jaccard_pairs,
    )

    # tmpl11/12/14/20/26 are CDC boundary tokens (md5[:4] % 8 == 0), so
    # the section's interior contains the full segments tmpl14..19 and
    # tmpl20..25 — identical in both docs wherever the section sits
    shared = " ".join(f"tmpl{i}" for i in range(32))
    doca = (
        " ".join(f"alpha{i}" for i in range(48))
        + " " + shared + " "
        + " ".join(f"beta{i}" for i in range(40))
    )
    docb = (
        " ".join(f"gamma{i}" for i in range(56))
        + " " + shared + " "
        + " ".join(f"delta{i}" for i in range(36))
    )
    docc = " ".join(f"omega{i}" for i in range(120))
    docs = spark.createDataFrame(
        [(1, doca, "en"), (2, docb, "en"), (3, docc, "en")],
        "doc_id long, text string, lang string",
    )

    pairs = {
        (r["id_a"], r["id_b"]): r
        for r in passage_dup_pairs(docs).collect()
    }
    assert (1, 2) in pairs, pairs  # the misaligned planted section is found
    assert pairs[(1, 2)]["max_jaccard"] >= 0.99
    assert pairs[(1, 2)]["n_dup_chunks"] >= 1
    assert (1, 3) not in pairs and (2, 3) not in pairs

    # and doc-level dedup PROVABLY misses it at any realistic threshold
    doc_level = shingle_jaccard_pairs(
        docs, "lang", threshold=0.5, max_df_frac=1.1
    )
    assert doc_level.count() == 0


def test_cdc_segments_identical_across_offsets_and_df_gate(spark):
    """The CDC segmenter must cut a shared span into IDENTICAL segment
    texts regardless of its offset in each document (the property both
    passage dedup and boilerplate stripping stand on), and a df >= 3
    gate over segment texts must isolate exactly the planted span."""
    import pyspark.sql.functions as F

    from newyork_taxi_etl_spark.operators.dedup import cdc_segments

    shared = " ".join(f"tmpl{i}" for i in range(32))
    rows = [
        (1, " ".join(f"alpha{i}" for i in range(41)) + " " + shared),
        (2, " ".join(f"gamma{i}" for i in range(77)) + " " + shared),
        (3, shared + " " + " ".join(f"omega{i}" for i in range(53))),
        (4, " ".join(f"beta{i}" for i in range(60))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    segs = cdc_segments(docs, boundary_mod=8, min_tokens=5)
    boiler = (
        segs.groupBy("ctext")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 3)
    )
    flagged = [r["ctext"] for r in boiler.collect()]
    assert flagged, "planted 3-doc span not detected"
    for t in flagged:
        assert "tmpl" in t and "beta" not in t, t
    # every flagged segment is interior to the shared span in all 3 docs
    hit_docs = (
        segs.join(boiler.select("ctext"), "ctext")
        .select("doc_id")
        .distinct()
        .collect()
    )
    assert sorted(r["doc_id"] for r in hit_docs) == [1, 2, 3]


def test_containment_catches_subset_dup_jaccard_misses(spark):
    # doc 11 (short) is embedded VERBATIM in doc 12 (long): containment
    # against the smaller set is 1.0 while Jaccard is ~|A|/|B| (tiny) —
    # the exact failure mode dedup_containment exists for.
    short = " ".join(f"quote{i}" for i in range(12))
    long = (
        " ".join(f"body{i}" for i in range(120))
        + " " + short + " "
        + " ".join(f"tail{i}" for i in range(120))
    )
    rows = [
        (11, short, "en"),
        (12, long, "en"),
        (13, " ".join(f"other{i}" for i in range(40)), "en"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    cont = D.shingle_jaccard_pairs(
        docs, "lang", threshold=0.5, metric="containment"
    ).collect()
    got = {(r.id_a, r.id_b): r.containment for r in cont}
    assert got.get((11, 12)) == 1.0, got
    assert (11, 13) not in got and (12, 13) not in got
    # the symmetric-Jaccard twin at the same threshold does NOT pair them
    jac = D.shingle_jaccard_pairs(docs, "lang", threshold=0.5).collect()
    assert not any((r.id_a, r.id_b) == (11, 12) for r in jac)
