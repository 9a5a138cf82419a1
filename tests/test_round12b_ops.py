"""Round-12 session-2 additions: readability, character-coverage budget
(batch + ingest twin), and their semantic invariants the oracle
differential cannot see (hand-computed references, planted fixtures,
batching invariance)."""

from __future__ import annotations

import pytest

from newyork_taxi_etl_spark.queries.text import (
    _char_counts,
    _char_coverage_finalize,
    _readability_finalize,
    _readability_terms,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


@pytest.mark.quick
def test_readability_planted_punctuation(spark):
    """Sentence splitting is REAL when punctuation exists: a planted
    3-sentence doc must score against n_sents=3, not the corpus
    fallback of 1 — hand-computed Flesch."""
    text = "The cat sat. The dog ran! A big map?"
    rows = [(1, "en", text)]
    out = _readability_finalize(_readability_terms(_docs(spark, rows))).collect()
    assert len(out) == 1
    r = out[0]
    # 9 words, 3 sentences; syllables by vowel-group+novowel rule:
    # the(1) cat(1) sat(1). the(1) dog(1) ran(1)! a(1) big(1) map(1)? = 9
    n_words, n_sents, n_syll = 9, 3, 9
    wps = n_words / n_sents
    spw = n_syll / n_words
    fre = 206.835 - 1.015 * wps - 84.6 * spw
    assert r.n_docs == 1
    assert r.avg_words_per_sentence == round(wps, 6)
    assert r.avg_syllables_per_word == round(spw, 6)
    assert r.avg_flesch == round(fre, 6)


@pytest.mark.quick
def test_readability_fallback_and_min_syllable(spark):
    """No punctuation -> single-sentence fallback; vowel-less words get
    the min-1 syllable correction; vowel GROUPS count once ('see' = 1)."""
    rows = [(1, "xx", "zz bcd see")]
    out = _readability_finalize(_readability_terms(_docs(spark, rows))).collect()
    r = out[0]
    # 3 words, 1 sentence (fallback), syllables: zz=1 (novowel), bcd=1
    # (novowel), see=1 (one vowel group) = 3
    assert r.avg_words_per_sentence == 3.0
    assert r.avg_syllables_per_word == 1.0
    assert r.avg_flesch == round(206.835 - 1.015 * 3 - 84.6 * 1, 6)


@pytest.mark.quick
def test_char_coverage_hand_computed(spark):
    """Planted alphabet: counts a=3 b=2 c=1 (space excluded), total 6.
    90% needs cum>=5.4 -> 3 chars; 99.5% needs cum>=5.97 -> 3 chars;
    top char 'a' with share 0.5."""
    rows = [(1, "xx", "aaab bc")]
    out = _char_coverage_finalize(_char_counts(_docs(spark, rows))).collect()
    r = out[0]
    assert (r.n_chars_total, r.alphabet_size) == (6, 3)
    assert (r.chars_for_90, r.chars_for_995) == (3, 3)
    assert (r.top_char, r.top_share) == ("a", 0.5)


@pytest.mark.quick
def test_char_coverage_tie_break_deterministic(spark):
    """Equal counts rank lexicographically: 'ab' twice -> a and b tie at
    2; rank-1 must be 'a' on both engines (cnt DESC, ch ASC)."""
    rows = [(1, "xx", "ab ab")]
    r = _char_coverage_finalize(_char_counts(_docs(spark, rows))).collect()[0]
    assert r.top_char == "a"
    assert r.chars_for_90 == 2  # 2 of 4 chars is only 50%; need both


def test_streaming_char_coverage_matches_batch_any_slicing(spark, tmp_path):
    """Drained == batch bit-for-bit under 1 vs 4 slices: integer
    (lang, char) partials commute, so slicing cannot matter."""
    from newyork_taxi_etl_spark.sources.readers import table_path
    from newyork_taxi_etl_spark.streaming import windows as W

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    batch = [
        tuple(r)
        for r in _char_coverage_finalize(_char_counts(docs)).collect()
    ]
    for n_slices in (1, 4):
        got = [
            tuple(r)
            for r in W.run_streaming_char_coverage_ingest(
                spark, docs, str(tmp_path / f"s{n_slices}"), n_slices=n_slices
            ).collect()
        ]
        assert got == batch, f"slicing {n_slices} diverged"
