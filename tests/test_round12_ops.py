"""Round-12 operator tests: WordPiece greedy-runtime hardening (ADVICE
r11), the registered wordpiece_greedy_segment query, and the round's new
operators."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_ORACLE
from newyork_taxi_etl_spark.registry import queries


def _py_greedy(word, vocab, max_len=8):
    """Plain-Python greedy longest-match reference (BERT runtime)."""
    out, pos = [], 0
    while pos < len(word):
        for d in range(min(max_len, len(word) - pos), 0, -1):
            if word[pos : pos + d] in vocab:
                out.append(word[pos : pos + d])
                pos += d
                break
        else:  # pragma: no cover - vocab must contain singles
            raise AssertionError("uncovered position")
    return out


def test_wordpiece_greedy_separator_collision_words(spark):
    """ADVICE r11: corpus words may contain ANY printable byte (they come
    from a whitespace split of arbitrary text).  The DuckDB fold's scalar
    accumulator must not be corrupted by words carrying its former '|'
    separator, the ',' cut-position joiner, or raw control characters —
    the positions-only chr(1) accumulator never holds word bytes, so all
    of these segment identically on both engines."""
    import duckdb

    from newyork_taxi_etl_spark.operators.wordpiece import (
        greedy_segment_sql_duckdb,
        greedy_segment_words,
    )

    nasty = ["a|b", "x||", "a,b,c", "|,|", "a\x02b", "ab|cd"]
    words = spark.createDataFrame(
        [(w, i + 1) for i, w in enumerate(nasty)], "w string, freq long"
    )
    vocab_set = set("abcdx|,\x02") | {"ab", "cd", "a|"}
    vocab = spark.createDataFrame(
        [(p,) for p in sorted(vocab_set)], "piece string"
    )
    got_spark = {
        r["w"]: list(r["pieces"])
        for r in greedy_segment_words(words, vocab).collect()
    }
    for w in nasty:
        assert got_spark[w] == _py_greedy(w, vocab_set), w
        assert "".join(got_spark[w]) == w

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE words (w VARCHAR, freq BIGINT);"
        "CREATE TABLE vocab (piece VARCHAR)"
    )
    con.executemany(
        "INSERT INTO words VALUES (?, ?)",
        [(w, i + 1) for i, w in enumerate(nasty)],
    )
    con.executemany(
        "INSERT INTO vocab VALUES (?)", [(p,) for p in sorted(vocab_set)]
    )
    got_duck = {
        w: list(pieces)
        for w, _freq, pieces in con.execute(
            greedy_segment_sql_duckdb("words", "vocab")
        ).fetchall()
    }
    con.close()
    assert got_duck == got_spark


def test_wordpiece_greedy_uncovered_vocab_raises(spark):
    """ADVICE r11: a vocabulary missing a single character must raise
    loudly, not silently shift best-length positions (interior gap) or
    silently drop the word (no position matches at all)."""
    from newyork_taxi_etl_spark.operators.wordpiece import (
        greedy_segment_words,
    )

    words = spark.createDataFrame([("abc", 1)], "w string, freq long")
    # interior gap: 'b' missing -> positions collapse without the guard
    vocab_gap = spark.createDataFrame([("a",), ("c",)], "piece string")
    with pytest.raises(Exception, match="does not cover"):
        greedy_segment_words(words, vocab_gap).collect()
    # total miss: no position matches -> LEFT join keeps the word, guard
    # fires on best IS NULL instead of the old silent inner-join drop
    vocab_none = spark.createDataFrame([("z",)], "piece string")
    with pytest.raises(Exception, match="does not cover"):
        greedy_segment_words(words, vocab_none).collect()


def test_wordpiece_vocab_from_tops_contains_singles(spark):
    """ADVICE r11: vocab_from_tops must honor its contract — all single
    characters of the words frame PLUS each round's merged pair — so a
    caller following the docstring feeds greedy_segment_words a
    precondition-satisfying vocabulary."""
    from newyork_taxi_etl_spark.operators.wordpiece import vocab_from_tops

    words = spark.createDataFrame(
        [("abc", 2), ("qz", 1)], "w string, freq long"
    )
    tops = [
        spark.createDataFrame([("a", "b", 9)], "a string, b string, n long")
    ]
    got = {r["piece"] for r in vocab_from_tops(words, tops).collect()}
    assert got == {"a", "b", "c", "q", "z", "ab"}


def test_wordpiece_log_score_matches_duckdb_on_planted(spark):
    """The log-domain score (ln n - ln fa - ln fb) must be identical on
    both engines after the 12-decimal round: train one round on the
    planted q/z corpus and compare the top row value-for-value."""
    import duckdb

    from newyork_taxi_etl_spark.queries.text import _wp_train_tops

    rows = ["that this then hath teeth"] * 6 + ["qz"] * 3
    docs = spark.createDataFrame([(r,) for r in rows], "text string")
    top = _wp_train_tops(docs, rounds=1)[0].collect()[0]
    assert (top["a"], top["b"]) == ("q", "z")
    assert abs(top["score"] - round(math.log(3) - 2 * math.log(3), 12)) < 1e-12

    con = duckdb.connect()
    got = con.execute(
        "SELECT ROUND(ln(3) - ln(3) - ln(3), 12)"
    ).fetchone()[0]
    con.close()
    assert top["score"] == got


def test_wordpiece_greedy_segment_query_contract(spark):
    """Registered-query contract: roundtrip + greedy reference on every
    returned row at the oracle SF, deterministic order."""
    res = queries()["wordpiece_greedy_segment"](spark, SF_ORACLE).collect()
    assert len(res) > 0
    for r in res:
        assert "".join(r["pieces"].split(" ")) == r["w"], r
    ws = [r["w"] for r in res]
    assert ws == sorted(ws)


def test_dsir_ingest_batching_invariant_and_equals_batch(spark, tmp_path):
    """Per-doc DSIR weights are final on arrival (frozen model, whole
    docs) and the per-language partials are decimal-additive, so the
    drained profile must equal itself under 1 vs 4 slices AND equal the
    one-shot batch statistic bit-for-bit."""
    from newyork_taxi_etl_spark.streaming.windows import (
        run_streaming_dsir_ingest,
    )

    docs = spark.read.parquet(f"{SF_ORACLE}/documents.parquet")
    one = run_streaming_dsir_ingest(
        spark, docs, str(tmp_path / "one"), n_slices=1
    ).collect()
    four = run_streaming_dsir_ingest(
        spark, docs, str(tmp_path / "four"), n_slices=4
    ).collect()
    batch = queries()["dsir_importance_select"](spark, SF_ORACLE).collect()
    assert sorted(map(tuple, one)) == sorted(map(tuple, four))
    assert sorted(map(tuple, one)) == sorted(map(tuple, batch))
    shares = {r["lang"]: r["selected_share"] for r in one}
    # target lang self-selects hardest (absolute share is corpus-dependent
    # on this 31-word synthetic vocab — hash-collision bleed)
    assert shares["en"] == max(shares.values())
    assert shares["en"] > 0.0


def test_sq_sweep_recall_floors_and_monotone(spark):
    """Every scalar-quantization operating point ships with a measured
    recall floor (sf0.01 measured: sq4 0.82, sq6 0.98, sq8 1.0), and the
    recall-vs-bytes curve must be monotone non-decreasing in bits — more
    code budget never hurts with the same affine codec."""
    rows = {
        r["bits"]: r
        for r in queries()["ann_recall_sq_sweep"](spark, SF_ORACLE).collect()
    }
    assert set(rows) == {4, 6, 8}
    assert rows[4]["recall"] >= 0.7
    assert rows[6]["recall"] >= 0.85
    assert rows[8]["recall"] >= 0.8
    assert rows[4]["recall"] <= rows[6]["recall"] <= rows[8]["recall"]
    assert [rows[b]["bytes_per_vec"] for b in (4, 6, 8)] == [32, 48, 64]
