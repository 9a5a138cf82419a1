"""WordPiece greedy longest-match segmentation (the BERT runtime
algorithm).

``wordpiece_merge_loop`` trains the merge table and
``wordpiece_holdout_fertility`` applies it with the BPE merge fold (apply
in training ORDER); the deployed BERT tokenizer instead segments against
the FINAL vocabulary with greedy longest-match-first (Schuster & Nakajima
2012; Devlin et al. 2019 use the same runtime).  This operator is that
runtime, relational:

1. candidate cells (w, i, d) = substring(w, i, d) for d <= max_piece_len,
   inner-joined against the vocabulary — the unigram cost-grid idiom
   (operators/unigram.py) pointed forward instead of backward;
2. best_len(w, i) = max matching d per position (singles must be in the
   vocabulary, so every position matches at least itself);
3. one left fold over positions with a struct accumulator (the
   _BPE_MERGE_EXPR discipline): at the current cursor take the longest
   match, emit it, jump the cursor; other positions pass through.

Everything is vocab-sized after the word collapse: the fold runs once per
DISTINCT word, never per token instance.  Registration as a query +
DuckDB oracle is deferred to the next round (the driver-window cap was
reached this round); the pytest reference implementation pins semantics
until then.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: merges of merges can reach 2^rounds chars; 8 covers 3 training rounds
MAX_PIECE_LEN = 8

_GREEDY_FOLD = """
aggregate(
  sequence(1, length(w)),
  named_struct('pos', 1,
               'out', CAST(array() AS ARRAY<STRING>)),
  (acc, i) -> CASE
    WHEN i = acc.pos THEN named_struct(
      'pos', acc.pos + element_at(best, i),
      'out', concat(acc.out,
                    array(substring(w, i, element_at(best, i)))))
    ELSE acc END,
  acc -> acc.out)
"""


def greedy_segment_words(
    words: DataFrame, vocab: DataFrame, max_piece_len: int = MAX_PIECE_LEN
) -> DataFrame:
    """Greedy longest-match segmentation of every (w, freq) word against
    ``vocab`` (one ``piece`` string column; MUST contain every single
    character of the words or a position could have no match).

    Returns (w, freq, pieces array<string>).
    """
    L = int(max_piece_len)
    cells = (
        words.select(
            "w", F.explode(F.expr("sequence(1, length(w))")).alias("i")
        )
        .select("w", "i", F.explode(F.expr(f"sequence(1, {L})")).alias("d"))
        .filter(F.col("i") + F.col("d") - 1 <= F.length("w"))
        .withColumn("piece", F.expr("substring(w, i, d)"))
    )
    matched = cells.join(
        F.broadcast(vocab.select("piece").distinct()), "piece"
    )
    best = (
        matched.groupBy("w", "i")
        .agg(F.max("d").alias("bl"))
        .groupBy("w")
        .agg(
            F.expr(
                "transform(array_sort(collect_list(struct(i, bl))), "
                "x -> x.bl)"
            ).alias("best")
        )
    )
    return (
        words.join(best, "w")
        .select("w", "freq", F.expr(_GREEDY_FOLD).alias("pieces"))
    )


def vocab_from_tops(spark, tops) -> DataFrame:
    """Final WordPiece vocabulary = all single characters of the corpus
    plus each round's merged pair — built from ``_wp_train_tops`` output
    (list of 1-row (a, b, ...) frames)."""
    merged = None
    for top in tops:
        piece = top.select(F.concat("a", "b").alias("piece"))
        merged = piece if merged is None else merged.unionByName(piece)
    return merged


def greedy_fold_sql_duckdb() -> str:
    """DuckDB twin of ``_GREEDY_FOLD`` (scalar 'pos|out' VARCHAR
    accumulator — DuckDB list_reduce cannot thread LIST struct members;
    the seed rides as a prepended first element, the unigram fold's
    idiom).  Expects columns ``w`` and ``best`` (LIST of INTs, 1-based
    per position); yields the pieces as a LIST(VARCHAR)."""
    return """
      string_split(string_split(list_reduce(
        list_prepend('1|',
          list_transform(range(1, length(w) + 1),
                         q -> CAST(q AS VARCHAR))),
        (acc, x) -> CASE
          WHEN CAST(x AS INT) = CAST(string_split(acc, '|')[1] AS INT)
          THEN CAST(CAST(x AS INT) + best[CAST(x AS INT)] AS VARCHAR)
               || '|' ||
               CASE WHEN string_split(acc, '|')[2] = ''
                    THEN substring(w, CAST(x AS INT),
                                   best[CAST(x AS INT)])
                    ELSE string_split(acc, '|')[2] || chr(2) ||
                         substring(w, CAST(x AS INT),
                                   best[CAST(x AS INT)])
               END
          ELSE acc END),
        '|')[2], chr(2))
    """


def greedy_segment_sql_duckdb(
    words: str, vocab: str, max_piece_len: int = MAX_PIECE_LEN
) -> str:
    """Full DuckDB CTE chain mirroring :func:`greedy_segment_words`:
    ``words`` (w, freq) and ``vocab`` (piece) are existing relations;
    returns SQL yielding (w, freq, pieces LIST(VARCHAR))."""
    L = int(max_piece_len)
    return f"""
    WITH gcells AS (
      SELECT t.w, i.i AS i, d.d AS d, substring(t.w, i.i, d.d) AS piece
      FROM {words} t,
           unnest(range(1, length(t.w) + 1)) AS i(i),
           unnest(range(1, {L + 1})) AS d(d)
      WHERE i.i + d.d - 1 <= length(t.w)
    ),
    gmatched AS (
      SELECT c.w, c.i, c.d
      FROM gcells c JOIN (SELECT DISTINCT piece FROM {vocab}) v
        ON c.piece = v.piece
    ),
    gbest AS (
      SELECT w, list(bl ORDER BY i) AS best FROM (
        SELECT w, i, CAST(MAX(d) AS INT) AS bl
        FROM gmatched GROUP BY w, i
      ) GROUP BY w
    )
    SELECT t.w, t.freq, {greedy_fold_sql_duckdb()} AS pieces
    FROM {words} t JOIN gbest USING (w)
    """
