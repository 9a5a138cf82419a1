"""Text-analysis column functions for the training-data-pipeline surface
(BASELINE.json north star: dedup / quality / token counting / fingerprints).

Everything here is a JVM-side built-in expression (split / transform /
aggregate / md5) — no Python UDFs — so text profiling over 100 TB of
documents stays inside whole-stage codegen. Shingling and MinHash use md5 as
the hash family (seeded by prefixing the seed index), which is deliberately
engine-portable: the DuckDB oracle computes the identical signature.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text: str = "text") -> Column:
    """Whitespace tokenization."""
    return F.split(F.col(text), " ")


def shingles_expr(text_col: str = "text", n: int = 3) -> Column:
    """n-word shingles (SQL expr so the lambda stays engine-portable)."""
    toks = f"split({text_col}, ' ')"
    parts = ", ".join(f"element_at({toks}, i + {j})" for j in range(n))
    return F.expr(
        f"CASE WHEN size({toks}) >= {n} "
        f"THEN transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> concat_ws(' ', {parts})) "
        f"ELSE array() END"
    )


def shingles_sql(text_col: str = "text", n: int = 3) -> str:
    """DuckDB twin of :func:`shingles_expr` (1-based list indexing)."""
    toks = f"string_split({text_col}, ' ')"
    parts = " || ' ' || ".join(f"{toks}[i + {j}]" for j in range(n))
    return (
        f"CASE WHEN len({toks}) >= {n} "
        f"THEN list_transform(range(1, len({toks}) - {n - 2}), i -> {parts}) "
        f"ELSE [] END"
    )


def with_shingles(df, text_col: str = "text", n: int = 3, out: str = "sh"):
    """Attach an n-word shingle array, referencing the token array ONCE
    per shingle.

    ``array_join(slice(toks, i, n), ' ')`` beats the old per-element
    ``concat_ws(element_at, ...)`` form by construction: n element_at
    references mean n token-array evaluations per shingle once
    CollapseProject folds the split binding into the lambda (interpreted
    lambda evaluation does not CSE them away) — measured 15 s vs 0.6 s
    at n=8 over the sf0.1 corpus on local[32], and a ~3x token-work
    saving at n=3.  Output strings are byte-identical to the old form.
    """
    toks = "_toks_" + out
    sh = (
        f"CASE WHEN size({toks}) >= {n} "
        f"THEN transform(sequence(1, size({toks}) - {n - 1}), "
        f"i -> array_join(slice({toks}, i, {n}), ' ')) "
        f"ELSE array() END"
    )
    return (
        df.withColumn(toks, F.split(F.col(text_col), " "))
        .withColumn(out, F.expr(sh))
        .drop(toks)
    )


def minhash_expr(shingle_col: str, seed: int) -> Column:
    """One MinHash signature: min over md5(seed || shingle).

    md5 with a seed prefix is a portable, deterministic hash family — the
    classic (a*x+b) mod p family would need identical integer semantics in
    both engines; md5 strings compare identically everywhere.
    """
    return F.expr(
        f"array_min(transform({shingle_col}, s -> md5(concat('{seed}|', s))))"
    )


def minhash_sql(shingle_expr: str, seed: int) -> str:
    return f"list_min(list_transform({shingle_expr}, s -> md5(concat('{seed}|', s))))"


def marker_count(toks: Column | str, word: str) -> Column:
    """Occurrences of an exact token (language-ID marker counting)."""
    c = F.col(toks) if isinstance(toks, str) else toks
    return F.size(F.filter(c, lambda x: x == F.lit(word)))


def marker_count_sql(toks_expr: str, word: str) -> str:
    return f"len(list_filter({toks_expr}, x -> x = '{word}'))"
