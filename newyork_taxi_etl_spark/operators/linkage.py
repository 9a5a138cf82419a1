"""Cross-table fuzzy record linkage: blocked candidate generation,
similarity scoring, and one-to-one match resolution.

The missing LLM-pipeline capability the within-table dedup family
(operators/dedup.py) does not cover: two corpora A and B that describe
the SAME underlying records under textual noise (a re-crawl, an OCR'd
copy, a vendor feed) must be LINKED — each A-record resolved to at most
one B-record — without an O(|A|*|B|) comparison.  The pipeline is the
classic three-stage shape (Fellegi-Sunter blocking / comparison /
decision, re-expressed Spark-first):

  1. candidate generation — only pairs sharing a blocking key ever meet
     (an inverted shingle index with a hot-shingle cap, or banded
     MinHash-LSH);
  2. scoring — exact n-gram-shingle Jaccard on the candidates only;
  3. resolution — mutual-best (symmetric rank-1) one-to-one matching,
     the deterministic greedy stage of stable marriage.

Everything is DataFrame-declarative: two hash shuffles for the blocked
join (on the block key, then on the pair key) and two window ranks for
resolution — no driver-side loops, no per-row Python.

Reference parity: the reference notebook has no linkage surface; this is
extension surface (SURVEY.md "beyond the reference" track), built on the
same shingle machinery as dedup (nb has no analog cell).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from newyork_taxi_etl_spark.functions.text import with_shingles


def perturb_tokens_expr(
    text_col: str, id_col: str, drop_mod: int = 5
) -> Column:
    """Deterministically drop every token whose 1-based position ``i``
    satisfies ``(i + id) % drop_mod == 0``, rejoined with single spaces.

    This is the planted-noise generator for linkage tests and the derived
    second corpus: ~1/drop_mod of tokens vanish, which preserves enough
    word-trigram shingles (every kept run of >= 3 tokens) for linkage
    while perturbing every document differently (the id participates in
    the phase).  Spark's higher-order ``filter`` index is 0-based, the
    DuckDB oracle's is 1-based — the ``i + 1`` here keeps the two
    bit-identical.
    """
    return F.array_join(
        F.filter(
            F.split(F.col(text_col), " "),
            lambda x, i: ((i + F.lit(1) + F.col(id_col)) % drop_mod)
            != F.lit(0),
        ),
        " ",
    )


def derive_perturbed_corpus(
    docs: DataFrame,
    id_offset: int = 100_000,
    keep_mod: int = 2,
    drop_mod: int = 5,
) -> DataFrame:
    """A deterministic second corpus derived from ``documents`` in-query:
    every doc with ``doc_id % keep_mod == 0`` reappears under
    ``b_id = doc_id + id_offset`` with ~1/drop_mod of its tokens dropped
    (:func:`perturb_tokens_expr`).  Ground truth for linkage quality is
    therefore known relationally (``b_id - id_offset``), which is what
    lets precision/recall be VALUE-ORACLED instead of asserted."""
    return docs.filter((F.col("doc_id") % keep_mod) == 0).select(
        (F.col("doc_id") + F.lit(id_offset)).alias("b_id"),
        perturb_tokens_expr("text", "doc_id", drop_mod).alias("text"),
        "lang",
    )


def _pruned_inverted(
    a_df: DataFrame,
    b_df: DataFrame,
    block_col: str,
    n: int,
    max_df_frac: float | None,
):
    """Side-tagged inverted shingle indexes with a shared hot-shingle cap.

    The cap is computed over the UNION of both corpora (df > max_df_frac *
    docs-in-block across A and B): a boilerplate shingle is boilerplate no
    matter which side it appears on, and one shared cap keeps the pruned
    |union| sizes consistent for Jaccard.  The hot set is tiny by
    construction (only above-cap shingles), so its anti-join broadcasts.
    """
    sh_a = (
        with_shingles(a_df, "text", n)
        .select(
            "doc_id",
            F.col(block_col).alias("blk"),
            F.array_distinct("sh").alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    sh_b = (
        with_shingles(b_df, "text", n)
        .select(
            "b_id",
            F.col(block_col).alias("blk"),
            F.array_distinct("sh").alias("s"),
        )
        .localCheckpoint(eager=True)
    )
    inv_a = sh_a.select("doc_id", "blk", F.explode("s").alias("g"))
    inv_b = sh_b.select("b_id", "blk", F.explode("s").alias("g"))
    if max_df_frac is not None:
        n_docs = (
            sh_a.select("blk")
            .unionAll(sh_b.select("blk"))
            .groupBy("blk")
            .agg(F.count(F.lit(1)).alias("n_docs"))
        )
        hot = (
            inv_a.select("blk", "g")
            .unionAll(inv_b.select("blk", "g"))
            .groupBy("blk", "g")
            .agg(F.count(F.lit(1)).alias("df"))
            .join(n_docs, "blk")
            .filter(F.col("df") > F.col("n_docs") * F.lit(max_df_frac))
            .select("blk", "g")
        )
        inv_a = inv_a.join(F.broadcast(hot), ["blk", "g"], "left_anti")
        inv_b = inv_b.join(F.broadcast(hot), ["blk", "g"], "left_anti")
    return sh_a, sh_b, inv_a, inv_b


def blocked_linkage_pairs(
    a_df: DataFrame,
    b_df: DataFrame,
    block_col: str = "lang",
    n: int = 3,
    threshold: float = 0.15,
    max_df_frac: float | None = 0.10,
) -> DataFrame:
    """Stage 1+2: cross-table candidates via an inverted shingle index,
    scored with exact n-gram Jaccard — ``(doc_id, b_id, jaccard)``.

    Identical join shape to the within-table
    :func:`operators.dedup.shingle_jaccard_pairs`, but A-side and B-side
    explode separately and meet in an A x B equi-join on (block, shingle):
    join mass is sum_g f_A(g) * f_B(g), bounded by the hot-shingle cap —
    never |A| x |B|.  Sizes for |union| are recomputed over the PRUNED
    shingle sets (consistent with the cap, mirrored in the oracle).
    Shuffles: one on (block, shingle), one on the pair key — the 100 TB
    shape; no per-pair array ops anywhere.
    """
    _, _, inv_a, inv_b = _pruned_inverted(a_df, b_df, block_col, n, max_df_frac)
    sz_a = inv_a.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_a"))
    sz_b = inv_b.groupBy("b_id").agg(F.count(F.lit(1)).alias("n_b"))
    pairs = (
        inv_a.join(inv_b, ["blk", "g"])
        .groupBy("doc_id", "b_id")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    j = F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared"))
    return (
        pairs.join(sz_a, "doc_id")
        .join(sz_b, "b_id")
        .filter(j >= F.lit(threshold))
        .select("doc_id", "b_id", j.alias("jaccard"))
    )


def lsh_linkage_candidates(
    a_df: DataFrame,
    b_df: DataFrame,
    block_col: str = "lang",
    n: int = 3,
    k: int = 8,
) -> DataFrame:
    """Stage-1 alternative: banded MinHash-LSH candidates, one row per
    band (r=1), k bands — ``(doc_id, b_id)`` distinct pairs.

    The scale tradeoff vs the inverted index: LSH explodes exactly k rows
    per document regardless of document LENGTH (the inverted index
    explodes |shingle set| rows), at the cost of measured recall
    1 - (1 - J)^k — ~0.94 at J~=0.3 with k=8.  Candidate pairs meet only
    inside (block, band, min-signature) buckets; md5 over a seeded
    shingle keeps the hash family portable to the DuckDB oracle.
    """
    def bands(df, id_col):
        sh = with_shingles(df, "text", n).select(
            id_col,
            F.col(block_col).alias("blk"),
            F.array_distinct("sh").alias("s"),
        )
        band_arr = F.array(
            *[
                F.struct(
                    F.lit(i).alias("band_idx"),
                    F.expr(
                        f"array_min(transform(s, x -> md5(concat('{i}|', x))))"
                    ).alias("band_hash"),
                )
                for i in range(k)
            ]
        )
        return sh.select(
            id_col, "blk", F.explode(band_arr).alias("band")
        ).select(id_col, "blk", "band.band_idx", "band.band_hash")

    return (
        bands(a_df, "doc_id")
        .join(bands(b_df, "b_id"), ["blk", "band_idx", "band_hash"])
        .select("doc_id", "b_id")
        .distinct()
    )


def mutual_best_match(
    scored: DataFrame,
    left_id: str = "doc_id",
    right_id: str = "b_id",
    score_col: str = "jaccard",
) -> DataFrame:
    """Stage 3: one-to-one resolution by SYMMETRIC rank-1 — keep a pair
    iff it is the best candidate for its left id AND for its right id
    (ties broken by the opposite id, so the result is deterministic and
    engine-independent).

    This is the first round of stable marriage run to a fixed decision:
    mutual-best pairs are exactly the matches every stable matching must
    contain, greedy-resolved in two window ranks (no iteration).  Each
    rank is one hash shuffle on its id — candidate sets are small by
    blocking, so the windows are narrow; nothing here depends on corpus
    size, only on candidate count.
    """
    ra = F.row_number().over(
        Window.partitionBy(left_id).orderBy(
            F.col(score_col).desc(), F.col(right_id)
        )
    )
    rb = F.row_number().over(
        Window.partitionBy(right_id).orderBy(
            F.col(score_col).desc(), F.col(left_id)
        )
    )
    return (
        scored.withColumn("_ra", ra)
        .withColumn("_rb", rb)
        .filter((F.col("_ra") == 1) & (F.col("_rb") == 1))
        .drop("_ra", "_rb")
    )
