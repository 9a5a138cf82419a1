"""Deduplication operators (training-data-pipeline surface; BASELINE.json
north star). Five families, each Spark-first:

  * exact          — hash-groupBy on normalized content; one shuffle on the
                     content hash, map-side combine, keeps min doc_id.
  * minhash + LSH  — shingle → md5-family MinHash → banded bucket-join;
                     candidate pairs only ever meet inside a band bucket, so
                     the shuffle is on (band_idx, band_hash) — never all-pairs.
  * simhash        — per-token hash bit votes → compact bit signature;
                     near-dups = small Hamming distance.
  * n-gram Jaccard — exact verify (blocked all-pairs) for candidate sets.
  * embedding cos  — cosine over an array<float> column (see similarity.py
                     for the top-k/ANN forms).

Scale shape: at 100 TB the only viable near-dup path is the banded-LSH one —
every stage here is (narrow projection) → (explode bands) → (hash shuffle on
band key) → (within-bucket pairs). The all-pairs verify is reserved for the
candidate set, which LSH keeps tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from newyork_taxi_etl_spark.functions.text import minhash_expr, shingles_expr


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: min-id keeper + copy count per normalized text."""
    return (
        df.withColumn("content_fp", F.md5(F.lower(F.trim(F.col(text_col)))))
        .groupBy("content_fp")
        .agg(
            F.min(F.col(id_col)).alias("keeper"),
            F.count(F.lit(1)).alias("copies"),
        )
    )


def with_minhash(
    df: DataFrame, text_col: str = "text", n: int = 3, k: int = 4
) -> DataFrame:
    """Attach k MinHash signatures over n-word shingles."""
    out = df.withColumn("_sh", shingles_expr(text_col, n))
    for i in range(k):
        out = out.withColumn(f"mh_{i}", minhash_expr("_sh", i))
    return out.drop("_sh")


def lsh_candidate_pairs(
    sigs: DataFrame, id_col: str = "doc_id", k: int = 4, rows_per_band: int = 2
) -> DataFrame:
    """Banded LSH: hash r consecutive signatures per band, explode, self-join
    on (band_idx, band_hash), emit distinct id pairs (a < b)."""
    n_bands = k // rows_per_band
    bands = F.array(
        *[
            F.struct(
                F.lit(b).alias("band_idx"),
                F.md5(
                    F.concat_ws(
                        "|",
                        *[
                            F.col(f"mh_{b * rows_per_band + r}")
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("band_hash"),
            )
            for b in range(n_bands)
        ]
    )
    exploded = sigs.select(
        F.col(id_col), F.explode(bands).alias("band")
    ).select(id_col, "band.band_idx", "band.band_hash")
    a, b = exploded.alias("a"), exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .distinct()
    )


def shingle_jaccard_pairs(
    df: DataFrame,
    block_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Blocked all-pairs exact n-gram-shingle Jaccard (the verify stage).

    Blocks on ``block_col`` so the quadratic term is per-block; the join is a
    hash shuffle on the block key.
    """
    sh = df.select(
        F.col(id_col),
        F.col(block_col).alias("blk"),
        F.array_distinct(shingles_expr(text_col, n)).alias("sh"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh")))
    union = F.size(F.array_union(F.col("a.sh"), F.col("b.sh")))
    j = inter.cast("double") / union
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.round(j, 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def with_simhash(
    df: DataFrame, text_col: str = "text", bits: int = 16
) -> DataFrame:
    """SimHash over the distinct-token set: bit i votes +1/-1 by the high
    bit of hex digit i of each token's md5; majority wins.

    Engine-portable (md5 + substring), no UDF; ``bits`` <= 32 (md5 hex len).
    """
    toks = f"array_distinct(split({text_col}, ' '))"
    bit_exprs = []
    for i in range(1, bits + 1):
        vote = (
            f"aggregate({toks}, 0, (acc, t) -> acc + "
            f"(CASE WHEN substring(md5(t), {i}, 1) IN "
            f"('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END))"
        )
        bit_exprs.append(f"(CASE WHEN ({vote}) >= 0 THEN '1' ELSE '0' END)")
    return df.withColumn("simhash", F.expr("concat(" + ", ".join(bit_exprs) + ")"))


def simhash_sql(text_col: str = "text", bits: int = 16) -> str:
    """DuckDB twin of :func:`with_simhash`'s signature expression."""
    toks = f"list_distinct(string_split({text_col}, ' '))"
    bit_exprs = []
    for i in range(1, bits + 1):
        vote = (
            f"list_sum(list_transform({toks}, t -> "
            f"CASE WHEN substring(md5(t), {i}, 1) IN "
            f"('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END))"
        )
        bit_exprs.append(f"(CASE WHEN ({vote}) >= 0 THEN '1' ELSE '0' END)")
    return "concat(" + ", ".join(bit_exprs) + ")"


def hamming_pairs(
    sigs: DataFrame, id_col: str = "doc_id", sig_col: str = "simhash", max_dist: int = 3
) -> DataFrame:
    """Near-dup pairs by Hamming distance over bit-string signatures.

    Blocked on the signature's first half (an LSH-style prefix block) so the
    join is not all-pairs: true near-dups at small distance usually agree on
    one half (pigeonhole); for guaranteed recall run twice with both halves.
    """
    half = F.substring(F.col(sig_col), 1, 8)
    s = sigs.select(F.col(id_col), F.col(sig_col), half.alias("blk"))
    a, b = s.alias("a"), s.alias("b")
    # hamming via per-position compare of the bit string
    dist = F.expr(
        f"aggregate(sequence(1, length(a.{sig_col})), 0, (acc, i) -> acc + "
        f"(CASE WHEN substring(a.{sig_col}, i, 1) <> substring(b.{sig_col}, i, 1) "
        f"THEN 1 ELSE 0 END))"
    )
    return (
        a.join(
            b,
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            dist.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_dist)
    )
