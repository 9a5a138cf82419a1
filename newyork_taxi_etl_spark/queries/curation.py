"""Corpus-curation queries over ``documents`` (LLM training-data surface).

The curation stages between crawl and tokenizer — repetition filtering,
benchmark decontamination, domain mixing, token packing, and relevance
scoring — each as a registered query with a DuckDB value oracle. The
reference has no analogue (its scope stops at taxi-trip ETL); these are the
"beyond the reference" operators the 100 TB deployment needs, built on the
same engine-portable expression discipline as queries/text.py.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from newyork_taxi_etl_spark.functions.text import shingles_sql
from newyork_taxi_etl_spark.operators import curation as C
from newyork_taxi_etl_spark.registry import register
from newyork_taxi_etl_spark.session import spread
from newyork_taxi_etl_spark.sources.readers import table_path

_SH = shingles_sql("text", 3)


@register(
    "doc_repetition_profile",
    f"""
    WITH d AS (
      SELECT doc_id,
             string_split(text, ' ') AS toks,
             {_SH} AS sh
      FROM documents
    )
    SELECT doc_id,
           CAST(len(toks) AS INT) AS n_tokens,
           ROUND(1 - len(list_distinct(toks)) / len(toks), 4)
             AS dup_tok_frac,
           CASE WHEN len(sh) > 0
                THEN ROUND(1 - len(list_distinct(sh)) / len(sh), 4)
                ELSE 0.0 END AS dup_ngram_frac
    FROM d
    ORDER BY dup_ngram_frac DESC, dup_tok_frac DESC, doc_id
    LIMIT 20
    """,
    doc="Gopher-style repetition signals: per-doc duplicate-token and "
    "duplicate-3-gram fractions (1 - distinct/total), top-20 most "
    "repetitive docs. Pure per-row array expressions — the repetition "
    "filter of a 100 TB pipeline is embarrassingly parallel and stays "
    "that way (no shuffle before the final top-k)",
)
def doc_repetition_profile(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    prof = C.repetition_profile(docs)
    return prof.orderBy(
        F.desc("dup_ngram_frac"), F.desc("dup_tok_frac"), "doc_id"
    ).limit(20)


@register(
    "contamination_ngram_overlap",
    f"""
    WITH sh AS (
      SELECT doc_id, unnest(list_distinct({_SH})) AS sh FROM documents
    ),
    bench AS (SELECT DISTINCT sh FROM sh WHERE doc_id % 50 = 0),
    corpus AS (SELECT * FROM sh WHERE doc_id % 50 <> 0),
    tot AS (
      SELECT doc_id, COUNT(*) AS n_shingles FROM corpus GROUP BY 1
    ),
    hit AS (
      SELECT c.doc_id, COUNT(*) AS n_hit
      FROM corpus c JOIN bench USING (sh) GROUP BY 1
    )
    SELECT t.doc_id, t.n_shingles,
           COALESCE(h.n_hit, 0) AS n_hit,
           ROUND(COALESCE(h.n_hit, 0) / t.n_shingles, 4) AS overlap_frac
    FROM tot t LEFT JOIN hit h ON t.doc_id = h.doc_id
    ORDER BY overlap_frac DESC, t.doc_id
    LIMIT 20
    """,
    doc="benchmark decontamination: fraction of each corpus doc's distinct "
    "3-grams that appear anywhere in the 'benchmark' slice (doc_id % 50 = "
    "0 stands in for an eval suite), top-20 most contaminated. The "
    "benchmark shingle set is DISTINCT-ed and broadcast (eval suites are "
    "small by definition), so the corpus side is a broadcast lookup + one "
    "doc_id aggregate — no corpus-sized shuffle at 100 TB",
)
def contamination_ngram_overlap(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    out = C.ngram_contamination(corpus, bench)
    return (
        out.orderBy(F.desc("overlap_frac"), "doc_id")
        .limit(20)
        .select("doc_id", "n_shingles", "n_hit", "overlap_frac")
    )


@register(
    "domain_mix_weights",
    """
    WITH c AS (
      SELECT source, COUNT(*) AS n_docs, pow(COUNT(*), 0.5) AS w
      FROM documents GROUP BY 1
    ),
    t AS (SELECT SUM(w) AS wsum, CAST(SUM(n_docs) AS BIGINT) AS n FROM c)
    SELECT source, n_docs,
           ROUND(w / wsum, 6) AS weight,
           ROUND(w / wsum * n / n_docs, 6) AS eff_epochs
    FROM c, t
    ORDER BY source
    """,
    doc="temperature-scaled domain mixing (alpha=0.5): per-source sampling "
    "weight n^alpha / sum(n^alpha) and the effective epochs over each "
    "domain one mixture epoch implies — the up/down-sampling table a "
    "multi-domain training run is configured from. One tiny aggregate + "
    "a broadcast total; group count = domain count, never data-sized",
)
def domain_mix_weights(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    return C.domain_mix_weights(docs, "source", alpha=0.5)


@register(
    "token_budget_packing",
    """
    WITH d AS (
      SELECT source, doc_id,
             len(string_split(text, ' ')) AS n_tok
      FROM documents
    ),
    cum AS (
      SELECT source, doc_id, n_tok,
             COALESCE(SUM(n_tok) OVER (
               PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS before
      FROM d
    )
    SELECT source,
           CAST(FLOOR(before / 512.0) AS BIGINT) AS bin,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens
    FROM cum
    GROUP BY 1, 2
    ORDER BY source, bin
    """,
    doc="token-budget packing: docs are assigned to 512-token training "
    "bins by per-source ordered cumulative token count (bin = "
    "floor(cum_before/512)); reports per-(source, bin) fill. The "
    "deterministic sharding rule for building fixed-budget training "
    "sequences WITHOUT a global sort — each domain packs independently "
    "in one window over its own partition, which is exactly how a "
    "1000-executor packer shards 100 TB",
)
def token_budget_packing(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    return C.token_budget_packing(docs, budget=512)


def _bestfit_sql(budget: int, sfx: str = "", shard_target: int = 16) -> str:
    """Recursive-CTE twin of operators/curation.sequence_pack_bestfit at
    an arbitrary budget (shared by the registered query and the
    packing_budget_curve sweep so the state machines cannot drift);
    ``sfx`` uniquifies CTE names when several budgets compose in one
    statement.  The (source, shard) group key mirrors the engine's
    bounded-group sharding: shard = md5(doc_id) % ceil(count/target),
    the same cross-engine hash both sides compute.  Emits the final
    per-(source, shard, bin) SELECT."""
    return """WITH RECURSIVE d{sfx} AS (
      SELECT source, doc_id,
             len(string_split(text, ' ')) AS n_tok,
             CAST(CAST(('0x' || substring(md5(CAST(doc_id AS VARCHAR)),
                                          1, 8)) AS BIGINT)
                  % GREATEST(1, CAST(CEIL(COUNT(*) OVER (PARTITION BY
                        source) / {target}.0) AS BIGINT)) AS INT) AS shard
      FROM documents
    ),
    o{sfx} AS (
      SELECT source, shard, doc_id, n_tok,
             row_number() OVER (PARTITION BY source, shard
                                ORDER BY n_tok DESC, doc_id) AS rn
      FROM d{sfx}
    ),
    st{sfx} AS (
      SELECT source, shard, 0 AS rn, CAST(NULL AS BIGINT) AS doc_id,
             CAST(NULL AS BIGINT) AS n_tok, CAST(NULL AS INT) AS bin,
             CAST([] AS STRUCT(rem BIGINT, bin INT)[]) AS state
      FROM (SELECT DISTINCT source, shard FROM o{sfx})
      UNION ALL
      SELECT o.source, o.shard, o.rn, o.doc_id, o.n_tok,
             CASE WHEN fits.best IS NOT NULL THEN fits.best.bin
                  ELSE CAST(len(st.state) AS INT) END AS bin,
             CASE WHEN fits.best IS NOT NULL THEN
               list_transform(st.state, s ->
                 CASE WHEN s.bin = fits.best.bin
                      THEN {{'rem': s.rem - (o.n_tok + 1), 'bin': s.bin}}
                      ELSE s END)
             ELSE list_append(st.state,
                    {{'rem': {budget} - (o.n_tok + 1),
                     'bin': CAST(len(st.state) AS INT)}})
             END AS state
      FROM st{sfx} st
      JOIN o{sfx} o ON o.source = st.source AND o.shard = st.shard
                   AND o.rn = st.rn + 1
      CROSS JOIN LATERAL (
        SELECT list_sort(
                 list_filter(st.state, s -> s.rem >= o.n_tok + 1))[1]
               AS best
      ) fits
    )
    SELECT source, shard, bin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS bin_tokens,
           ROUND(GREATEST({budget} - SUM(n_tok + 1), 0) / {budget}.0, 6)
             AS waste_frac
    FROM st{sfx} WHERE rn > 0
    GROUP BY source, shard, bin
    ORDER BY source, shard, bin""".format(
        budget=budget, sfx=sfx, target=shard_target
    )


@register(
    "sequence_pack_bestfit",
    _bestfit_sql(512),
    doc="BEST-FIT-DECREASING sequence packing (r13 verdict item 7 — the "
    "production concatenate-and-pack variant token_budget_packing's "
    "fixed cumulative bins approximate): per source, docs sort by "
    "token count DESC and each goes to the open bin with the smallest "
    "remaining capacity that fits (ties: lowest bin id; none fits: "
    "new bin), every doc consuming n_tok + 1 for the EOS separator — "
    "the classic <= 11/9-OPT heuristic, so the reported per-bin "
    "waste_frac is what the trainer actually pays.  The open-bin "
    "capacity vector is genuinely sequential state, so each "
    "(domain, shard) group packs in ONE applyInPandas pass "
    "(integer-only, Arrow boundary) with shard = md5(doc_id) % "
    "ceil(domain_count / target) BOUNDING docs-per-group at ~target "
    "regardless of domain skew (r14 verdict item 1) — a 100 TB domain "
    "is thousands of independent bounded groups, never one unbounded "
    "pandas buffer.  shard_target=16 here so the shard path itself is "
    "value-verified at the shipped 25-doc/source SFs (production "
    "default 4096).  Oracle: the identical state machine as a DuckDB "
    "recursive CTE over a list<struct(rem, bin)> accumulator "
    "(list_sort picks min (rem, bin) — the same best-fit tie-break) "
    "keyed by the same md5 shard.  Conservation (every doc in exactly "
    "one bin, no bin over budget, BFD beats first-fit's bin count on "
    "the planted set) and the group-size bound are pytested in "
    "tests/test_round14_ops.py.",
)
def sequence_pack_bestfit(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    return C.sequence_pack_bestfit(docs, budget=512, shard_target=16)


def _budget_leg_sql(budget: int, sfx: str) -> str:
    return f"""SELECT {budget} AS budget,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(bin_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN bin_tokens + n_docs > {budget}
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_oversize,
           ROUND(SUM(bin_tokens + n_docs)
                 / (COUNT(*) * {budget}.0), 6) AS fill_frac
    FROM ({_bestfit_sql(budget, sfx)})"""


@register(
    "packing_budget_curve",
    f"""
    {_budget_leg_sql(256, "_a")}
    UNION ALL
    {_budget_leg_sql(512, "_b")}
    UNION ALL
    {_budget_leg_sql(1024, "_c")}
    ORDER BY budget
    """,
    doc="SEQUENCE-BUDGET SIZING CURVE: the best-fit-decreasing packer "
    "(sequence_pack_bestfit's exact state machine — shared generator, "
    "the oracles cannot drift) swept over context budgets 256/512/"
    "1024, reporting per budget the bin count, packed tokens, "
    "oversize-doc bins, and the fill fraction (consumed incl. EOS "
    "over capacity) — the table a trainer consults to pick sequence "
    "length: short contexts waste capacity on fragmentation, long "
    "ones on tail underfill, and the curve's knee is the answer.  "
    "Same scale shape as the packer: one applyInPandas pass per "
    "bounded (domain, shard, budget) group, groups parallel, "
    "aggregates bin-sized.",
)
def packing_budget_curve(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    legs = []
    for b in (256, 512, 1024):
        packed = C.sequence_pack_bestfit(docs, budget=b, shard_target=16)
        legs.append(
            packed.agg(
                F.lit(b).cast("int").alias("budget"),
                F.count(F.lit(1)).cast("bigint").alias("n_bins"),
                F.sum("bin_tokens").cast("bigint").alias("total_tokens"),
                F.sum(
                    (
                        (F.col("bin_tokens") + F.col("n_docs")) > F.lit(b)
                    ).cast("int")
                )
                .cast("bigint")
                .alias("n_oversize"),
                F.round(
                    F.sum(F.col("bin_tokens") + F.col("n_docs")).cast(
                        "double"
                    )
                    / (F.count(F.lit(1)) * F.lit(float(b))),
                    6,
                ).alias("fill_frac"),
            )
        )
    return legs[0].unionAll(legs[1]).unionAll(legs[2]).orderBy("budget")


@register(
    "tfidf_top_terms",
    """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (
      SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2
    ),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.tok, tf.tf, dfreq.df,
             ROUND(tf.tf * ln(n_docs / df), 4) AS tfidf
      FROM tf JOIN dfreq USING (tok), n
    )
    SELECT doc_id, tok, tf, df, tfidf, rank FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                     ORDER BY tfidf DESC, tok) AS INT) AS rank
      FROM scored
    ) WHERE rank <= 1 AND doc_id < 100
    ORDER BY doc_id
    """,
    doc="per-document top TF-IDF term (tf * ln(N/df), stats over the FULL "
    "corpus, output limited to doc_id < 100 for a bounded result): "
    "document frequencies are one (term, doc)-pair aggregate, N is a "
    "broadcast scalar, and the per-doc top-1 is a ranking window that "
    "WindowGroupLimit prunes before the sort — the keyword-extraction / "
    "quality-signal primitive at corpus scale",
)
def tfidf_top_terms(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    out = C.tfidf_top_terms(docs, top_k=1)
    return out.filter(F.col("doc_id") < 100).orderBy("doc_id")


@register(
    "bm25_rank",
    """
    WITH toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl,
             unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    posting AS (
      SELECT doc_id, tok, dl, COUNT(*) AS tf
      FROM toks WHERE tok IN ('spark', 'join', 'vector')
      GROUP BY 1, 2, 3
    ),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM posting GROUP BY 1),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             AVG(len(string_split(text, ' '))) AS avgdl
      FROM documents
    )
    SELECT doc_id,
           ROUND(SUM(
             ln(1 + (n_docs - df + 0.5) / (df + 0.5))
             * (tf * (1.2 + 1))
             / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
           ), 4) AS bm25
    FROM posting JOIN dfreq USING (tok), stats
    GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 15
    """,
    doc="BM25 relevance of every document to the bag-of-terms query "
    "('spark','join','vector'), top-15: standard (k1=1.2, b=0.75) "
    "saturation with corpus-mean length normalization. Corpus stats (N, "
    "avgdl, per-term df) are tiny broadcast aggregates; the scoring scan "
    "touches only posting rows of the query terms — retrieval-style "
    "search over a training corpus without an external index",
)
def bm25_rank(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    out = C.bm25_scores(docs, ["spark", "join", "vector"])
    return out.orderBy(F.desc("bm25"), "doc_id").limit(15)


@register(
    "training_shard_assignment",
    """
    WITH sharded AS (
      SELECT doc_id, n_chars,
             CAST((((doc_id + 7) * 2654435761) % 4294967296) % 16 AS INT)
               AS shard,
             (((doc_id * 2654435761) % 4294967296)) AS pos_key
      FROM documents
    ),
    ordered AS (
      SELECT shard, doc_id, n_chars,
             CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                     ORDER BY pos_key, doc_id) AS INT)
               AS position
      FROM sharded
    )
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           string_agg(CASE WHEN position <= 3 THEN CAST(doc_id AS VARCHAR) END,
                      ',' ORDER BY position) AS head_docs_csv
    FROM ordered
    GROUP BY shard
    ORDER BY shard
    """,
    doc="deterministic epoch shard assignment (seed=7, 16 shards): shard "
    "from a seed-mixed multiplicative hash, within-shard ORDER from a "
    "second hash — the reproducible global shuffle a training run needs "
    "(same seed -> byte-identical shards and order on any cluster layout, "
    "unlike df.sample/rand). Per-shard doc/char balance plus the first 3 "
    "doc ids as an order fingerprint. One hash shuffle for the balance "
    "aggregate (map-side combined); the head fingerprint is a SEPARATE "
    "rank<=3 branch that Spark plans as WindowGroupLimit — every map "
    "task pre-prunes to its local min-3 per shard before the exchange, "
    "so the fingerprint shuffle carries O(shards x 3 x partitions), "
    "never a corpus-sized per-shard sort (the r10 plan ranked the WHOLE "
    "corpus through 16 window partitions because the position predicate "
    "sat inside a collect_list and could not push down). The two "
    "16-row sides broadcast-join on shard",
)
def training_shard_assignment(spark, sf_dir):
    from newyork_taxi_etl_spark.operators.sampling import hash_bucket

    from pyspark.sql import Window

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    sharded = docs.select(
        "doc_id",
        "n_chars",
        hash_bucket(F.col("doc_id") + F.lit(7), 16).cast("int").alias("shard"),
        hash_bucket(F.col("doc_id"), 4294967296).alias("pos_key"),
    )
    balance = sharded.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    w = Window.partitionBy("shard").orderBy("pos_key", "doc_id")
    heads = (
        sharded.withColumn("position", F.row_number().over(w).cast("int"))
        .filter(F.col("position") <= 3)  # planned as WindowGroupLimit
        .groupBy("shard")
        .agg(
            F.concat_ws(
                ",",
                F.array_sort(
                    F.collect_list(
                        F.struct("position", F.col("doc_id").cast("string"))
                    )
                ).getField("col2"),
            ).alias("head_docs_csv"),
        )
    )
    return (
        balance.join(F.broadcast(heads), "shard")
        .select("shard", "n_docs", "total_chars", "head_docs_csv")
        .orderBy("shard")
    )


@register(
    "label_rebalance_sample",
    """
    WITH counts AS (
      SELECT label, COUNT(*) AS n_before FROM embeddings GROUP BY label
    ),
    target AS (SELECT MIN(n_before) AS n_min FROM counts),
    rates AS (
      SELECT label, n_before,
             CAST(FLOOR(CAST(n_min AS DOUBLE) / n_before * 1000) AS BIGINT)
               AS keep_millage
      FROM counts, target
    )
    SELECT r.label,
           CAST(r.n_before AS BIGINT) AS n_before,
           CAST(SUM(CASE WHEN ((e.vec_id * 2654435761) % 4294967296) % 1000
                              < r.keep_millage
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_after
    FROM embeddings e JOIN rates r USING (label)
    GROUP BY r.label, r.n_before
    ORDER BY r.label
    """,
    doc="class-balanced downsampling: per-label keep rate = "
    "floor(min_class/class * 1000) per-mille, applied through the "
    "deterministic multiplicative-hash bucket (reproducible, shuffle-free, "
    "stable under repartition — same discipline as sample_stratified). "
    "The label-rate dimension is class-cardinality rows, broadcast back "
    "onto the corpus; result shows before/after counts per class. The "
    "imbalance-correction step before training on skewed label "
    "distributions",
)
def label_rebalance_sample(spark, sf_dir):
    from newyork_taxi_etl_spark.operators.sampling import hash_bucket

    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    counts = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_before"))
    target = counts.agg(F.min("n_before").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(target)).select(
        "label",
        "n_before",
        F.floor(
            F.col("n_min").cast("double") / F.col("n_before") * 1000
        ).cast("bigint").alias("keep_millage"),
    )
    return (
        emb.join(F.broadcast(rates), "label")
        .groupBy("label", "n_before")
        .agg(
            F.sum(
                F.when(
                    hash_bucket("vec_id", 1000) < F.col("keep_millage"), 1
                ).otherwise(0)
            ).cast("bigint").alias("n_after")
        )
        .select(
            "label",
            F.col("n_before").cast("bigint").alias("n_before"),
            "n_after",
        )
        .orderBy("label")
    )


@register(
    "corpus_pipeline_end2end",
    """
    WITH gated AS (
      SELECT doc_id, text, lang, n_chars
      FROM documents
      WHERE len(string_split(text, ' ')) >= 30
        AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')) >= 0.2
    ),
    keepers AS (
      SELECT MIN(doc_id) AS doc_id
      FROM gated
      GROUP BY md5(lower(trim(text)))
    ),
    kept AS (
      SELECT g.lang, len(string_split(g.text, ' ')) AS n_tokens
      FROM gated g JOIN keepers k ON g.doc_id = k.doc_id
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(CEIL(CAST(SUM(n_tokens) AS DOUBLE) / 512) AS BIGINT)
             AS n_bins_512
    FROM kept
    GROUP BY lang
    ORDER BY lang
    """,
    doc="end-to-end curation pipeline COMPOSITION: quality gate (the "
    "text_quality_score keep rule) -> exact dedup (md5 content "
    "fingerprint, min-id keeper) -> per-language token budget + 512-token "
    "bin estimate (the token_budget_packing sizing input) — one "
    "DataFrame chain proving the curation operators compose without "
    "materialization between stages. Plan shape: narrow gate (no "
    "shuffle), one fingerprint aggregate, one semi join back, one "
    "lang-keyed aggregate — the whole pipeline is two shuffles and a "
    "broadcast semi join; Catalyst fuses the gate into both scan "
    "branches. What a 100 TB curation run executes nightly, as a single "
    "declarative plan",
)
def corpus_pipeline_end2end(spark, sf_dir):
    from newyork_taxi_etl_spark.operators.dedup import dedup_exact

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    gated = docs.filter((F.size(toks) >= 30) & (ttr >= 0.2))
    keepers = dedup_exact(gated).select(F.col("keeper").alias("doc_id"))
    kept = gated.join(F.broadcast(keepers), "doc_id").select(
        "lang", F.size(toks).alias("n_tokens")
    )
    return (
        kept.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.ceil(F.sum("n_tokens").cast("double") / 512)
            .cast("bigint")
            .alias("n_bins_512"),
        )
        .orderBy("lang")
    )


@register(
    "corpus_pipeline_decontaminated",
    f"""
    WITH corpus AS (
      SELECT * FROM documents WHERE doc_id % 50 <> 0
    ),
    gated AS (
      SELECT doc_id, text, lang
      FROM corpus
      WHERE len(string_split(text, ' ')) >= 30
        AND CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
            / len(string_split(text, ' ')) >= 0.2
    ),
    keepers AS (
      SELECT MIN(doc_id) AS doc_id
      FROM gated GROUP BY md5(lower(trim(text)))
    ),
    surv AS (
      SELECT g.doc_id, g.text, g.lang
      FROM gated g JOIN keepers k ON g.doc_id = k.doc_id
    ),
    bench AS (
      SELECT DISTINCT unnest(list_distinct({_SH})) AS sh
      FROM documents WHERE doc_id % 50 = 0
    ),
    ssh AS (
      SELECT doc_id, unnest(list_distinct({_SH})) AS sh FROM surv
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM ssh GROUP BY 1),
    hit AS (
      SELECT s.doc_id, COUNT(*) AS n_hit
      FROM ssh s JOIN bench USING (sh) GROUP BY 1
    ),
    flagged AS (
      SELECT t.doc_id,
             COALESCE(h.n_hit, 0) / CAST(t.n_shingles AS DOUBLE) >= 0.05
               AS contaminated
      FROM tot t LEFT JOIN hit h USING (doc_id)
    ),
    final AS (
      SELECT s.lang, f.contaminated,
             len(string_split(s.text, ' ')) AS n_tokens
      FROM surv s JOIN flagged f USING (doc_id)
    )
    SELECT lang,
           CAST(SUM(CASE WHEN NOT contaminated THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs,
           CAST(SUM(CASE WHEN NOT contaminated THEN n_tokens ELSE 0 END)
                AS BIGINT) AS total_tokens,
           CAST(CEIL(SUM(CASE WHEN NOT contaminated THEN n_tokens ELSE 0 END)
                     / 512.0) AS BIGINT) AS n_bins_512,
           CAST(SUM(CASE WHEN contaminated THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped_contaminated
    FROM final
    GROUP BY lang
    ORDER BY lang
    """,
    doc="corpus_pipeline_end2end with the DECONTAMINATION GATE composed "
    "in (r7 verdict optional item): quality gate -> exact dedup -> "
    "benchmark-overlap gate (drop survivors whose distinct-3-gram "
    "overlap with the eval slice doc_id%50==0 is >= 5% — the "
    "contamination_ngram_overlap primitive promoted from a report to a "
    "pipeline stage) -> per-language token budget, with the per-lang "
    "dropped count reported beside the kept budget. Plan shape: the "
    "benchmark shingle set stays broadcast (eval suites are small), the "
    "gate adds one broadcast lookup + one doc_id aggregate to the "
    "pipeline — still no corpus-sized shuffle beyond the dedup "
    "fingerprint aggregate. The training-data hygiene loop a 100 TB "
    "nightly run actually needs: what you train on is (clean, unique, "
    "NOT in your eval set).",
)
def corpus_pipeline_decontaminated(spark, sf_dir):
    from newyork_taxi_etl_spark.operators.dedup import dedup_exact

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)

    toks = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    gated = corpus.filter((F.size(toks) >= 30) & (ttr >= 0.2))
    keepers = dedup_exact(gated).select(F.col("keeper").alias("doc_id"))
    surv = gated.join(F.broadcast(keepers), "doc_id")

    overlap = C.ngram_contamination(surv, bench)
    flagged = overlap.select(
        "doc_id",
        (
            F.col("n_hit") / F.col("n_shingles").cast("double") >= F.lit(0.05)
        ).alias("contaminated"),
    )
    final = surv.join(flagged, "doc_id").select(
        "lang", "contaminated", F.size(toks).alias("n_tokens")
    )
    kept_tok = F.sum(
        F.when(~F.col("contaminated"), F.col("n_tokens")).otherwise(F.lit(0))
    )
    return (
        final.groupBy("lang")
        .agg(
            F.sum((~F.col("contaminated")).cast("int"))
            .cast("bigint")
            .alias("n_docs"),
            kept_tok.cast("bigint").alias("total_tokens"),
            F.ceil(kept_tok / F.lit(512.0)).cast("bigint").alias("n_bins_512"),
            F.sum(F.col("contaminated").cast("int"))
            .cast("bigint")
            .alias("n_dropped_contaminated"),
        )
        .orderBy("lang")
    )


@register(
    "weighted_median_doclen",
    """
    WITH counts AS (
      SELECT lang, n_chars,
             COUNT(*) AS c,
             CAST(SUM(n_chars) AS BIGINT) AS wsum
      FROM documents GROUP BY 1, 2
    ),
    tot AS (
      SELECT lang, CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(wsum) AS BIGINT) AS w
      FROM counts GROUP BY lang
    ),
    cum AS (
      SELECT lang, n_chars,
             SUM(c) OVER (PARTITION BY lang ORDER BY n_chars) AS fc,
             SUM(wsum) OVER (PARTITION BY lang ORDER BY n_chars) AS fw
      FROM counts
    ),
    med AS (
      SELECT c.lang, MIN(c.n_chars) AS median_len
      FROM cum c JOIN tot USING (lang)
      WHERE c.fc >= CAST(CEIL(tot.n / 2.0) AS BIGINT)
      GROUP BY c.lang
    ),
    wmed AS (
      SELECT c.lang, MIN(c.n_chars) AS char_weighted_median_len
      FROM cum c JOIN tot USING (lang)
      WHERE c.fw >= CAST(CEIL(tot.w / 2.0) AS BIGINT)
      GROUP BY c.lang
    )
    SELECT tot.lang, tot.n AS n_docs,
           CAST(med.median_len AS BIGINT) AS median_len,
           CAST(wmed.char_weighted_median_len AS BIGINT)
             AS char_weighted_median_len
    FROM tot JOIN med USING (lang) JOIN wmed USING (lang)
    ORDER BY tot.lang
    """,
    doc="GROUPED WEIGHTED MEDIAN (weight = document length): the doc "
    "length below which half the corpus's CHARACTERS sit, next to the "
    "plain count-median — the number a packing/sharding plan actually "
    "needs (long docs carry the bytes: the weighted median is "
    "systematically above the count median, and the gap measures "
    "length skew). Same frequency-reduction selection as the r8 "
    "grouped median — reduce to O(lang x distinct lengths) rows "
    "carrying (count, weight-sum), one cumulative walk selects both "
    "medians; exact integers throughout (integer weights make the "
    "weighted rank walk exact, no float accumulation anywhere).",
)
def weighted_median_doclen(spark, sf_dir):
    from pyspark.sql import Window

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    counts = docs.groupBy("lang", "n_chars").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("n_chars").cast("bigint").alias("wsum"),
    )
    tot = counts.groupBy("lang").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum("wsum").cast("bigint").alias("w"),
    )
    win = (
        Window.partitionBy("lang")
        .orderBy("n_chars")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = counts.select(
        "lang",
        "n_chars",
        F.sum("c").over(win).alias("fc"),
        F.sum("wsum").over(win).alias("fw"),
    ).join(F.broadcast(tot), "lang")
    med = (
        cum.filter(
            F.col("fc") >= F.ceil(F.col("n") / F.lit(2.0)).cast("bigint")
        )
        .groupBy("lang")
        .agg(F.min("n_chars").cast("bigint").alias("median_len"))
    )
    wmed = (
        cum.filter(
            F.col("fw") >= F.ceil(F.col("w") / F.lit(2.0)).cast("bigint")
        )
        .groupBy("lang")
        .agg(
            F.min("n_chars").cast("bigint")
            .alias("char_weighted_median_len")
        )
    )
    return (
        tot.select("lang", F.col("n").alias("n_docs"))
        .join(med, "lang")
        .join(wmed, "lang")
        .orderBy("lang")
    )


@register(
    "passage_chunking_plan",
    """
    WITH d AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n
      FROM documents
    ),
    starts AS (
      SELECT doc_id, lang, n,
             list_distinct(
               list_append(
                 range(1, GREATEST(n - 32 + 1, 1) + 1, 24),
                 CASE WHEN n > 32 AND ((n - 32) % 24) <> 0
                      THEN n - 32 + 1 ELSE 1 END)) AS ss
      FROM d
    ),
    chunks AS (
      SELECT doc_id, lang, n, unnest(ss) AS s FROM starts
    )
    SELECT lang,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs,
           CAST(COUNT(*) AS BIGINT) AS n_chunks,
           ROUND(CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT doc_id), 6)
             AS avg_chunks_per_doc,
           CAST(SUM(LEAST(32, n)) AS BIGINT) AS total_chunk_tokens,
           ROUND(1.0 - CAST((SELECT SUM(n) FROM d d2
                             WHERE d2.lang = chunks.lang) AS DOUBLE)
                 / SUM(LEAST(32, n)), 6) AS dup_token_frac
    FROM chunks
    GROUP BY lang
    ORDER BY lang
    """,
    doc="PASSAGE CHUNKING plan (the RAG/embedding preprocessing step: "
    "fixed 32-token windows, stride 24, RIGHT-ALIGNED full-size tail "
    "when the last stride doesn't land flush — the convention that "
    "never emits a degenerate short tail chunk): per-language chunk "
    "counts, average chunks per doc, total chunk tokens, and the "
    "DUPLICATED-token fraction the 8-token overlap costs (~25-30% "
    "here — the price of overlap stated as a number; storage and "
    "embedding spend scale by exactly this factor). The chunk-start "
    "table is computed in-JVM from token counts (sequence + "
    "conditional tail, one explode); slicing the actual token arrays "
    "is a trivial slice() on top of these starts. Exact integers plus "
    "two final divisions.",
)
def passage_chunking_plan(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    d = docs.select(
        "doc_id", "lang", F.size(F.split(F.col("text"), " ")).alias("n")
    )
    starts = d.withColumn(
        "ss",
        F.array_distinct(
            F.concat(
                F.expr("sequence(1, greatest(n - 32 + 1, 1), 24)"),
                F.array(
                    F.when(
                        (F.col("n") > 32) & (((F.col("n") - 32) % 24) != 0),
                        F.col("n") - 32 + 1,
                    ).otherwise(F.lit(1))
                ),
            )
        ),
    )
    chunks = starts.select(
        "doc_id", "lang", "n", F.explode("ss").alias("s")
    )
    doc_tokens = d.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("lang_doc_tokens")
    )
    return (
        chunks.groupBy("lang")
        .agg(
            F.countDistinct("doc_id").cast("bigint").alias("n_docs"),
            F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
            F.round(
                F.count(F.lit(1)).cast("double") / F.countDistinct("doc_id"),
                6,
            ).alias("avg_chunks_per_doc"),
            F.sum(F.least(F.lit(32), F.col("n"))).cast("bigint")
            .alias("total_chunk_tokens"),
        )
        .join(F.broadcast(doc_tokens), "lang")
        .select(
            "lang",
            "n_docs",
            "n_chunks",
            "avg_chunks_per_doc",
            "total_chunk_tokens",
            F.round(
                1.0
                - F.col("lang_doc_tokens").cast("double")
                / F.col("total_chunk_tokens"),
                6,
            ).alias("dup_token_frac"),
        )
        .orderBy("lang")
    )


def _logreg_train_ctes(
    steps: int = 16, lr: float = 4.0, where: str = "", sfx: str = ""
) -> str:
    """Unrolled DuckDB twin of the logistic-GD training loop, as a CTE
    chain ``feats, it0, p1, g1, it1, ..., it{steps}`` (no WITH, no final
    SELECT) so both the standalone filter and the learned pipeline embed
    the IDENTICAL training.

    One CTE pair per step: ``p{k}`` scores every doc under the previous
    weights (CROSS JOIN against the 1-row weight CTE), ``it{k}`` derives
    the next weights from the decimal-summed gradient.  Arithmetic is
    kept bit-aligned with operators/logreg.py: left-associative linear
    response ROUNDed at 6, sigmoid ROUNDed at 6, per-row gradient terms
    ROUNDed at 12 into DECIMAL(38,12) sums (VARCHAR-routed casts), and a
    raw-double ``w - lr * (g/n)`` update.
    """
    from newyork_taxi_etl_spark.functions.exact import dec_in_sql, dec_out_sql

    toks = "string_split(text, ' ')"
    z = "ROUND(w.w0 + w.w1 * f.x1 + w.w2 * f.x2 + w.w3 * f.x3, 6)"
    p = f"ROUND(1.0 / (1.0 + exp(-{z})), 6)"
    parts = [
        f"""
    feats{sfx} AS MATERIALIZED (
      SELECT (CAST(len({toks}) AS DOUBLE) - 30.0) / 30.0 AS x1,
             (CAST(len(list_distinct({toks})) AS DOUBLE)
               / len({toks}) - 0.2) * 5.0 AS x2,
             CASE WHEN n_chars BETWEEN 100 AND 400
                  THEN 1.0 ELSE 0.0 END AS x3,
             CASE WHEN len({toks}) >= 30
                   AND CAST(len(list_distinct({toks})) AS DOUBLE)
                       / len({toks}) >= 0.2
                  THEN 1.0 ELSE 0.0 END AS y
      FROM documents{where}
    ),
    it{sfx}0 AS MATERIALIZED (SELECT CAST(0.0 AS DOUBLE) AS w0, CAST(0.0 AS DOUBLE) AS w1,
                   CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3)"""
    ]
    for k in range(1, steps + 1):
        g = {
            j: dec_out_sql(f"SUM({dec_in_sql(term)})")
            for j, term in (
                (0, "ROUND(p - y, 12)"),
                (1, "ROUND((p - y) * x1, 12)"),
                (2, "ROUND((p - y) * x2, 12)"),
                (3, "ROUND((p - y) * x3, 12)"),
            )
        }
        parts.append(f"""
    p{sfx}{k} AS (
      SELECT f.x1, f.x2, f.x3, f.y, {p} AS p
      FROM feats{sfx} f CROSS JOIN it{sfx}{k - 1} w
    ),
    g{sfx}{k} AS (
      SELECT {g[0]} AS g0, {g[1]} AS g1, {g[2]} AS g2, {g[3]} AS g3,
             COUNT(*) AS n
      FROM p{sfx}{k}
    ),
    it{sfx}{k} AS MATERIALIZED (
      SELECT w.w0 - {lr} * (g.g0 / g.n) AS w0,
             w.w1 - {lr} * (g.g1 / g.n) AS w1,
             w.w2 - {lr} * (g.g2 / g.n) AS w2,
             w.w3 - {lr} * (g.g3 / g.n) AS w3
      FROM it{sfx}{k - 1} w CROSS JOIN g{sfx}{k} g
    )""")
    return ",".join(parts)


#: the engine-portable scoring expression over a row aliased ``f`` under
#: the 1-row weight CTE aliased ``w`` (shared by every _logreg consumer)
_LOGREG_P = (
    "ROUND(1.0 / (1.0 + exp(-ROUND(w.w0 + w.w1 * f.x1 + w.w2 * f.x2"
    " + w.w3 * f.x3, 6))), 6)"
)


def _logreg_weights_cached(spark, docs, sf_dir: str) -> list[float]:
    """The 16-step full-corpus logistic training (quality_logreg_filter's
    scorer) persisted ONCE per corpus — eight registered queries train
    the IDENTICAL weights (filter, distillation audit, learned pipeline,
    AUC, ECE, curriculum stages, PSI, ccnet agreement) and the streaming
    quality/PSI folds already stage-cache the same build under the same
    key (streaming/windows.run_streaming_quality_ingest), so batch and
    stream now share one artifact.  Weights are raw doubles from the
    deterministic decimal-gradient loop; parquet round-trips them
    bit-exactly, so hit and miss paths are value-identical."""
    import os

    from newyork_taxi_etl_spark.operators.logreg import logistic_gd
    from newyork_taxi_etl_spark.streaming.windows import _stage_cached

    def build(target: str) -> None:
        toks = F.split(F.col("text"), " ")
        ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        feats = docs.select(
            ((F.size(toks) - F.lit(30.0)) / F.lit(30.0)).alias("x1"),
            ((ttr - F.lit(0.2)) * F.lit(5.0)).alias("x2"),
            F.when(F.col("n_chars").between(100, 400), 1.0)
            .otherwise(0.0)
            .alias("x3"),
            F.when((F.size(toks) >= 30) & (ttr >= 0.2), 1.0)
            .otherwise(0.0)
            .alias("y"),
        ).localCheckpoint()
        w = logistic_gd(feats, ["x1", "x2", "x3"], "y", steps=16, lr=4.0)
        from newyork_taxi_etl_spark.localrel import local_rows_df

        local_rows_df(
            spark, [(j, float(wj)) for j, wj in enumerate(w)],
            "j int, w double",
        ).coalesce(1).write.mode("overwrite").parquet(target)

    sdir = _stage_cached(
        None, f"documents_qg:{sf_dir}:logreg_weights", build
    )
    rows = spark.read.parquet(sdir).collect()
    return [r["w"] for r in sorted(rows, key=lambda r: r["j"])]


def _logreg_sql(steps: int = 16, lr: float = 4.0) -> str:
    """Full standalone-filter oracle: train CTEs + summary SELECT."""
    return f"""WITH {_logreg_train_ctes(steps, lr)},
    scored AS (
      SELECT f.y, {_LOGREG_P} AS p
      FROM feats f CROSS JOIN it{steps} w
    )
    SELECT ROUND((SELECT w0 FROM it{steps}), 6) AS w_intercept,
           ROUND((SELECT w1 FROM it{steps}), 6) AS w_len,
           ROUND((SELECT w2 FROM it{steps}), 6) AS w_ttr,
           ROUND((SELECT w3 FROM it{steps}), 6) AS w_sizewin,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(y AS BIGINT)) AS BIGINT) AS n_keep_rule,
           CAST(SUM(CASE WHEN p >= 0.5 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_keep_model,
           CAST(SUM(CASE WHEN (p >= 0.5) = (y = 1.0) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_agree,
           ROUND(CAST(SUM(CASE WHEN (p >= 0.5) = (y = 1.0)
                               THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS agreement
    FROM scored"""


@register(
    "quality_logreg_filter",
    _logreg_sql(steps=16, lr=4.0),
    doc="MODEL-BASED quality filter as dataflow (r8 verdict item 4 — the "
    "fasttext-style learned scorer of LLM curation, here a logistic "
    "regression): per-doc features centered at the rule boundary "
    "((tokens-30)/30, (ttr-0.2)*5, 100-400-char size window) with "
    "teacher labels from the hand-written keep/drop rule of "
    "text_quality_score (tokens >= 30 AND ttr >= 0.2 — learn the rule, "
    "then generalize it), trained by 16 full-batch gradient steps from "
    "w=0 at lr=4. Each step is ONE map-side-combinable decimal "
    "aggregate over the once-checkpointed feature projection producing "
    "d+2 scalars; the weight update is O(d) driver arithmetic (the "
    "gram_power_iteration_pc1 discipline — iterate on the sufficient "
    "statistic, never re-touch the corpus free-form). Output: final "
    "weights, rule-vs-model keep counts and agreement (measured "
    "0.97-0.98 across SFs — an AND-rule is not exactly linearly "
    "separable, so the residual 2-3% ARE the borderline docs, which "
    "the continuous score now ranks while the binary rule cannot). "
    "Oracle: the SAME 16 steps unrolled as SQL CTEs, bit-identical "
    "(6-dp sigmoid, 12-dp decimal gradient sums, raw-double updates). "
    "At 100 TB: 1 + steps + 1 linear passes over a skinny projection, "
    "nothing wider than a d+2-scalar aggregate.",
)
def quality_logreg_filter(spark, sf_dir):
    from newyork_taxi_etl_spark.operators.logreg import (
        logistic_gd,
        logistic_prob,
    )

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    feats = docs.select(
        ((F.size(toks) - F.lit(30.0)) / F.lit(30.0)).alias("x1"),
        ((ttr - F.lit(0.2)) * F.lit(5.0)).alias("x2"),
        F.when(F.col("n_chars").between(100, 400), 1.0)
        .otherwise(0.0)
        .alias("x3"),
        F.when((F.size(toks) >= 30) & (ttr >= 0.2), 1.0)
        .otherwise(0.0)
        .alias("y"),
    ).localCheckpoint()

    w = _logreg_weights_cached(spark, docs, sf_dir)
    keep = logistic_prob(w, ["x1", "x2", "x3"]) >= F.lit(0.5)
    agree = keep == (F.col("y") == F.lit(1.0))
    n = F.count(F.lit(1))
    return feats.agg(
        F.round(F.lit(w[0]), 6).alias("w_intercept"),
        F.round(F.lit(w[1]), 6).alias("w_len"),
        F.round(F.lit(w[2]), 6).alias("w_ttr"),
        F.round(F.lit(w[3]), 6).alias("w_sizewin"),
        n.cast("bigint").alias("n_docs"),
        F.sum(F.col("y").cast("bigint")).cast("bigint").alias("n_keep_rule"),
        F.sum(keep.cast("int")).cast("bigint").alias("n_keep_model"),
        F.sum(agree.cast("int")).cast("bigint").alias("n_agree"),
        F.round(F.sum(agree.cast("int")).cast("double") / n, 6)
        .alias("agreement"),
    )


def _distill_audit_sql() -> str:
    from newyork_taxi_etl_spark.queries.text import _QR_RULES

    allcond = " AND ".join(cond for _, cond in _QR_RULES)
    return f"""WITH {_logreg_train_ctes(16, 4.0)},
    qstats AS (
      SELECT doc_id, n_chars,
             len(string_split(text, ' ')) AS n_tokens,
             CAST(SUM(length(w)) AS DOUBLE)
               / len(string_split(text, ' ')) AS mean_wl,
             MAX(length(w)) AS max_wl,
             CAST(COUNT(DISTINCT w) AS DOUBLE)
               / len(string_split(text, ' ')) AS ttr
      FROM (SELECT doc_id, n_chars, text,
                   unnest(string_split(text, ' ')) AS w
            FROM documents)
      GROUP BY doc_id, n_chars, text
    ),
    flags AS (
      SELECT doc_id,
             CASE WHEN {allcond} THEN 1 ELSE 0 END AS funnel_keep
      FROM qstats
    ),
    scored AS (
      SELECT f.doc_id,
             CASE WHEN {_LOGREG_P} >= 0.5 THEN 1 ELSE 0 END AS model_keep
      FROM (
        SELECT doc_id,
               (CAST(len(string_split(text, ' ')) AS DOUBLE) - 30.0)
                 / 30.0 AS x1,
               (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) - 0.2) * 5.0 AS x2,
               CASE WHEN n_chars BETWEEN 100 AND 400
                    THEN 1.0 ELSE 0.0 END AS x3
        FROM documents
      ) f CROSS JOIN it16 w
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents)
    SELECT CAST(s.model_keep AS INT) AS model_keep,
           CAST(f.funnel_keep AS INT) AS funnel_keep,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(COUNT(*) / CAST(tot.n AS DOUBLE), 6) AS cell_share
    FROM scored s JOIN flags f USING (doc_id), tot
    GROUP BY s.model_keep, f.funnel_keep, tot.n
    ORDER BY model_keep DESC, funnel_keep DESC"""


@register(
    "quality_distillation_audit",
    _distill_audit_sql(),
    doc="QUALITY-CLASSIFIER DISTILLATION AUDIT (r13 verdict item 8 — "
    "'did the learned filter learn the rules'): the 16-step logistic "
    "scorer (quality_logreg_filter's training, shared CTE chain so "
    "the oracles cannot drift) is confronted with the FULL 5-rule "
    "composite gate of quality_rule_funnel — a STRICTER rule set than "
    "its 2-rule teacher — as a keep/drop confusion table: one row per "
    "(model_keep, funnel_keep) cell with count and corpus share.  The "
    "off-diagonal cells are the actionable ledger: (1, 0) = docs the "
    "model ships that the production funnel would kill (teacher gap + "
    "linear-boundary residual), (0, 1) = funnel-clean docs the model "
    "rejects (lost yield).  Scale: the model side is 1 + 16 + 1 "
    "skinny-projection passes (d+2-scalar aggregates), the funnel "
    "side one token-explode aggregate; the confusion is a 4-group "
    "count over a doc_id join — nothing wider than the corpus scan.  "
    "Planted-disagreement pytest: tests/test_round14_ops.py plants "
    "teacher-passing docs with a 19-char word (funnel max_word_len "
    "kill) and asserts they land in exactly the (1, 0) cell.",
)
def quality_distillation_audit(spark, sf_dir):
    from newyork_taxi_etl_spark.operators.logreg import (
        logistic_gd,
        logistic_prob,
    )
    from newyork_taxi_etl_spark.queries.text import _QR_RULES, _qr_stats

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    feats = docs.select(
        "doc_id",
        ((F.size(toks) - F.lit(30.0)) / F.lit(30.0)).alias("x1"),
        ((ttr - F.lit(0.2)) * F.lit(5.0)).alias("x2"),
        F.when(F.col("n_chars").between(100, 400), 1.0)
        .otherwise(0.0)
        .alias("x3"),
        F.when((F.size(toks) >= 30) & (ttr >= 0.2), 1.0)
        .otherwise(0.0)
        .alias("y"),
    ).localCheckpoint()
    w = _logreg_weights_cached(spark, docs, sf_dir)
    scored = feats.select(
        "doc_id",
        (logistic_prob(w, ["x1", "x2", "x3"]) >= F.lit(0.5))
        .cast("int")
        .alias("model_keep"),
    )
    allcond = " AND ".join(cond for _, cond in _QR_RULES)
    flags = _qr_stats(docs).select(
        "doc_id",
        F.expr(f"CASE WHEN {allcond} THEN 1 ELSE 0 END")
        .cast("int")
        .alias("funnel_keep"),
    )
    tot = docs.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return (
        scored.join(flags, "doc_id")
        .groupBy("model_keep", "funnel_keep")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "model_keep",
            "funnel_keep",
            "n_docs",
            F.round(F.col("n_docs").cast("double") / F.col("n"), 6).alias(
                "cell_share"
            ),
        )
        .orderBy(F.col("model_keep").desc(), F.col("funnel_keep").desc())
    )


_LEARNED_PIPE_SQL = f"""WITH {_logreg_train_ctes(16, 4.0)},
    scored_docs AS (
      SELECT f.doc_id, f.text, f.lang, {_LOGREG_P} AS p
      FROM (
        SELECT doc_id, text, lang,
               (CAST(len(string_split(text, ' ')) AS DOUBLE) - 30.0)
                 / 30.0 AS x1,
               (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) - 0.2) * 5.0 AS x2,
               CASE WHEN n_chars BETWEEN 100 AND 400
                    THEN 1.0 ELSE 0.0 END AS x3
        FROM documents WHERE doc_id % 50 <> 0
      ) f CROSS JOIN it16 w
    ),
    gated AS (
      SELECT doc_id, text, lang FROM scored_docs WHERE p >= 0.5
    ),
    qdrop AS (
      SELECT lang, CAST(SUM(CASE WHEN p < 0.5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped_quality
      FROM scored_docs GROUP BY lang
    ),
    keepers AS (
      SELECT MIN(doc_id) AS doc_id
      FROM gated GROUP BY md5(lower(trim(text)))
    ),
    surv AS (
      SELECT g.doc_id, g.text, g.lang
      FROM gated g JOIN keepers k ON g.doc_id = k.doc_id
    ),
    bench AS (
      SELECT DISTINCT unnest(list_distinct({_SH})) AS sh
      FROM documents WHERE doc_id % 50 = 0
    ),
    ssh AS (
      SELECT doc_id, unnest(list_distinct({_SH})) AS sh FROM surv
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_shingles FROM ssh GROUP BY 1),
    hit AS (
      SELECT s.doc_id, COUNT(*) AS n_hit
      FROM ssh s JOIN bench USING (sh) GROUP BY 1
    ),
    flagged AS (
      SELECT t.doc_id,
             COALESCE(h.n_hit, 0) / CAST(t.n_shingles AS DOUBLE) >= 0.05
               AS contaminated
      FROM tot t LEFT JOIN hit h USING (doc_id)
    ),
    final AS (
      SELECT s.lang, f.contaminated,
             len(string_split(s.text, ' ')) AS n_tokens
      FROM surv s JOIN flagged f USING (doc_id)
    )
    SELECT final.lang,
           CAST(SUM(CASE WHEN NOT contaminated THEN 1 ELSE 0 END) AS BIGINT)
             AS n_docs,
           CAST(SUM(CASE WHEN NOT contaminated THEN n_tokens ELSE 0 END)
                AS BIGINT) AS total_tokens,
           CAST(CEIL(SUM(CASE WHEN NOT contaminated THEN n_tokens ELSE 0 END)
                     / 512.0) AS BIGINT) AS n_bins_512,
           CAST(SUM(CASE WHEN contaminated THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped_contaminated,
           ANY_VALUE(q.n_dropped_quality) AS n_dropped_quality
    FROM final JOIN qdrop q ON final.lang = q.lang
    GROUP BY final.lang
    ORDER BY final.lang"""


@register(
    "corpus_pipeline_learned",
    _LEARNED_PIPE_SQL,
    doc="corpus_pipeline_decontaminated with the LEARNED quality gate "
    "composed in (the r8 verdict's stated endpoint for item 4): the "
    "logistic scorer of quality_logreg_filter — IDENTICAL training, 16 "
    "decimal-sufficient-statistic gradient steps over the full corpus, "
    "shared CTE chain so the two oracles cannot drift — replaces the "
    "hand-written keep/drop rule as stage 1; then exact dedup, "
    "benchmark decontamination (5% distinct-3-gram overlap with the "
    "doc_id%50==0 eval slice), and the per-language token budget, with "
    "BOTH drop ledgers reported (n_dropped_quality from the model "
    "gate, n_dropped_contaminated from the overlap gate; a language "
    "whose EVERY doc failed the gate would leave the report with its "
    "ledger — an inner-join edge both engines share, unreachable at "
    "any real keep rate). The learned "
    "gate keeps ~79% of docs where the rule keeps ~79% too but they "
    "disagree on the borderline 2-3% — the pipeline output measures "
    "what that disagreement costs downstream in tokens. Scale shape "
    "unchanged from the rule-based pipeline plus 16 O(d)-state "
    "training aggregates over the checkpointed feature projection.",
)
def corpus_pipeline_learned(spark, sf_dir):
    from newyork_taxi_etl_spark.operators.dedup import dedup_exact
    from newyork_taxi_etl_spark.operators.logreg import (
        logistic_gd,
        logistic_prob,
    )

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    x1 = ((F.size(toks) - F.lit(30.0)) / F.lit(30.0)).alias("x1")
    x2 = ((ttr - F.lit(0.2)) * F.lit(5.0)).alias("x2")
    x3 = (
        F.when(F.col("n_chars").between(100, 400), 1.0)
        .otherwise(0.0)
        .alias("x3")
    )
    # training feats live inside the cached build; x1/x2/x3 still score
    # the corpus below
    w = _logreg_weights_cached(spark, docs, sf_dir)

    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    # logistic_prob references x1..x3 as columns: attach them first
    scored = (
        corpus.select("doc_id", "text", "lang", x1, x2, x3)
        .withColumn("p", logistic_prob(w, ["x1", "x2", "x3"]))
        .localCheckpoint(eager=True)  # gate + per-lang drop ledger
    )
    gated = scored.filter(F.col("p") >= 0.5).select("doc_id", "text", "lang")
    qdrop = scored.groupBy("lang").agg(
        F.sum((F.col("p") < 0.5).cast("int"))
        .cast("bigint")
        .alias("n_dropped_quality")
    )
    keepers = dedup_exact(gated).select(F.col("keeper").alias("doc_id"))
    surv = gated.join(F.broadcast(keepers), "doc_id")

    overlap = C.ngram_contamination(surv, bench)
    flagged = overlap.select(
        "doc_id",
        (
            F.col("n_hit") / F.col("n_shingles").cast("double") >= F.lit(0.05)
        ).alias("contaminated"),
    )
    final = surv.join(flagged, "doc_id").select(
        "lang", "contaminated", F.size(toks).alias("n_tokens")
    )
    kept_tok = F.sum(
        F.when(~F.col("contaminated"), F.col("n_tokens")).otherwise(F.lit(0))
    )
    return (
        final.groupBy("lang")
        .agg(
            F.sum((~F.col("contaminated")).cast("int"))
            .cast("bigint")
            .alias("n_docs"),
            kept_tok.cast("bigint").alias("total_tokens"),
            F.ceil(kept_tok / F.lit(512.0)).cast("bigint").alias("n_bins_512"),
            F.sum(F.col("contaminated").cast("int"))
            .cast("bigint")
            .alias("n_dropped_contaminated"),
        )
        .join(qdrop, "lang")
        .orderBy("lang")
    )


@register(
    "boilerplate_segment_strip",
    """
    WITH d AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ),
    tok AS (
      SELECT doc_id, lang, t.i AS pos, toks[t.i] AS tok,
             CASE WHEN ('0x' || substr(md5(toks[t.i]), 1, 4))::BIGINT
                       % 8 = 0
                  THEN 1 ELSE 0 END AS b
      FROM d, unnest(range(1, len(toks) + 1)) t(i)
    ),
    seg AS (
      SELECT doc_id, lang, pos, tok,
             SUM(b) OVER (PARTITION BY doc_id ORDER BY pos
                          ROWS UNBOUNDED PRECEDING) AS sid
      FROM tok
    ),
    segs AS MATERIALIZED (
      SELECT doc_id, ANY_VALUE(lang) AS lang, sid, COUNT(*) AS ntok,
             string_agg(tok, ' ' ORDER BY pos) AS ctext
      FROM seg GROUP BY doc_id, sid
      HAVING COUNT(*) >= 5
    ),
    boiler AS (
      SELECT ctext FROM segs
      GROUP BY ctext HAVING COUNT(DISTINCT doc_id) >= 3
    ),
    hits AS (
      SELECT s.lang, s.doc_id, s.ntok
      FROM segs s JOIN boiler b ON s.ctext = b.ctext
    ),
    tot AS (
      SELECT lang, CAST(SUM(len(toks)) AS BIGINT) AS total_tokens
      FROM d GROUP BY lang
    ),
    bylang AS (
      SELECT lang,
             CAST(COUNT(*) AS BIGINT) AS n_instances,
             CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS docs_affected,
             CAST(SUM(ntok) AS BIGINT) AS tokens_removed
      FROM hits GROUP BY lang
    )
    SELECT t.lang,
           COALESCE(b.n_instances, 0) AS n_instances,
           COALESCE(b.docs_affected, 0) AS docs_affected,
           COALESCE(b.tokens_removed, 0) AS tokens_removed,
           t.total_tokens,
           ROUND(CAST(COALESCE(b.tokens_removed, 0) AS DOUBLE)
                 / t.total_tokens, 6) AS frac_removed
    FROM tot t LEFT JOIN bylang b ON t.lang = b.lang
    ORDER BY t.lang
    """,
    doc="BOILERPLATE SEGMENT STRIPPING — the actionable sibling of "
    "dedup_passage_lsh (finding repeated sections is half the job; "
    "CCNet/RefinedWeb pipelines REMOVE them): the same content-defined "
    "segmentation (md5 % 8 boundaries, >= 5-token segments — shared "
    "operators.dedup.cdc_segments core so the two cannot drift), then "
    "any segment TEXT appearing verbatim in >= 3 distinct documents is "
    "declared boilerplate and every instance is stripped; per language "
    "the instance/doc counts, tokens removed, and the removed fraction "
    "of ALL corpus tokens (the storage + compute the strip saves, "
    "stated as a number — ~2-3% on this corpus from its genuinely "
    "repeated long spans). Dataflow: per-doc segmentation windows, one "
    "segment-text aggregate for the df gate (map-side combinable; the "
    "boilerplate set is tiny and broadcasts back), O(langs) rollups.",
)
def boilerplate_segment_strip(spark, sf_dir):
    from newyork_taxi_etl_spark.operators.dedup import cdc_segments

    docs = spread(spark.read.parquet(table_path(sf_dir, "documents")))
    segs = (
        cdc_segments(docs, boundary_mod=8, min_tokens=5)
        .join(F.broadcast(docs.select("doc_id", "lang")), "doc_id")
        .localCheckpoint(eager=True)  # df gate + hit join
    )
    boiler = (
        segs.groupBy("ctext")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 3)
        .select("ctext")
    )
    hits = segs.join(F.broadcast(boiler), "ctext")
    tot = docs.groupBy("lang").agg(
        F.sum(F.size(F.split(F.col("text"), " ")))
        .cast("bigint")
        .alias("total_tokens")
    )
    bylang = hits.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_instances"),
        F.countDistinct("doc_id").cast("bigint").alias("docs_affected"),
        F.sum("ntok").cast("bigint").alias("tokens_removed"),
    )
    return (
        tot.join(bylang, "lang", "left")
        .select(
            "lang",
            F.coalesce("n_instances", F.lit(0)).alias("n_instances"),
            F.coalesce("docs_affected", F.lit(0)).alias("docs_affected"),
            F.coalesce("tokens_removed", F.lit(0)).alias("tokens_removed"),
            "total_tokens",
            F.round(
                F.coalesce("tokens_removed", F.lit(0)).cast("double")
                / F.col("total_tokens"),
                6,
            ).alias("frac_removed"),
        )
        .orderBy("lang")
    )


@register(
    "streaming_quality_ingest",
    f"""WITH {_logreg_train_ctes(16, 4.0)},
    scored AS (
      SELECT f.lang, CASE WHEN {_LOGREG_P} >= 0.5 THEN 1 ELSE 0 END AS keep
      FROM (
        SELECT lang,
               (CAST(len(string_split(text, ' ')) AS DOUBLE) - 30.0)
                 / 30.0 AS x1,
               (CAST(len(list_distinct(string_split(text, ' ')))
                     AS DOUBLE)
                 / len(string_split(text, ' ')) - 0.2) * 5.0 AS x2,
               CASE WHEN n_chars BETWEEN 100 AND 400
                    THEN 1.0 ELSE 0.0 END AS x3
        FROM documents
      ) f CROSS JOIN it16 w
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(keep) AS BIGINT) AS n_keep,
           ROUND(CAST(SUM(keep) AS DOUBLE) / COUNT(*), 6) AS keep_frac
    FROM scored
    GROUP BY lang
    ORDER BY lang""",
    doc="QUALITY GATING AT INGEST with persisted learned weights — the "
    "third build-once/apply-per-batch composition (after the persisted "
    "ANN index and the linkage index; the pattern, not the artifact, "
    "is the point): the logistic quality scorer is trained ONCE "
    "(identical 16-step decimal-sufficient-statistic chain as "
    "quality_logreg_filter, shared CTEs) and its 4 weights persisted "
    "as a table; documents then stream in micro-batches and each batch "
    "is scored by the weights READ BACK from the table and appended "
    "under the applied-batch replay guard. Per-language keep rates "
    "out. Batching-invariant by construction (each doc's score depends "
    "only on the persisted weights), so the batch-scored oracle covers "
    "every possible batching; per batch nothing moves but a 4-row "
    "broadcast and the batch's own rows.",
)
def streaming_quality_ingest(spark, sf_dir):
    import atexit
    import shutil
    import tempfile

    from newyork_taxi_etl_spark.streaming import windows as W

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    work = tempfile.mkdtemp(prefix="nyetl_qingest_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    # shares the ":logreg_weights" sub-key with the PSI monitor —
    # identical training, one cached scorer build
    return W.run_streaming_quality_ingest(
        spark, docs, work, cache_key=f"documents_qg:{sf_dir}"
    )


_AUC_SQL = f"""WITH {_logreg_train_ctes(16, 4.0)},
    scored AS (
      SELECT f.y, {_LOGREG_P} AS p
      FROM feats f CROSS JOIN it16 w
    ),
    by_p AS (
      SELECT p,
             CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS pos,
             CAST(SUM(CASE WHEN y = 1.0 THEN 0 ELSE 1 END) AS BIGINT) AS neg
      FROM scored GROUP BY p
    ),
    cum AS (
      SELECT pos, neg,
             COALESCE(SUM(neg) OVER (ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cnb
      FROM by_p
    )
    SELECT CAST(SUM(pos) AS BIGINT) AS n_pos,
           CAST(SUM(neg) AS BIGINT) AS n_neg,
           CAST(COUNT(*) AS BIGINT) AS n_distinct_scores,
           ROUND(CAST(CAST(SUM(pos * (2 * cnb + neg)) AS VARCHAR) AS DOUBLE)
                 / (2.0 * SUM(pos) * SUM(neg)), 6) AS auc
    FROM cum"""


@register(
    "quality_auc_rank",
    _AUC_SQL,
    doc="Distributed rank-based AUC (Mann-Whitney U) of the learned "
    "logistic quality score against its teacher rule labels — the "
    "serving-team metric for a ranking filter (agreement at one "
    "threshold, which quality_logreg_filter reports, hides ranking "
    "quality; AUC integrates over all thresholds). Scale shape: the "
    "corpus reduces FIRST via groupBy(p) to per-distinct-score "
    "(pos, neg) counts (map-side combinable; the 6-dp score has at "
    "most 1e6+1 distinct values, so the subsequent unpartitioned "
    "cumulative window runs on a bounded table regardless of corpus "
    "size — never a global rank over rows). Tie handling is the exact "
    "midrank formula: AUC = sum_s pos_s*(2*cum_neg_below_s + neg_s) / "
    "(2*P*N), all-integer numerator carried as DECIMAL(38,0) so the "
    "result is order-independent and engine-exact.",
)
def quality_auc_rank(spark, sf_dir):
    from pyspark.sql import Window

    from newyork_taxi_etl_spark.operators.logreg import (
        logistic_gd,
        logistic_prob,
    )

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    feats = docs.select(
        ((F.size(toks) - F.lit(30.0)) / F.lit(30.0)).alias("x1"),
        ((ttr - F.lit(0.2)) * F.lit(5.0)).alias("x2"),
        F.when(F.col("n_chars").between(100, 400), 1.0)
        .otherwise(0.0)
        .alias("x3"),
        F.when((F.size(toks) >= 30) & (ttr >= 0.2), 1.0)
        .otherwise(0.0)
        .alias("y"),
    ).localCheckpoint()
    w = _logreg_weights_cached(spark, docs, sf_dir)

    by_p = (
        feats.select(
            logistic_prob(w, ["x1", "x2", "x3"]).alias("p"), "y"
        )
        .groupBy("p")
        .agg(
            F.sum((F.col("y") == 1.0).cast("bigint")).alias("pos"),
            F.sum((F.col("y") != 1.0).cast("bigint")).alias("neg"),
        )
    )
    win = Window.orderBy("p").rowsBetween(Window.unboundedPreceding, -1)
    cum = by_p.select(
        "pos",
        "neg",
        F.coalesce(F.sum("neg").over(win), F.lit(0)).alias("cnb"),
    )
    return cum.agg(
        F.sum("pos").cast("bigint").alias("n_pos"),
        F.sum("neg").cast("bigint").alias("n_neg"),
        F.count(F.lit(1)).cast("bigint").alias("n_distinct_scores"),
        F.round(
            F.sum(
                (F.col("pos") * (2 * F.col("cnb") + F.col("neg"))).cast(
                    "decimal(38,0)"
                )
            ).cast("double")
            / (2.0 * F.sum("pos") * F.sum("neg")),
            6,
        ).alias("auc"),
    )


_CALIB_SQL = f"""WITH {_logreg_train_ctes(16, 4.0)},
    scored AS (
      SELECT f.y, {_LOGREG_P} AS p
      FROM feats f CROSS JOIN it16 w
    ),
    binned AS (
      SELECT LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS bin,
             CAST(ROUND(p * 1000000) AS BIGINT) AS p_ticks,
             CASE WHEN y = 1.0 THEN 1 ELSE 0 END AS pos
      FROM scored
    ),
    bins AS (
      SELECT bin,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             ROUND(CAST(SUM(p_ticks) AS DOUBLE) / (1000000.0 * COUNT(*)), 6)
               AS mean_p,
             ROUND(CAST(SUM(pos) AS DOUBLE) / COUNT(*), 6) AS frac_pos
      FROM binned GROUP BY bin
    ),
    gaps AS (
      SELECT bin, n_docs, mean_p, frac_pos,
             ROUND(ABS(mean_p - frac_pos), 6) AS gap,
             CAST(ROUND(ABS(mean_p - frac_pos) * 1000000) AS BIGINT)
               AS gap_ticks
      FROM bins
    )
    SELECT bin, n_docs, mean_p, frac_pos, gap,
           ROUND(CAST(SUM(n_docs * gap_ticks) OVER () AS DOUBLE)
                 / (1000000.0 * SUM(n_docs) OVER ()), 6) AS ece
    FROM gaps
    ORDER BY bin"""


@register(
    "quality_calibration_ece",
    _CALIB_SQL,
    doc="Reliability diagram + expected calibration error (ECE) for the "
    "learned quality scorer: fixed-width deciles of the predicted "
    "probability, per-bin mean prediction vs empirical positive rate, "
    "and the n-weighted mean absolute gap. A filter whose scores feed "
    "downstream sampling temperatures must be calibrated, not just "
    "discriminative (AUC is invariant to any monotone miscalibration). "
    "Engine-exactness: the 6-dp score becomes integer ticks BEFORE any "
    "cross-row sum (the round-8 discipline), per-bin gaps are computed "
    "from the already-rounded columns, and the ECE numerator is an "
    "integer sum over the 10 bin rows — no float accumulation "
    "anywhere. Scale: one map-side-combinable groupBy(bin) pass; the "
    "window runs over 10 rows.",
)
def quality_calibration_ece(spark, sf_dir):
    from pyspark.sql import Window

    from newyork_taxi_etl_spark.operators.logreg import (
        logistic_gd,
        logistic_prob,
    )

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    feats = docs.select(
        ((F.size(toks) - F.lit(30.0)) / F.lit(30.0)).alias("x1"),
        ((ttr - F.lit(0.2)) * F.lit(5.0)).alias("x2"),
        F.when(F.col("n_chars").between(100, 400), 1.0)
        .otherwise(0.0)
        .alias("x3"),
        F.when((F.size(toks) >= 30) & (ttr >= 0.2), 1.0)
        .otherwise(0.0)
        .alias("y"),
    ).localCheckpoint()
    w = _logreg_weights_cached(spark, docs, sf_dir)
    p = logistic_prob(w, ["x1", "x2", "x3"])

    binned = feats.select(
        F.least(F.floor(p * 10).cast("int"), F.lit(9)).alias("bin"),
        F.round(p * 1000000).cast("bigint").alias("p_ticks"),
        (F.col("y") == 1.0).cast("int").alias("pos"),
    )
    bins = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(
            F.sum("p_ticks").cast("double")
            / (F.lit(1000000.0) * F.count(F.lit(1))),
            6,
        ).alias("mean_p"),
        F.round(F.sum("pos").cast("double") / F.count(F.lit(1)), 6).alias(
            "frac_pos"
        ),
    )
    gaps = bins.select(
        "bin",
        "n_docs",
        "mean_p",
        "frac_pos",
        F.round(F.abs(F.col("mean_p") - F.col("frac_pos")), 6).alias("gap"),
        F.round(F.abs(F.col("mean_p") - F.col("frac_pos")) * 1000000)
        .cast("bigint")
        .alias("gap_ticks"),
    )
    win = Window.partitionBy()
    return gaps.select(
        "bin",
        "n_docs",
        "mean_p",
        "frac_pos",
        "gap",
        F.round(
            F.sum(F.col("n_docs") * F.col("gap_ticks")).over(win).cast(
                "double"
            )
            / (F.lit(1000000.0) * F.sum("n_docs").over(win)),
            6,
        ).alias("ece"),
    ).orderBy("bin")


_CURR_SQL = f"""WITH {_logreg_train_ctes(16, 4.0)},
    scored AS (
      SELECT f.doc_id, f.n_tokens, f.y, {_LOGREG_P} AS p
      FROM (
        SELECT doc_id,
               len(string_split(text, ' ')) AS n_tokens,
               (CAST(len(string_split(text, ' ')) AS DOUBLE) - 30.0)
                 / 30.0 AS x1,
               (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) - 0.2) * 5.0 AS x2,
               CASE WHEN n_chars BETWEEN 100 AND 400
                    THEN 1.0 ELSE 0.0 END AS x3,
               CASE WHEN len(string_split(text, ' ')) >= 30
                     AND CAST(len(list_distinct(string_split(text, ' ')))
                              AS DOUBLE) / len(string_split(text, ' ')) >= 0.2
                    THEN 1.0 ELSE 0.0 END AS y
        FROM documents
      ) f CROSS JOIN it16 w
    ),
    staged AS (
      SELECT CAST(NTILE(4) OVER (ORDER BY p DESC, doc_id) AS INT) AS stage,
             CAST(ROUND(p * 1000000) AS BIGINT) AS p_ticks,
             n_tokens, y, p
      FROM scored
    )
    SELECT stage,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(p_ticks) AS DOUBLE) / (1000000.0 * COUNT(*)), 6)
             AS mean_p,
           MAX(p) AS max_p,
           MIN(p) AS min_p,
           ROUND(CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*), 6)
             AS mean_tokens,
           ROUND(CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS keep_frac
    FROM staged
    GROUP BY stage
    ORDER BY stage"""


@register(
    "curriculum_quality_stages",
    _CURR_SQL,
    doc="Quality-curriculum schedule: every document scored by the "
    "trained logistic quality model, totally ordered by (score DESC, "
    "doc_id) — deterministic, no rand() — and cut into 4 equal-count "
    "curriculum stages (highest-quality quartile trains first), with "
    "per-stage count, mean/min/max score, mean length, and the "
    "teacher-rule keep fraction as the stage-quality audit. Scale "
    "shape: NTILE(4) is reproduced BIT-EXACTLY without the global "
    "window — ordered_positions (the exact_quantile range-partition "
    "+ per-partition-offset fold) gives each row its 1-based global "
    "position from one ranged shuffle, and the stage is the "
    "all-integer NTILE size formula (first n%4 tiles get "
    "n/4+1 rows) against the broadcast 1-row corpus count — no row "
    "ever funnels through a single task, the only unpartitioned "
    "window runs over ≤ #partitions offset rows (plan-tested). "
    "Score ticks are summed as integers (order-independent); "
    "min/max compare exact 6-dp doubles.",
)
def curriculum_quality_stages(spark, sf_dir):
    from newyork_taxi_etl_spark.operators.logreg import (
        logistic_gd,
        logistic_prob,
    )
    from newyork_taxi_etl_spark.operators.profile import ordered_positions

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    feats = docs.select(
        "doc_id",
        F.size(toks).alias("n_tokens"),
        ((F.size(toks) - F.lit(30.0)) / F.lit(30.0)).alias("x1"),
        ((ttr - F.lit(0.2)) * F.lit(5.0)).alias("x2"),
        F.when(F.col("n_chars").between(100, 400), 1.0)
        .otherwise(0.0)
        .alias("x3"),
        F.when((F.size(toks) >= 30) & (ttr >= 0.2), 1.0)
        .otherwise(0.0)
        .alias("y"),
    ).localCheckpoint()
    w = _logreg_weights_cached(spark, docs, sf_dir)

    scored = feats.select(
        "doc_id",
        "n_tokens",
        "y",
        logistic_prob(w, ["x1", "x2", "x3"]).alias("p"),
    )
    pos = ordered_positions(scored, [("p", False), ("doc_id", True)])
    n_df = feats.agg(F.count(F.lit(1)).alias("n_all"))
    # NTILE(4) closed form on the 1-based global position: base = n/4,
    # rem = n%4; tiles 1..rem hold base+1 rows, the rest base.  All-integer
    # (DIV), so the stage is engine-exact at any n, including n < 4 (rem=n,
    # base=0: every row lands in the first branch with tile size 1).
    stage = F.expr(
        "CAST(CASE WHEN gpos <= (n_all % 4) * (n_all DIV 4 + 1) "
        "THEN (gpos + (n_all DIV 4)) DIV (n_all DIV 4 + 1) "
        "ELSE (n_all % 4) + (gpos - (n_all % 4) * (n_all DIV 4 + 1) "
        "+ (n_all DIV 4) - 1) DIV (n_all DIV 4) END AS INT)"
    )
    staged = pos.crossJoin(F.broadcast(n_df)).select(
        stage.alias("stage"),
        F.round(F.col("p") * 1000000).cast("bigint").alias("p_ticks"),
        "n_tokens",
        "y",
        "p",
    )
    n = F.count(F.lit(1))
    return (
        staged.groupBy("stage")
        .agg(
            n.cast("bigint").alias("n_docs"),
            F.round(
                F.sum("p_ticks").cast("double") / (F.lit(1000000.0) * n), 6
            ).alias("mean_p"),
            F.max("p").alias("max_p"),
            F.min("p").alias("min_p"),
            F.round(F.sum("n_tokens").cast("double") / n, 6).alias(
                "mean_tokens"
            ),
            F.round(
                F.sum((F.col("y") == 1.0).cast("int")).cast("double") / n, 6
            ).alias("keep_frac"),
        )
        .orderBy("stage")
    )


_CURVE_STEPS = (1, 2, 4, 8, 16)

_CURVE_ACC = " UNION ALL ".join(
    f"""SELECT {k} AS step,
        ROUND(CAST(SUM(CASE WHEN NOT f.is_val
                             AND (({_LOGREG_P}) >= 0.5) = (f.y = 1.0)
                            THEN 1 ELSE 0 END) AS DOUBLE)
              / SUM(CASE WHEN NOT f.is_val THEN 1 ELSE 0 END), 6)
          AS train_acc,
        ROUND(CAST(SUM(CASE WHEN f.is_val
                             AND (({_LOGREG_P}) >= 0.5) = (f.y = 1.0)
                            THEN 1 ELSE 0 END) AS DOUBLE)
              / SUM(CASE WHEN f.is_val THEN 1 ELSE 0 END), 6) AS val_acc
    FROM allfeats f CROSS JOIN it{k} w"""
    for k in _CURVE_STEPS
)

_CURVE_SQL = f"""WITH {_logreg_train_ctes(16, 4.0, " WHERE doc_id % 5 <> 0")},
    allfeats AS MATERIALIZED (
      SELECT doc_id % 5 = 0 AS is_val,
             (CAST(len(string_split(text, ' ')) AS DOUBLE) - 30.0)
               / 30.0 AS x1,
             (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) - 0.2) * 5.0 AS x2,
             CASE WHEN n_chars BETWEEN 100 AND 400
                  THEN 1.0 ELSE 0.0 END AS x3,
             CASE WHEN len(string_split(text, ' ')) >= 30
                   AND CAST(len(list_distinct(string_split(text, ' ')))
                            AS DOUBLE) / len(string_split(text, ' ')) >= 0.2
                  THEN 1.0 ELSE 0.0 END AS y
      FROM documents
    ),
    curve AS ({_CURVE_ACC})
    SELECT step, train_acc, val_acc,
           ROUND(train_acc - val_acc, 6) AS overfit_gap
    FROM curve ORDER BY step"""


@register(
    "logreg_learning_curve",
    _CURVE_SQL,
    doc="Train/validation learning curve for the logistic quality "
    "scorer — overfitting MEASURED as dataflow: the model trains only "
    "on the 80% hash split (doc_id % 5 <> 0; every other quality "
    "query trains on the full corpus), and accuracy against the "
    "teacher rule is evaluated at steps 1/2/4/8/16 on train AND the "
    "held-out 20%, with the per-step train-minus-val gap as the "
    "overfitting number (a 3-parameter linear model on 10k+ docs "
    "should show ~zero gap — a nonzero trend here means the feature "
    "pipeline leaked or the split broke). Cost shape: the training "
    "loop is unchanged (one d+2-scalar decimal aggregate per step — "
    "intermediate weights are free observables of the same loop, "
    "trajectory=True); the 10 accuracy numbers come from ONE extra "
    "pass over the feature projection (all 5 weight vectors are "
    "driver-side constants folded into a single aggregate). Oracle "
    "unrolls the identical training on the identical WHERE-filtered "
    "CTE chain and reads accuracies from the same it_k tables.",
)
def logreg_learning_curve(spark, sf_dir):
    from newyork_taxi_etl_spark.operators.logreg import (
        logistic_gd,
        logistic_prob,
    )

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    allfeats = docs.select(
        (F.col("doc_id") % 5 == 0).alias("is_val"),
        ((F.size(toks) - F.lit(30.0)) / F.lit(30.0)).alias("x1"),
        ((ttr - F.lit(0.2)) * F.lit(5.0)).alias("x2"),
        F.when(F.col("n_chars").between(100, 400), 1.0)
        .otherwise(0.0)
        .alias("x3"),
        F.when((F.size(toks) >= 30) & (ttr >= 0.2), 1.0)
        .otherwise(0.0)
        .alias("y"),
    ).localCheckpoint()
    traj = logistic_gd(
        allfeats.filter(~F.col("is_val")),
        ["x1", "x2", "x3"],
        "y",
        steps=16,
        lr=4.0,
        trajectory=True,
    )

    aggs = []
    for k in _CURVE_STEPS:
        ok = (
            (logistic_prob(traj[k - 1], ["x1", "x2", "x3"]) >= 0.5)
            == (F.col("y") == 1.0)
        ).cast("int")
        aggs.append(
            F.round(
                F.sum(F.when(~F.col("is_val"), ok)).cast("double")
                / F.sum((~F.col("is_val")).cast("int")),
                6,
            ).alias(f"t{k}")
        )
        aggs.append(
            F.round(
                F.sum(F.when(F.col("is_val"), ok)).cast("double")
                / F.sum(F.col("is_val").cast("int")),
                6,
            ).alias(f"v{k}")
        )
    one = allfeats.agg(*aggs)
    stack_args = ", ".join(f"{k}, t{k}, v{k}" for k in _CURVE_STEPS)
    curve = one.selectExpr(
        f"stack({len(_CURVE_STEPS)}, {stack_args})"
        " as (step, train_acc, val_acc)"
    )
    return curve.select(
        "step",
        "train_acc",
        "val_acc",
        F.round(F.col("train_acc") - F.col("val_acc"), 6).alias(
            "overfit_gap"
        ),
    ).orderBy("step")


def _kfold_cv_sql(steps: int = 8, lr: float = 4.0) -> str:
    chains = ",".join(
        _logreg_train_ctes(steps, lr, f" WHERE doc_id % 3 <> {f}", sfx)
        for f, sfx in ((0, "a"), (1, "b"), (2, "c"))
    )
    branches = []
    for f, sfx in ((0, "a"), (1, "b"), (2, "c")):
        ok = f"CASE WHEN ({_LOGREG_P} >= 0.5) = (f.y = 1.0) THEN 1 ELSE 0 END"
        branches.append(f"""
    SELECT {f} AS fold,
           CAST(SUM(CASE WHEN f.fold <> {f} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_train,
           CAST(SUM(CASE WHEN f.fold = {f} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_val,
           ROUND(CAST(SUM(CASE WHEN f.fold <> {f} THEN {ok} ELSE 0 END)
                      AS DOUBLE)
                 / SUM(CASE WHEN f.fold <> {f} THEN 1 ELSE 0 END), 6)
             AS train_acc,
           ROUND(CAST(SUM(CASE WHEN f.fold = {f} THEN {ok} ELSE 0 END)
                      AS DOUBLE)
                 / SUM(CASE WHEN f.fold = {f} THEN 1 ELSE 0 END), 6)
             AS val_acc
    FROM af f CROSS JOIN it{sfx}{steps} w""")
    u = "\n    UNION ALL\n".join(branches)
    return f"""WITH {chains},
    af AS MATERIALIZED (
      SELECT doc_id % 3 AS fold,
             (CAST(len(string_split(text, ' ')) AS DOUBLE) - 30.0)
               / 30.0 AS x1,
             (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
               / len(string_split(text, ' ')) - 0.2) * 5.0 AS x2,
             CASE WHEN n_chars BETWEEN 100 AND 400
                  THEN 1.0 ELSE 0.0 END AS x3,
             CASE WHEN len(string_split(text, ' ')) >= 30
                   AND CAST(len(list_distinct(string_split(text, ' ')))
                            AS DOUBLE) / len(string_split(text, ' ')) >= 0.2
                  THEN 1.0 ELSE 0.0 END AS y
      FROM documents
    )
    {u}
    ORDER BY fold"""


@register(
    "logreg_kfold_cv",
    _kfold_cv_sql(),
    doc="3-FOLD CROSS-VALIDATION of the learned logistic quality scorer "
    "— the model-selection primitive the single holdout "
    "(logreg_learning_curve) can't provide: three disjoint hash folds "
    "(doc_id % 3), three independent trainings each on 2/3 of the "
    "corpus (8 decimal-exact GD steps, the quality_logreg_filter "
    "machinery with a WHERE-filtered training chain per fold), "
    "per-fold train and held-out accuracy side by side; the spread "
    "across val_acc rows IS the variance estimate of the scorer's "
    "generalization. Cost shape: each GD step stays one d+2-scalar "
    "decimal aggregate over the training slice — 3 folds x 8 steps of "
    "control-plane-sized reads, never a collect of data rows; all "
    "three fold evaluations fold into ONE pass over the shared "
    "feature projection. Oracle unrolls all three trainings as "
    "suffix-disambiguated materialized CTE chains (a/b/c) and "
    "evaluates from the same it-tables.",
)
def logreg_kfold_cv(spark, sf_dir):
    from newyork_taxi_etl_spark.operators.logreg import (
        logistic_gd,
        logistic_prob,
    )

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    af = docs.select(
        (F.col("doc_id") % 3).alias("fold"),
        ((F.size(toks) - F.lit(30.0)) / F.lit(30.0)).alias("x1"),
        ((ttr - F.lit(0.2)) * F.lit(5.0)).alias("x2"),
        F.when(F.col("n_chars").between(100, 400), 1.0)
        .otherwise(0.0)
        .alias("x3"),
        F.when((F.size(toks) >= 30) & (ttr >= 0.2), 1.0)
        .otherwise(0.0)
        .alias("y"),
    ).localCheckpoint()
    # the three folds' trainings are independent 8-step GD loops, each
    # step one tiny aggregate-collect job; running them from a thread
    # pool overlaps the 24 sequential driver barriers into ~8 (guide
    # §2.6 — concurrent jobs back-fill idle executors).  Per-fold math
    # is unchanged (deterministic decimal gradients), so values are
    # bit-identical to the sequential loop.
    from concurrent.futures import ThreadPoolExecutor

    def _train(f):
        spark.sparkContext.setJobDescription(f"logreg_kfold: fold {f}")
        return logistic_gd(
            af.filter(F.col("fold") != f),
            ["x1", "x2", "x3"],
            "y",
            steps=8,
            lr=4.0,
        )

    with ThreadPoolExecutor(max_workers=3) as pool:
        weights = list(pool.map(_train, (0, 1, 2)))
    outs = []
    for f in (0, 1, 2):
        w = weights[f]
        ok = (
            (logistic_prob(w, ["x1", "x2", "x3"]) >= 0.5)
            == (F.col("y") == 1.0)
        ).cast("int")
        is_tr = (F.col("fold") != f).cast("int")
        is_va = (F.col("fold") == f).cast("int")
        outs.append(
            af.agg(
                F.lit(f).alias("fold"),
                F.sum(is_tr).cast("bigint").alias("n_train"),
                F.sum(is_va).cast("bigint").alias("n_val"),
                F.round(
                    F.sum(ok * is_tr).cast("double") / F.sum(is_tr), 6
                ).alias("train_acc"),
                F.round(
                    F.sum(ok * is_va).cast("double") / F.sum(is_va), 6
                ).alias("val_acc"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("fold")


def _decon_sigs_sql(side: str, table: str) -> str:
    from newyork_taxi_etl_spark.functions.text import minhash_sql

    return f"""
    sigs_{side} AS (
      SELECT doc_id,
             {minhash_sql(_SH, 0)} AS mh_0,
             {minhash_sql(_SH, 1)} AS mh_1,
             {minhash_sql(_SH, 2)} AS mh_2,
             {minhash_sql(_SH, 3)} AS mh_3
      FROM {table}
    ),
    bands_{side} AS (
      SELECT doc_id, 0 AS band_idx, md5(concat(mh_0, '|', mh_1)) AS band_hash
      FROM sigs_{side}
      UNION ALL
      SELECT doc_id, 1 AS band_idx, md5(concat(mh_2, '|', mh_3)) AS band_hash
      FROM sigs_{side}
    )"""


_DECON_SQL = f"""
    WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 = 0),
    corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 50 <> 0),
    {_decon_sigs_sql('b', 'bench')},
    {_decon_sigs_sql('c', 'corpus')},
    hot AS (
      SELECT band_idx, band_hash
      FROM (SELECT * FROM bands_b UNION ALL SELECT * FROM bands_c)
      GROUP BY band_idx, band_hash HAVING COUNT(*) > 64
    ),
    cand AS MATERIALIZED (
      SELECT DISTINCT c.doc_id AS cid, b.doc_id AS bid
      FROM bands_c c JOIN bands_b b USING (band_idx, band_hash)
      WHERE NOT EXISTS (SELECT 1 FROM hot h
                        WHERE h.band_idx = c.band_idx
                          AND h.band_hash = c.band_hash)
    ),
    shc AS (
      SELECT doc_id, unnest(list_distinct({_SH})) AS g FROM documents
      WHERE doc_id IN (SELECT cid FROM cand)
    ),
    shb AS (
      SELECT doc_id, unnest(list_distinct({_SH})) AS g FROM documents
      WHERE doc_id IN (SELECT bid FROM cand)
    ),
    szc AS (SELECT doc_id, COUNT(*) AS n FROM shc GROUP BY 1),
    szb AS (SELECT doc_id, COUNT(*) AS n FROM shb GROUP BY 1),
    shared AS (
      SELECT p.cid, p.bid, COUNT(*) AS sh
      FROM cand p
      JOIN shc ON shc.doc_id = p.cid
      JOIN shb ON shb.doc_id = p.bid AND shb.g = shc.g
      GROUP BY 1, 2
    ),
    jacc AS (
      SELECT p.cid, p.bid,
             ROUND(CAST(COALESCE(s.sh, 0) AS DOUBLE)
                   / (c.n + b.n - COALESCE(s.sh, 0)), 4) AS j
      FROM cand p
      LEFT JOIN shared s ON s.cid = p.cid AND s.bid = p.bid
      JOIN szc c ON c.doc_id = p.cid
      JOIN szb b ON b.doc_id = p.bid
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM bench) AS n_bench_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM corpus) AS n_corpus_docs,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_band_candidates,
           COALESCE(CAST(SUM(CASE WHEN j >= 0.5 THEN 1 ELSE 0 END)
                    AS BIGINT), 0) AS n_flagged,
           COALESCE(MAX(j), 0.0) AS max_jaccard
    FROM jacc
    """


@register(
    "decontamination_fuzzy",
    _DECON_SQL,
    doc="FUZZY benchmark decontamination — the near-match twin of "
    "contamination_ngram_overlap (same doc_id % 50 benchmark slice): "
    "exact n-gram overlap misses paraphrased or lightly-edited eval "
    "leakage, so train-side and benchmark-side documents meet through "
    "banded MinHash-LSH (the dedup_minhash_lsh machinery — 4 sigs, 2 "
    "bands x r=2, hot-bucket cap 64 over the UNION of both sides) and "
    "every band candidate is gated by EXACT 3-shingle Jaccard >= 0.5. "
    "One always-present summary row: slice sizes, band-candidate "
    "count, flagged count, max observed Jaccard — zero candidates is "
    "the CORRECT answer on this corpus (no cross-slice near-dups "
    "planted; the dedup_minhash_lsh precedent).  Scale: both sides "
    "reduce to vocab..signature-sized band tables; the candidate join "
    "meets only inside band buckets (never corpus x bench); the exact "
    "gate touches candidate docs only via a semi-join.",
)
def decontamination_fuzzy(spark, sf_dir):
    from newyork_taxi_etl_spark.operators import dedup as D

    docs = spread(spark.read.parquet(table_path(sf_dir, "documents")))
    bench = docs.filter(F.col("doc_id") % 50 == 0)
    corpus = docs.filter(F.col("doc_id") % 50 != 0)
    bands_b = D.lsh_band_rows(D.with_minhash(bench)).localCheckpoint(
        eager=True
    )
    bands_c = D.lsh_band_rows(D.with_minhash(corpus)).localCheckpoint(
        eager=True
    )
    hot = (
        bands_b.unionByName(bands_c)
        .groupBy("band_idx", "band_hash")
        .agg(F.count(F.lit(1)).alias("_m"))
        .filter(F.col("_m") > 64)
        .select("band_idx", "band_hash")
    )
    cb = bands_c.join(F.broadcast(hot), ["band_idx", "band_hash"], "left_anti")
    bb = bands_b.join(F.broadcast(hot), ["band_idx", "band_hash"], "left_anti")
    cand = (
        cb.select("band_idx", "band_hash", F.col("doc_id").alias("cid"))
        .join(
            bb.select("band_idx", "band_hash", F.col("doc_id").alias("bid")),
            ["band_idx", "band_hash"],
        )
        .select("cid", "bid")
        .distinct()
    ).localCheckpoint(eager=True)

    from newyork_taxi_etl_spark.functions.text import shingles_expr

    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles_expr("text", 3))).alias("g"),
    )
    shc = sh.join(
        F.broadcast(cand.select(F.col("cid").alias("doc_id")).distinct()),
        "doc_id",
        "semi",
    ).withColumnRenamed("doc_id", "cid")
    shb = sh.join(
        F.broadcast(cand.select(F.col("bid").alias("doc_id")).distinct()),
        "doc_id",
        "semi",
    ).withColumnRenamed("doc_id", "bid")
    szc = shc.groupBy("cid").agg(F.count(F.lit(1)).alias("nc"))
    szb = shb.groupBy("bid").agg(F.count(F.lit(1)).alias("nb"))
    shared = (
        cand.join(shc, "cid")
        .join(shb.withColumnRenamed("g", "gb"), "bid")
        .filter(F.col("g") == F.col("gb"))
        .groupBy("cid", "bid")
        .agg(F.count(F.lit(1)).alias("sh"))
    )
    jacc = (
        cand.join(shared, ["cid", "bid"], "left")
        .join(szc, "cid")
        .join(szb, "bid")
        .select(
            F.round(
                F.coalesce(F.col("sh"), F.lit(0)).cast("double")
                / (
                    F.col("nc")
                    + F.col("nb")
                    - F.coalesce(F.col("sh"), F.lit(0))
                ),
                4,
            ).alias("j")
        )
    )
    nb_df = bench.agg(F.count(F.lit(1)).cast("bigint").alias("n_bench_docs"))
    nc_df = corpus.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_corpus_docs")
    )
    ncand = cand.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_band_candidates")
    )
    gate = jacc.agg(
        F.coalesce(
            F.sum((F.col("j") >= 0.5).cast("int")).cast("bigint"), F.lit(0)
        ).alias("n_flagged"),
        F.coalesce(F.max("j"), F.lit(0.0)).alias("max_jaccard"),
    )
    return (
        nb_df.crossJoin(F.broadcast(nc_df))
        .crossJoin(F.broadcast(ncand))
        .crossJoin(F.broadcast(gate))
    )


# ---------------------------------------------------------------------------
# Per-domain quality-score calibration drift (PSI over the learned filter's
# score distribution) — batch + at-ingest twin.

def psi_from_source_counts(counts):
    """Shared PSI tail over additive (source, bin, n) counts — the
    w1_from_counts discipline: both the batch query and the streaming
    ingest monitor fold through THIS exact algebra, so the drained
    monitor equals the batch statistic bit-for-bit under any batching.

    Reference distribution = the GLOBAL score distribution (sum over
    sources); per-source PSI with the add-0.5/(t+5) smoothing
    psi_value_drift pins (empty bins take the correct smoothed
    zero-count probability, never an arbitrary constant).  Terms round
    at 12 dp into a DECIMAL(38,12) sum — cross-engine exact.
    """
    gl = counts.groupBy("bin").agg(F.sum("n").alias("ng"))
    tots = counts.groupBy("source").agg(F.sum("n").alias("ts"))
    tg = counts.agg(F.sum("n").alias("tg"))
    frac = (
        tots.crossJoin(F.broadcast(gl))
        .crossJoin(F.broadcast(tg))
        .join(counts, ["source", "bin"], "left")
        .select(
            "source",
            "ts",
            (
                (F.coalesce(F.col("n"), F.lit(0)) + 0.5)
                / (F.col("ts") + 5.0)
            ).alias("p_src"),
            ((F.col("ng") + 0.5) / (F.col("tg") + 5.0)).alias("p_ref"),
        )
    )
    terms = frac.select(
        "source",
        "ts",
        F.round(
            (F.col("p_src") - F.col("p_ref"))
            * F.log(F.col("p_src") / F.col("p_ref")),
            12,
        ).alias("term"),
    )
    return (
        terms.groupBy("source")
        .agg(
            F.max("ts").cast("bigint").alias("n_docs"),
            F.round(
                F.sum(F.col("term").cast("decimal(38,12)")).cast("double"),
                6,
            ).alias("psi"),
        )
        .orderBy("source")
    )


_PSI_DOMAIN_SQL = f"""WITH {_logreg_train_ctes(16, 4.0)},
    scored AS (
      SELECT f.source, {_LOGREG_P} AS p
      FROM (
        SELECT source,
               (CAST(len(string_split(text, ' ')) AS DOUBLE) - 30.0)
                 / 30.0 AS x1,
               (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) - 0.2) * 5.0 AS x2,
               CASE WHEN n_chars BETWEEN 100 AND 400
                    THEN 1.0 ELSE 0.0 END AS x3
        FROM documents
      ) f CROSS JOIN it16 w
    ),
    counts AS (
      SELECT source, LEAST(CAST(FLOOR(p * 10) AS INT), 9) AS bin,
             COUNT(*) AS n
      FROM scored GROUP BY 1, 2
    ),
    gl AS (SELECT bin, SUM(n) AS ng FROM counts GROUP BY 1),
    tots AS (SELECT source, SUM(n) AS ts FROM counts GROUP BY 1),
    tg AS (SELECT SUM(n) AS tg FROM counts),
    frac AS (
      SELECT t.source, t.ts,
             (COALESCE(c.n, 0) + 0.5) / (t.ts + 5.0) AS p_src,
             (g.ng + 0.5) / (x.tg + 5.0) AS p_ref
      FROM tots t CROSS JOIN gl g CROSS JOIN tg x
      LEFT JOIN counts c ON c.source = t.source AND c.bin = g.bin
    ),
    terms AS (
      SELECT source, ts,
             ROUND((p_src - p_ref) * ln(p_src / p_ref), 12) AS term
      FROM frac
    )
    SELECT source, CAST(MAX(ts) AS BIGINT) AS n_docs,
           ROUND(CAST(SUM(CAST(term AS DECIMAL(38,12))) AS DOUBLE), 6)
             AS psi
    FROM terms GROUP BY source ORDER BY source"""


def _scored_bins(docs, w):
    """Score docs under weight vector ``w`` and bucket into 10 fixed
    score-decile bins (shared by the batch query and the ingest fold)."""
    from newyork_taxi_etl_spark.operators.logreg import logistic_prob

    toks = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    feats = docs.select(
        "source",
        ((F.size(toks) - F.lit(30.0)) / F.lit(30.0)).alias("x1"),
        ((ttr - F.lit(0.2)) * F.lit(5.0)).alias("x2"),
        F.when(F.col("n_chars").between(100, 400), 1.0)
        .otherwise(0.0)
        .alias("x3"),
    )
    p = logistic_prob(w, ["x1", "x2", "x3"])
    return feats.select(
        "source",
        F.least(F.floor(p * 10).cast("int"), F.lit(9)).alias("bin"),
    )


@register(
    "quality_psi_by_domain",
    _PSI_DOMAIN_SQL,
    doc="PER-DOMAIN CALIBRATION DRIFT of the learned quality filter: "
    "train the quality_logreg_filter scorer (identical 16-step "
    "decimal-exact GD, shared CTE chain), bucket every document's "
    "score into 10 fixed deciles, and report each source domain's PSI "
    "against the GLOBAL score distribution — the monitoring number "
    "that catches a domain whose quality-score distribution has "
    "drifted away from the corpus the filter was calibrated on "
    "(<0.1 stable, >0.25 investigate), BEFORE the gate silently "
    "starts over/under-dropping it.  Same smoothing + ln discipline "
    "as psi_value_drift (add-0.5/(t+5), terms ROUND(12) into a "
    "decimal sum).  Scale: one corpus scoring pass (weights are a "
    "4-float broadcast), then everything is (source x 10 bins)-sized.",
)
def quality_psi_by_domain(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    # the trainer's feature projection lives inside the cached build;
    # _scored_bins below re-derives the scoring features per doc
    w = _logreg_weights_cached(spark, docs, sf_dir)
    counts = (
        _scored_bins(docs, w)
        .groupBy("source", "bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return psi_from_source_counts(counts)


@register(
    "streaming_quality_psi_ingest",
    _PSI_DOMAIN_SQL,
    doc="the quality_psi_by_domain monitor folded AT INGEST — the "
    "calibration-drift alarm a serving team actually runs: the scorer "
    "trains ONCE on the reference corpus (weights persisted, the "
    "build-once/apply-per-batch pattern), documents arrive as a "
    "stream, and each micro-batch folds its own (source, bin) counts "
    "into the additive state table (replay-guarded).  After the drain "
    "the PSI computes from the accumulated counts via the SAME "
    "psi_from_source_counts fold the batch query uses — drained == "
    "batch bit-for-bit under any batching (counts are additive "
    "integers; everything else derives from them), so the batch "
    "oracle covers every slicing.  State is O(sources x 10 bins).",
)
def streaming_quality_psi_ingest(spark, sf_dir):
    import atexit
    import shutil
    import tempfile

    from newyork_taxi_etl_spark.streaming import windows as W

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    work = tempfile.mkdtemp(prefix="nyetl_psiingest_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    return W.run_streaming_psi_ingest(
        spark, docs, work, cache_key=f"documents_qg:{sf_dir}"
    )


# ---------------------------------------------------------------------------
# Reservoir-based global-shuffle audit: training-order determinism across
# shard re-exports.

def _shard_audit_stats(docs):
    """Per-shard audit triple for one export run of the deterministic
    global shuffle (training_shard_assignment's rule: shard =
    knuth(doc_id+7) % 16, order = (knuth(doc_id), doc_id)):

    - n_docs (count),
    - content_fp: the commutative sum-of-md5 fingerprint mod 2^61-1
      (corpus_shard_export's discipline — order-independent set identity),
    - order_fp: md5 over the k=8 RESERVOIR docs' ids concatenated in
      TRAINING ORDER — the reservoir is the 8 smallest md5(doc_id) per
      shard (deterministic, layout-invariant, map-side WindowGroupLimit),
      so the fingerprint is order-SENSITIVE but O(shards x 8) state.
    """
    from pyspark.sql import Window

    from newyork_taxi_etl_spark.operators.sampling import hash_bucket

    sharded = docs.select(
        "doc_id",
        hash_bucket(F.col("doc_id") + F.lit(7), 16).cast("int").alias(
            "shard"
        ),
        hash_bucket(F.col("doc_id"), 4294967296).alias("pos_key"),
    )
    stats = sharded.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        (
            F.sum(
                F.conv(
                    F.substring(F.md5(F.col("doc_id").cast("string")), 9, 8),
                    16,
                    10,
                )
                .cast("bigint")
                .cast("decimal(38,0)")
            )
            % F.lit(2305843009213693951)
        )
        .cast("bigint")
        .alias("content_fp"),
    )
    w = Window.partitionBy("shard").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    res = sharded.withColumn(
        "rk", F.row_number().over(w)
    ).filter(F.col("rk") <= 8)  # planned as WindowGroupLimit
    ofp = res.groupBy("shard").agg(
        F.md5(
            F.concat_ws(
                ",",
                F.expr(
                    "transform(array_sort(collect_list("
                    "struct(pos_key, doc_id))), x -> CAST(x.doc_id AS STRING))"
                ),
            )
        ).alias("order_fp")
    )
    return stats.join(F.broadcast(ofp), "shard")


@register(
    "shard_export_shuffle_audit",
    """
    WITH sharded AS (
      SELECT doc_id,
             CAST((((doc_id + 7) * 2654435761) % 4294967296) % 16 AS INT)
               AS shard,
             ((doc_id * 2654435761) % 4294967296) AS pos_key
      FROM documents
    ),
    stats AS (
      SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(CAST(CAST(('0x' ||
                    substr(md5(CAST(doc_id AS VARCHAR)), 9, 8))
                    AS BIGINT) AS DECIMAL(38,0)))
                  % 2305843009213693951 AS BIGINT) AS content_fp
      FROM sharded GROUP BY shard
    ),
    res AS (
      SELECT shard, pos_key, doc_id,
             ROW_NUMBER() OVER (PARTITION BY shard
                                ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS rk
      FROM sharded
    ),
    ofp AS (
      SELECT shard,
             md5(string_agg(CAST(doc_id AS VARCHAR), ','
                            ORDER BY pos_key, doc_id)) AS order_fp
      FROM res WHERE rk <= 8 GROUP BY shard
    )
    SELECT s.shard, s.n_docs, s.content_fp, o.order_fp,
           TRUE AS counts_match, TRUE AS content_match, TRUE AS order_match
    FROM stats s JOIN ofp o USING (shard)
    ORDER BY s.shard
    """,
    doc="GLOBAL-SHUFFLE AUDIT across shard re-exports: the deterministic "
    "training shuffle (training_shard_assignment's hash shard + hash "
    "order) is computed TWICE — run A from the corpus as laid out, run "
    "B from a deliberately different physical layout (repartitioned by "
    "lang, re-sorted by n_chars) — and per shard the audit compares "
    "count, the order-independent content fingerprint, and an "
    "order-SENSITIVE fingerprint over an 8-doc deterministic reservoir "
    "(smallest md5 ranks, map-side WindowGroupLimit) sequenced in "
    "training order.  All three booleans must hold: a layout-dependent "
    "order rule (e.g. row_number over arrival order, df.sample, rand) "
    "breaks order_match immediately, which is the property a "
    "reproducible training run depends on.  The oracle pins run A's "
    "values; the corruption-detection power (dropped doc, reseeded "
    "order) is pinned by pytest.  O(shards x 8) audit state — never a "
    "corpus comparison.",
)
def shard_export_shuffle_audit(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    run_a = _shard_audit_stats(docs)
    # run B: same rule from a deliberately different physical layout
    relaid = docs.repartition(17, "lang").sortWithinPartitions("n_chars")
    run_b = _shard_audit_stats(relaid).select(
        "shard",
        F.col("n_docs").alias("n_docs_b"),
        F.col("content_fp").alias("content_fp_b"),
        F.col("order_fp").alias("order_fp_b"),
    )
    return (
        run_a.join(run_b, "shard")
        .select(
            "shard",
            "n_docs",
            "content_fp",
            "order_fp",
            (F.col("n_docs") == F.col("n_docs_b")).alias("counts_match"),
            (F.col("content_fp") == F.col("content_fp_b")).alias(
                "content_match"
            ),
            (F.col("order_fp") == F.col("order_fp_b")).alias("order_match"),
        )
        .orderBy("shard")
    )


def _decon_pos_grams(docs, k=8):
    """Positional k-gram table (doc_id, pos, g) — the slice/array_join
    form, spread before the interpreted transform."""
    from newyork_taxi_etl_spark.session import spread

    return (
        spread(docs)
        .withColumn("_t", F.split("text", " "))
        .withColumn(
            "_sh",
            F.expr(
                f"CASE WHEN size(_t) >= {k} "
                f"THEN transform(sequence(1, size(_t) - {k - 1}), "
                f"i -> array_join(slice(_t, i, {k}), ' ')) "
                f"ELSE array() END"
            ),
        )
        .select("doc_id", F.posexplode("_sh").alias("pos0", "g"))
        .select("doc_id", (F.col("pos0") + 1).alias("pos"), "g")
    )


def _decon_bench_index(docs, k=8, cap=64):
    """The PERSISTABLE span-decontamination index: the benchmark slice's
    positional grams minus its own hot grams (>cap occurrences WITHIN the
    benchmark — a property of the index alone, so the cap needs nothing
    from the corpus and bounds the asymmetric join mass at cap x corpus
    grams)."""
    bench = _decon_pos_grams(docs.filter(F.col("doc_id") % 50 == 0), k)
    hot = (
        bench.groupBy("g")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") > cap)
        .select("g")
    )
    return bench.join(hot, "g", "left_anti").select(
        F.col("doc_id").alias("bench_id"),
        F.col("pos").alias("pos_b"),
        "g",
    )


def _decon_runs(index_df, corpus_grams, k=8, min_tokens=12):
    """(bench_id, corpus_id, run_tokens) verbatim runs: corpus grams join
    the pruned bench index, maximal runs per (pair, diagonal).  Hot grams
    are absent from the index, so no corpus-side pruning is needed."""
    from pyspark.sql import Window

    pairs = corpus_grams.join(index_df, "g").select(
        "bench_id",
        F.col("doc_id").alias("corpus_id"),
        F.col("pos").alias("pos_c"),
        (F.col("pos_b") - F.col("pos")).alias("diag"),
    )
    w = Window.partitionBy("bench_id", "corpus_id", "diag").orderBy("pos_c")
    return (
        pairs.withColumn(
            "run_key", F.col("pos_c") - F.row_number().over(w)
        )
        .groupBy("bench_id", "corpus_id", "diag", "run_key")
        .agg(
            (F.max("pos_c") + F.lit(k - 1) - F.min("pos_c") + 1).alias(
                "run_tokens"
            )
        )
        .filter(F.col("run_tokens") >= min_tokens)
    )


def _decon_top(runs):
    return (
        runs.groupBy("corpus_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shared_runs"),
            F.max("run_tokens").cast("bigint").alias("longest_run_tokens"),
            F.countDistinct("bench_id").cast("bigint").alias("n_bench_docs"),
        )
        .orderBy(F.desc("longest_run_tokens"), "corpus_id")
        .limit(20)
    )



_DECON_SPAN_SQL = f"""
    WITH shl AS (
      SELECT doc_id, CASE WHEN doc_id % 50 = 0 THEN 1 ELSE 0 END AS is_bench,
             CASE WHEN len(string_split(text, ' ')) >= 8
                  THEN list_transform(
                         range(1, len(string_split(text, ' ')) - 6),
                         i -> array_to_string(
                                string_split(text, ' ')[i:i+7], ' '))
                  ELSE [] END AS s
      FROM documents
    ),
    sh AS (
      SELECT doc_id, is_bench, unnest(s) AS g, generate_subscripts(s, 1)
               AS pos
      FROM shl
    ),
    hot AS (
      SELECT g FROM sh WHERE is_bench = 1
      GROUP BY g HAVING COUNT(*) > 64
    ),
    pruned AS (SELECT sh.* FROM sh ANTI JOIN hot USING (g)),
    pairs AS (
      SELECT b.doc_id AS bench_id, c.doc_id AS corpus_id,
             c.pos AS pos_c, b.pos - c.pos AS diag
      FROM pruned b JOIN pruned c
        ON b.g = c.g AND b.is_bench = 1 AND c.is_bench = 0
    ),
    marked AS (
      SELECT bench_id, corpus_id, diag,
             pos_c - ROW_NUMBER() OVER (PARTITION BY bench_id, corpus_id,
                                        diag ORDER BY pos_c) AS run_key,
             pos_c
      FROM pairs
    ),
    runs AS (
      SELECT bench_id, corpus_id,
             MAX(pos_c) + 7 - MIN(pos_c) + 1 AS run_tokens
      FROM marked GROUP BY bench_id, corpus_id, diag, run_key
    )
    SELECT corpus_id, CAST(COUNT(*) AS BIGINT) AS n_shared_runs,
           CAST(MAX(run_tokens) AS BIGINT) AS longest_run_tokens,
           CAST(COUNT(DISTINCT bench_id) AS BIGINT) AS n_bench_docs
    FROM runs WHERE run_tokens >= 12
    GROUP BY corpus_id
    ORDER BY longest_run_tokens DESC, corpus_id
    LIMIT 20
    """


@register(
    "decontamination_exact_substring",
    _DECON_SPAN_SQL,
    doc="SPAN-LEVEL benchmark decontamination (the Lee et al. ExactSubstr "
    "mode beside the exact-n-gram-set and fuzzy-MinHash modes): "
    "verbatim >=12-token runs SHARED between a corpus doc and any "
    "benchmark doc (doc_id % 50 = 0, the eval-suite stand-in), top-20 "
    "corpus docs by longest leaked span.  Catches the contamination "
    "shape set-overlap fractions dilute away (one long verbatim quote "
    "inside a long document scores low Jaccard but is a full answer "
    "leak) and the fuzzy gate rounds off (it thresholds global "
    "similarity, not span length).  Same capped positional inverted "
    "index as dedup_exact_substring, restricted to bench x corpus "
    "sides — join mass bounded by the benchmark's shingle footprint, "
    "which is small by definition.",
)
def decontamination_exact_substring(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    index = _decon_bench_index(docs).localCheckpoint()
    corpus = _decon_pos_grams(docs.filter(F.col("doc_id") % 50 != 0))
    return _decon_top(_decon_runs(index, corpus))


@register(
    "streaming_decontamination_ingest",
    _DECON_SPAN_SQL,
    doc="decontamination_exact_substring folded AT INGEST — the fifth "
    "build-once/apply-per-batch instance: the benchmark's pruned "
    "positional-gram index persists once (its hot cap is a property "
    "of the index alone), corpus docs stream in micro-batches, each "
    "batch joins the static index and appends its maximal-run rows "
    "(replay-guarded).  Runs live inside single documents and docs "
    "arrive whole, so per-pair rows are final on append: drained == "
    "batch bit-for-bit under any slicing, and the batch oracle "
    "covers every batching.  The deploy shape: at 100 TB the index "
    "is a small partitioned table and only the batch shuffles.",
)
def streaming_decontamination_ingest(spark, sf_dir):
    import atexit
    import shutil
    import tempfile

    from newyork_taxi_etl_spark.streaming import windows as W

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    work = tempfile.mkdtemp(prefix="nyetl_deconingest_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    return W.run_streaming_decon_ingest(
        spark, docs, work, cache_key=f"documents_decon:{sf_dir}"
    )


# --- DSIR: data selection via importance resampling (Xie et al. 2023) ------

_DSIR_BUCKET_DUCK = (
    "CAST(('0x' || substring(md5(tok), 1, 8)) AS BIGINT) % 64"
)


_DSIR_SQL = f"""
    WITH toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    bt AS (
      SELECT doc_id, lang, {_DSIR_BUCKET_DUCK} AS bucket FROM toks
    ),
    raw AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr FROM bt GROUP BY bucket
    ),
    tgt AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct
      FROM bt WHERE lang = 'en' GROUP BY bucket
    ),
    tot AS (
      SELECT (SELECT CAST(SUM(cr) AS BIGINT) FROM raw) AS tr,
             (SELECT CAST(SUM(ct) AS BIGINT) FROM tgt) AS tt
    ),
    lr_tab AS (
      SELECT r.bucket,
             ROUND(ln((COALESCE(t.ct, 0) + 1) / (tot.tt + 64))
                   - ln((r.cr + 1) / (tot.tr + 64)), 12) AS lr
      FROM raw r LEFT JOIN tgt t ON r.bucket = t.bucket, tot
    ),
    per_doc AS (
      SELECT doc_id, lang,
             ROUND(CAST(CAST(SUM(CAST(CAST(lr AS VARCHAR)
                      AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE), 6) AS w
      FROM bt JOIN lr_tab USING (bucket)
      GROUP BY doc_id, lang
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(CAST(SUM(CAST(CAST(w AS VARCHAR) AS DECIMAL(38,12)))
                 AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS avg_logweight,
           CAST(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_selected,
           ROUND(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) / COUNT(*), 6)
             AS selected_share
    FROM per_doc GROUP BY lang ORDER BY lang
    """


@register(
    "dsir_importance_select",
    _DSIR_SQL,
    doc="DSIR — Data Selection via Importance Resampling (Xie et al., "
    "NeurIPS 2023): score every document by how much more likely its "
    "hashed-n-gram features are under the TARGET distribution than "
    "under the raw pool, then keep the high-importance tail.  Feature "
    "space is the hashing trick (md5 mod 64 — feature_hashing_profile's "
    "engine-parity bucket), so NO vocabulary pass exists anywhere: "
    "target (the 'en' slice standing in for the trusted domain) and "
    "raw bucket unigram models are two 64-row aggregates with add-1 "
    "smoothing, the per-bucket log-ratio table broadcasts onto the "
    "token stream, and each doc's importance weight is the decimal-"
    "summed sum of its tokens' log ratios (ROUND 12 per bucket, ROUND "
    "6 per doc — identical IEEE algebra both engines).  Output: "
    "per-language doc counts, mean log-weight, and the selected share "
    "(w > 0 — 'looks more target than raw'); en scores positive and "
    "the other languages' shares measure hash-collision bleed, which "
    "this profile records rather than assumes away.  Scale: two O(64) "
    "model tables, one broadcast, map-side-combinable aggregates only "
    "— the 100 TB dataflow is the same three passes",
)
def dsir_importance_select(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    return _dsir_profile(docs)


def _dsir_buckets(docs):
    """Documents -> hashed-n-gram feature stream (doc_id, lang, bucket):
    the md5-mod-64 hashing trick, so no vocabulary pass exists."""
    return docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    ).select(
        "doc_id",
        "lang",
        F.pmod(
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint"),
            F.lit(64),
        ).alias("bucket"),
    )


def _dsir_lr_tab(bt, target_lang: str = "en"):
    """Bucket stream -> the 64-row add-1-smoothed log-ratio table
    ln p_target(bucket) - ln p_raw(bucket) — DSIR's trained model, built
    ONCE (two map-side-combinable aggregates) and broadcast/persisted."""
    raw = bt.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("cr")
    )
    tgt = (
        bt.filter(F.col("lang") == target_lang)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("ct"))
    )
    rt = raw.agg(F.sum("cr").cast("bigint").alias("tr"))
    tt = tgt.agg(F.sum("ct").cast("bigint").alias("tt"))
    return (
        raw.join(tgt, "bucket", "left")
        .crossJoin(F.broadcast(rt))
        .crossJoin(F.broadcast(tt))
        .select(
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                    / (F.col("tt") + 64)
                )
                - F.log((F.col("cr") + 1) / (F.col("tr") + 64)),
                12,
            ).alias("lr"),
        )
    )


def _dsir_doc_weights(bt, lr_tab):
    """Score documents against a (possibly persisted) log-ratio table:
    importance log-weight w = decimal-summed sum of the doc's tokens'
    bucket log ratios (ROUND 6) — per-doc, final on arrival."""
    return (
        bt.join(F.broadcast(lr_tab), "bucket")
        .groupBy("doc_id", "lang")
        .agg(
            F.round(
                F.sum(F.col("lr").cast("decimal(38,12)")).cast("double"), 6
            ).alias("w")
        )
    )


def _dsir_lang_profile(per_doc):
    """Per-doc weights -> per-language selection profile (the batch
    query's output shape)."""
    from newyork_taxi_etl_spark.functions.exact import avg_exact

    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(avg_exact("w"), 6).alias("avg_logweight"),
            F.sum((F.col("w") > 0).cast("int"))
            .cast("bigint")
            .alias("n_selected"),
            F.round(
                F.sum((F.col("w") > 0).cast("int"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("selected_share"),
        )
        .orderBy("lang")
    )


def _dsir_profile(docs, target_lang: str = "en"):
    """DSIR per-language selection profile over a documents frame —
    factored so the planted-corpus pytest (disjoint vocab, no hash
    collisions) drives the exact production chain."""
    bt = _dsir_buckets(docs)
    return _dsir_lang_profile(
        _dsir_doc_weights(bt, _dsir_lr_tab(bt, target_lang))
    )


@register(
    "streaming_dsir_ingest",
    _DSIR_SQL,
    doc="dsir_importance_select folded AT INGEST — the sixth "
    "build-once/apply-per-batch instance (ANN index, linkage index, "
    "quality gate, PSI monitor, decontamination index, now the DSIR "
    "selector itself — the shape a crawl pipeline deploys: train the "
    "importance model on the trusted reference once, score and select "
    "every arriving document): the 64-bucket log-ratio table builds "
    "ONCE on the reference corpus and persists; documents then arrive "
    "as a stream and each micro-batch scores its own docs against the "
    "static table (per-doc weights are final on arrival — docs arrive "
    "whole and the model is frozen) and folds per-language partials "
    "(n_docs, decimal sum_w, n_selected) into the additive state table, "
    "replay-guarded by the applied-batch sidecar.  The drained profile "
    "recomposes from the partials with the batch query's exact algebra "
    "(decimal sums are order/batching-independent), so drained == batch "
    "bit-for-bit under any slicing and the batch oracle covers every "
    "batching.  State is O(languages) regardless of stream length; at "
    "100 TB only the micro-batch shuffles and the model is 64 rows.",
)
def streaming_dsir_ingest(spark, sf_dir):
    import atexit
    import shutil
    import tempfile

    from newyork_taxi_etl_spark.streaming import windows as W

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    work = tempfile.mkdtemp(prefix="nyetl_dsiringest_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    return W.run_streaming_dsir_ingest(
        spark, docs, work, cache_key=f"documents_dsir:{sf_dir}"
    )


@register(
    "dsir_domain_affinity",
    f"""
    WITH toks AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    bt AS (
      SELECT doc_id, source, {_DSIR_BUCKET_DUCK} AS bucket FROM toks
    ),
    raw AS (
      SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr FROM bt GROUP BY bucket
    ),
    trt AS (SELECT CAST(SUM(cr) AS BIGINT) AS tr FROM raw),
    ct AS (
      SELECT source AS target, bucket, CAST(COUNT(*) AS BIGINT) AS ct
      FROM bt GROUP BY 1, 2
    ),
    ttt AS (
      SELECT target, CAST(SUM(ct) AS BIGINT) AS tt FROM ct GROUP BY 1
    ),
    lr_tab AS (
      SELECT t.target, r.bucket,
             ROUND(ln((COALESCE(c.ct, 0) + 1) / (t.tt + 64))
                   - ln((r.cr + 1) / (trt.tr + 64)), 12) AS lr
      FROM ttt t CROSS JOIN raw r
      LEFT JOIN ct c ON c.target = t.target AND c.bucket = r.bucket,
      trt
    ),
    per_doc AS (
      SELECT l.target, b.doc_id, b.source,
             ROUND(CAST(CAST(SUM(CAST(CAST(l.lr AS VARCHAR)
                      AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE), 6) AS w
      FROM bt b JOIN lr_tab l ON b.bucket = l.bucket
      GROUP BY 1, 2, 3
    )
    SELECT target, source AS domain,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(CAST(CAST(SUM(CAST(CAST(w AS VARCHAR) AS DECIMAL(38,12)))
                 AS VARCHAR) AS DOUBLE) / COUNT(*), 6) AS avg_logweight,
           ROUND(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) / COUNT(*), 6)
             AS selected_share
    FROM per_doc GROUP BY target, source ORDER BY target, domain
    """,
    doc="PER-DOMAIN DSIR -> DOMAIN-AFFINITY MATRIX: dsir_importance_select "
    "run with EVERY source as its own target in one dataflow — cell "
    "(t, d) is the mean importance log-weight of domain d's documents "
    "under the model trained with t as the trusted target, i.e. how "
    "much of d 'looks like' t.  The mixture-design companion to "
    "domain_mix_weights: a row of the matrix tells you which other "
    "domains can substitute for a scarce target (the Xie et al. DSIR "
    "protocol, matrixed).  One pass builds ALL models: the per-target "
    "bucket counts are a single (source, bucket) aggregate, the "
    "log-ratio table is targets x 64 rows (broadcast), and scoring "
    "joins each token's bucket against all targets' ratios — corpus "
    "cost x n_domains, with n_domains small by construction (it is a "
    "curated source list, not a vocabulary).  Planted-domain pytest "
    "pins diagonal dominance on a collision-free vocabulary; on this "
    "synthetic corpus the off-diagonal bleed is RECORDED, not assumed "
    "away.  Same add-1 smoothing, decimal sums, and VARCHAR-routed "
    "out-casts as the single-target query",
)
def dsir_domain_affinity(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    return _dsir_affinity_matrix(docs)


def _dsir_affinity_matrix(docs, domain_col: str = "source"):
    """All-targets DSIR affinity matrix over a documents frame —
    factored so the planted-domain pytest (disjoint vocabularies)
    drives the exact production chain."""
    from newyork_taxi_etl_spark.functions.exact import avg_exact

    toks = docs.select(
        "doc_id",
        F.col(domain_col).alias("source"),
        F.explode(F.split("text", " ")).alias("tok"),
    )
    bt = toks.select(
        "doc_id",
        "source",
        F.pmod(
            F.conv(F.substring(F.md5("tok"), 1, 8), 16, 10).cast("bigint"),
            F.lit(64),
        ).alias("bucket"),
    )
    # r16 (guide §2.3 — aggregate before you shuffle): collapse the token
    # stream to per-(doc, bucket) COUNTS before anything else.  The model
    # tables are exact sums of these counts, and the per-doc decimal
    # weight sum(lr) over token instances == sum(lr_dec * cnt) in exact
    # decimal arithmetic (decimal(25,12) x decimal(12,0) -> decimal(38,12)
    # with no precision loss, so no rounding anywhere before the final
    # double cast).  The scoring join's input shrinks from every token
    # instance x n_targets to <= 64 rows per doc x n_targets, and the
    # pinned intermediate (three consumer lineages) is the folded table
    # instead of the full token stream.
    btc = (
        bt.groupBy("doc_id", "source", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("bcnt"))
        .localCheckpoint(eager=False)
    )
    raw = btc.groupBy("bucket").agg(
        F.sum("bcnt").cast("bigint").alias("cr")
    )
    rt = raw.agg(F.sum("cr").cast("bigint").alias("tr"))
    ct = btc.groupBy(F.col("source").alias("target"), "bucket").agg(
        F.sum("bcnt").cast("bigint").alias("ct")
    )
    tt = ct.groupBy("target").agg(F.sum("ct").cast("bigint").alias("tt"))
    lr_tab = (
        tt.crossJoin(F.broadcast(raw))
        .join(F.broadcast(ct), ["target", "bucket"], "left")
        .crossJoin(F.broadcast(rt))
        .select(
            "target",
            "bucket",
            F.round(
                F.log(
                    (F.coalesce(F.col("ct"), F.lit(0)) + 1)
                    / (F.col("tt") + 64)
                )
                - F.log((F.col("cr") + 1) / (F.col("tr") + 64)),
                12,
            ).alias("lr"),
        )
    )
    per_doc = (
        btc.join(F.broadcast(lr_tab), "bucket")
        .groupBy("target", "doc_id", "source")
        .agg(
            F.round(
                F.sum(
                    F.col("lr").cast("decimal(25,12)")
                    * F.col("bcnt").cast("decimal(12,0)")
                ).cast("double"),
                6,
            ).alias("w")
        )
    )
    return (
        per_doc.groupBy("target", F.col("source").alias("domain"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.round(avg_exact("w"), 6).alias("avg_logweight"),
            F.round(
                F.sum((F.col("w") > 0).cast("int"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("selected_share"),
        )
        .orderBy("target", "domain")
    )


# --- T5 span corruption planning (Raffel et al. 2020, JMLR) ----------------

_SC_FLAG_DUCK = (
    "CAST(('0x' || substring(md5(doc_id || ':' || i), 1, 8)) AS BIGINT)"
    " % 100 < 15"
)
_SC_FLAG_SPARK = (
    "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), ':', "
    "CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT) % 100 < 15"
)


@register(
    "span_corruption_plan",
    f"""
    WITH d AS (
      SELECT doc_id, lang, len(string_split(text, ' ')) AS n,
             list_transform(range(1, len(string_split(text, ' ')) + 1),
                            i -> {_SC_FLAG_DUCK}) AS flags
      FROM documents
    ),
    per_doc AS (
      SELECT lang, n,
             len(list_filter(range(1, n + 1), i -> flags[i])) AS n_noise,
             len(list_filter(range(1, n + 1), i ->
               CASE WHEN NOT flags[i] THEN false
                    WHEN i = 1 THEN true
                    ELSE NOT flags[i - 1] END)) AS n_spans
      FROM d
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(SUM(n_noise) AS BIGINT) AS total_noise,
           CAST(SUM(n_spans) AS BIGINT) AS total_spans,
           ROUND(SUM(n_noise) / SUM(n), 6) AS corruption_rate,
           ROUND((SUM(n) - SUM(n_noise) + SUM(n_spans)) / COUNT(*), 6)
             AS avg_input_len,
           ROUND((SUM(n_noise) + SUM(n_spans) + COUNT(*)) / COUNT(*), 6)
             AS avg_target_len
    FROM per_doc GROUP BY lang ORDER BY lang
    """,
    doc="T5 SPAN-CORRUPTION planning (Raffel et al. 2020 §3.1.4 — the "
    "denoising objective's data-prep pass): every token position draws "
    "a deterministic noise flag (md5(doc_id:pos) mod 100 < 15 — the "
    "repo's portable seeded-hash idiom, so the plan is reproducible "
    "across runs AND engines), consecutive flagged positions merge "
    "into spans, and the emitted budget table carries exactly what a "
    "pretraining pipeline sizes batches with: corruption rate, mean "
    "encoder input length (tokens - noise + one sentinel per span) and "
    "mean decoder target length (noise + sentinels + EOS) per "
    "language.  Span starts are found by the lazy CASE (flag[i] AND "
    "NOT flag[i-1], i=1 guarded) — no window function, no explode: "
    "the whole per-doc plan is one HOF projection inside the scan, "
    "and the only shuffle is the O(langs) rollup.  At 100 TB this is "
    "the point: corruption planning is embarrassingly parallel and "
    "shuffle-free, so it belongs in the scan projection, not in a "
    "shuffled position table",
)
def span_corruption_plan(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    d = (
        docs.select(
            "doc_id",
            "lang",
            F.expr("size(split(text, ' '))").alias("n"),
            F.expr(
                f"transform(sequence(1, size(split(text, ' '))), "
                f"i -> {_SC_FLAG_SPARK})"
            ).alias("flags"),
        )
    )
    per_doc = d.select(
        "lang",
        "n",
        F.expr("size(filter(sequence(1, n), i -> element_at(flags, i)))")
        .alias("n_noise"),
        F.expr(
            "size(filter(sequence(1, n), i -> "
            "CASE WHEN NOT element_at(flags, i) THEN false "
            "WHEN i = 1 THEN true "
            "ELSE NOT element_at(flags, i - 1) END))"
        ).alias("n_spans"),
    )
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n").cast("bigint").alias("total_tokens"),
            F.sum("n_noise").cast("bigint").alias("total_noise"),
            F.sum("n_spans").cast("bigint").alias("total_spans"),
            F.round(
                F.sum("n_noise") / F.sum("n").cast("double"), 6
            ).alias("corruption_rate"),
            F.round(
                (F.sum("n") - F.sum("n_noise") + F.sum("n_spans"))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_input_len"),
            F.round(
                (F.sum("n_noise") + F.sum("n_spans") + F.count(F.lit(1)))
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("avg_target_len"),
        )
        .orderBy("lang")
    )


# --- curriculum x CCNet stage agreement -------------------------------------

_CURR_CCNET_SQL = f"""WITH {_logreg_train_ctes(16, 4.0)},
    qscored AS (
      SELECT f.doc_id, {_LOGREG_P} AS p
      FROM (
        SELECT doc_id,
               (CAST(len(string_split(text, ' ')) AS DOUBLE) - 30.0)
                 / 30.0 AS x1,
               (CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
                 / len(string_split(text, ' ')) - 0.2) * 5.0 AS x2,
               CASE WHEN n_chars BETWEEN 100 AND 400
                    THEN 1.0 ELSE 0.0 END AS x3
        FROM documents
      ) f CROSS JOIN it16 w
    ),
    qstaged AS (
      SELECT doc_id,
             CAST(NTILE(4) OVER (ORDER BY p DESC, doc_id) AS INT) AS stage
      FROM qscored
    ),
    toks AS (
      SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    uni AS (SELECT lang, tok, COUNT(*) AS cnt FROM toks GROUP BY 1, 2),
    utot AS (
      SELECT lang, CAST(SUM(cnt) AS BIGINT) AS total, COUNT(*) AS vocab
      FROM uni GROUP BY lang
    ),
    uni_nll AS (
      SELECT t.doc_id, t.lang,
             ROUND(-ln((u.cnt + 1)
                       / CAST(ut.total + ut.vocab AS DOUBLE)), 12) AS nll
      FROM toks t
      JOIN uni u ON t.lang = u.lang AND t.tok = u.tok
      JOIN utot ut ON t.lang = ut.lang
    ),
    du AS (
      SELECT doc_id, lang,
             ROUND(CAST(CAST(SUM(CAST(nll AS DECIMAL(38,12))) AS VARCHAR)
                        AS DOUBLE) / COUNT(*), 6) AS score
      FROM uni_nll GROUP BY 1, 2
    ),
    tiles AS (
      SELECT doc_id,
             CAST(NTILE(3) OVER (PARTITION BY lang ORDER BY score, doc_id)
                  AS INT) AS tile
      FROM du
    ),
    j AS (
      SELECT s.stage, t.tile
      FROM qstaged s JOIN tiles t ON s.doc_id = t.doc_id
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM j)
    SELECT stage, tile,
           CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           ROUND(COUNT(*) / CAST(tot.nt AS DOUBLE), 6) AS share
    FROM j, tot
    GROUP BY stage, tile, tot.nt
    ORDER BY stage, tile
    """


@register(
    "curriculum_ccnet_agreement",
    _CURR_CCNET_SQL,
    doc="CURRICULUM x CCNET STAGE AGREEMENT — the two quality orderings "
    "this engine ships (the supervised logistic curriculum's global "
    "NTILE(4) by model score and CCNet's per-language NTILE(3) by "
    "unigram perplexity) cross-tabulated doc-for-doc: cell (stage, "
    "bucket) counts and corpus shares.  The table a curation team "
    "reads to decide whether the two signals are redundant (mass on "
    "the stage-1 x head corner) or complementary (spread) — measured "
    "on THIS corpus, not assumed.  Both cuts ride their existing "
    "machinery: the curriculum stage via the ordered_positions "
    "range-partitioned NTILE(4) closed form, the CCNet bucket via the "
    "shared _lang_ntile3 fold — no per-corpus or per-language global "
    "window anywhere; the join is doc-keyed and the output is O(12) "
    "rows",
)
def curriculum_ccnet_agreement(spark, sf_dir):
    from newyork_taxi_etl_spark.operators.logreg import (
        logistic_gd,
        logistic_prob,
    )
    from newyork_taxi_etl_spark.operators.profile import ordered_positions
    from newyork_taxi_etl_spark.queries.text import (
        _doc_nll_cached,
        _lang_ntile3,
    )

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    toks = F.split(F.col("text"), " ")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    feats = docs.select(
        "doc_id",
        ((F.size(toks) - F.lit(30.0)) / F.lit(30.0)).alias("x1"),
        ((ttr - F.lit(0.2)) * F.lit(5.0)).alias("x2"),
        F.when(F.col("n_chars").between(100, 400), 1.0)
        .otherwise(0.0)
        .alias("x3"),
        F.when((F.size(toks) >= 30) & (ttr >= 0.2), 1.0)
        .otherwise(0.0)
        .alias("y"),
    ).localCheckpoint()
    w = _logreg_weights_cached(spark, docs, sf_dir)
    scored = feats.select(
        "doc_id", logistic_prob(w, ["x1", "x2", "x3"]).alias("p")
    )
    pos = ordered_positions(scored, [("p", False), ("doc_id", True)])
    n_df = scored.agg(F.count(F.lit(1)).alias("n_all"))
    stage = F.expr(
        "CAST(CASE WHEN gpos <= (n_all % 4) * (n_all DIV 4 + 1) "
        "THEN (gpos + (n_all DIV 4)) DIV (n_all DIV 4 + 1) "
        "ELSE (n_all % 4) + (gpos - (n_all % 4) * (n_all DIV 4 + 1) "
        "+ (n_all DIV 4) - 1) DIV (n_all DIV 4) END AS INT)"
    )
    qstaged = pos.crossJoin(F.broadcast(n_df)).select(
        "doc_id", stage.alias("stage")
    )
    # the add-1 unigram doc scores come from the shared stage cache (r16)
    # — the same table bigram_lm_compare / ccnet_kn_bucket_agreement read
    du = _doc_nll_cached(spark, sf_dir, "uni_add1", out="score")
    tiles = _lang_ntile3(du).select("doc_id", "tile")
    j = qstaged.join(tiles, "doc_id")
    tot = j.agg(F.count(F.lit(1)).cast("bigint").alias("nt"))
    return (
        j.groupBy("stage", "tile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .crossJoin(F.broadcast(tot))
        .select(
            "stage",
            "tile",
            F.expr(
                "CASE tile WHEN 1 THEN 'head' WHEN 2 THEN 'middle' "
                "ELSE 'tail' END"
            ).alias("bucket"),
            "n_docs",
            F.round(
                F.col("n_docs") / F.col("nt").cast("double"), 6
            ).alias("share"),
        )
        .orderBy("stage", "tile")
    )


# --- hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009) ---------

from newyork_taxi_etl_spark.queries.similarity import _COS_SQL  # noqa: E402

_RRF_K = 60
_RRF_TERMS = ("spark", "join", "vector")


@register(
    "hybrid_rrf_fusion",
    f"""
    WITH toks AS (
      SELECT doc_id, len(string_split(text, ' ')) AS dl,
             unnest(string_split(text, ' ')) AS tok
      FROM documents
    ),
    posting AS (
      SELECT doc_id, tok, dl, COUNT(*) AS tf
      FROM toks WHERE tok IN ('spark', 'join', 'vector')
      GROUP BY 1, 2, 3
    ),
    dfreq AS (SELECT tok, COUNT(*) AS df FROM posting GROUP BY 1),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             AVG(len(string_split(text, ' '))) AS avgdl
      FROM documents
    ),
    bm AS (
      SELECT doc_id,
             ROUND(SUM(
               ln(1 + (n_docs - df + 0.5) / (df + 0.5))
               * (tf * (1.2 + 1))
               / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / avgdl))
             ), 4) AS bm25
      FROM posting JOIN dfreq USING (tok), stats
      GROUP BY doc_id
    ),
    text50 AS (
      SELECT doc_id, text_rank FROM (
        SELECT doc_id,
               CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INT)
                 AS text_rank
        FROM bm
      ) WHERE text_rank <= 50
    ),
    vec50 AS (
      SELECT cand_id AS doc_id, CAST(rank AS INT) AS vec_rank FROM (
        SELECT c.vec_id AS cand_id,
               ROW_NUMBER() OVER (ORDER BY
                 {_COS_SQL.format(a='q.embedding', b='c.embedding')} DESC,
                 c.vec_id) AS rank
        FROM embeddings q JOIN embeddings c ON c.vec_id <> q.vec_id
        WHERE q.vec_id = 0
      ) WHERE rank <= 50
    ),
    fused AS (
      SELECT COALESCE(t.doc_id, v.doc_id) AS doc_id,
             t.text_rank, v.vec_rank,
             ROUND(COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + t.text_rank), 0)
                   + COALESCE(CAST(1 AS DOUBLE) / ({_RRF_K} + v.vec_rank),
                              0), 6) AS rrf_score
      FROM text50 t FULL OUTER JOIN vec50 v ON t.doc_id = v.doc_id
    )
    SELECT doc_id,
           CAST(COALESCE(text_rank, -1) AS INT) AS text_rank,
           CAST(COALESCE(vec_rank, -1) AS INT) AS vec_rank,
           rrf_score
    FROM fused ORDER BY rrf_score DESC, doc_id LIMIT 10
    """,
    doc="CROSS-MODAL hybrid retrieval via reciprocal-rank fusion "
    "(Cormack, Clarke & Buettcher 2009 — the fusion rule production "
    "hybrid search ships): the LEXICAL + DENSE pairing, complementing "
    "rrf_hybrid_retrieval (queries/similarity.py), which fuses two "
    "dense legs (full-dim vs truncated) — there the legs share a "
    "metric, here they do not even share a feature space, which is "
    "what makes rank-based fusion necessary.  The BM25 leg ranks "
    "documents for the "
    "bag-of-terms query ('spark','join','vector'), the dense leg ranks "
    "by cosine against probe vector 0; each leg keeps its top-50 and "
    "fuses with score(d) = sum over legs of 1/(60 + rank_leg(d)) — "
    "rank-based, so the two legs' incomparable score scales never need "
    "calibration.  Output: fused top-10 with both member ranks (-1 = "
    "not retrieved by that leg).  Scale: each leg is already a bounded "
    "top-K retrieval (BM25 scan touches only query-term postings and "
    "TakeOrderedAndProject keeps the distributed top-50; the rank "
    "window then orders 50 rows, never the corpus), and the fusion "
    "joins two 50-row sets — O(K) everywhere after the leg scans",
)
def hybrid_rrf_fusion(spark, sf_dir):
    from pyspark.sql import Window

    from newyork_taxi_etl_spark.operators import similarity as S

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    text50 = (
        C.bm25_scores(docs, list(_RRF_TERMS))
        .orderBy(F.desc("bm25"), "doc_id")
        .limit(50)
    )
    # rank window over the ALREADY-LIMITed 50-row frame (bounded by K,
    # same O(K) discipline as the offset windows elsewhere)
    wt = Window.orderBy(F.desc("bm25"), "doc_id")
    text_r = text50.select(
        "doc_id", F.row_number().over(wt).cast("int").alias("text_rank")
    )
    vec_r = S.brute_force_topk(
        emb, emb.filter(F.col("vec_id") == 0), k=50
    ).select(
        F.col("cand_id").alias("doc_id"),
        F.col("rank").cast("int").alias("vec_rank"),
    )
    rrf = F.round(
        F.coalesce(
            F.lit(1.0) / (F.lit(_RRF_K) + F.col("text_rank")), F.lit(0.0)
        )
        + F.coalesce(
            F.lit(1.0) / (F.lit(_RRF_K) + F.col("vec_rank")), F.lit(0.0)
        ),
        6,
    )
    return (
        text_r.join(vec_r, "doc_id", "full")
        .select(
            "doc_id",
            F.coalesce(F.col("text_rank"), F.lit(-1))
            .cast("int")
            .alias("text_rank"),
            F.coalesce(F.col("vec_rank"), F.lit(-1))
            .cast("int")
            .alias("vec_rank"),
            rrf.alias("rrf_score"),
        )
        .orderBy(F.desc("rrf_score"), "doc_id")
        .limit(10)
    )


# --- data-constrained mixture plan (Muennighoff et al. 2023) ----------------


@register(
    "mixture_epochs_plan",
    """
    WITH avail AS (
      SELECT source,
             CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
               AS avail_tokens
      FROM documents GROUP BY source
    ),
    wts AS (
      SELECT source, avail_tokens,
             ROUND(sqrt(CAST(avail_tokens AS DOUBLE)), 6) AS sq
      FROM avail
    ),
    tot AS (
      SELECT CAST(SUM(avail_tokens) AS BIGINT) AS total_tokens,
             CAST(CAST(SUM(CAST(CAST(sq AS VARCHAR) AS DECIMAL(38,12)))
                  AS VARCHAR) AS DOUBLE) AS s
      FROM wts
    )
    SELECT w.source, w.avail_tokens,
           ROUND(w.sq / tot.s, 6) AS weight,
           CAST(ROUND(ROUND(w.sq / tot.s, 6)
                      * (2 * tot.total_tokens)) AS BIGINT)
             AS requested_tokens,
           ROUND(CAST(ROUND(ROUND(w.sq / tot.s, 6)
                            * (2 * tot.total_tokens)) AS DOUBLE)
                 / w.avail_tokens, 4) AS epochs,
           CAST(CASE WHEN CAST(ROUND(ROUND(w.sq / tot.s, 6)
                                     * (2 * tot.total_tokens)) AS DOUBLE)
                          / w.avail_tokens > 4.0
                THEN 1 ELSE 0 END AS INT) AS over_repeat_cap
    FROM wts w, tot
    ORDER BY w.source
    """,
    doc="DATA-CONSTRAINED MIXTURE PLAN (Muennighoff et al. 2023, 'Scaling "
    "Data-Constrained Language Models'): given a token budget of 2x the "
    "corpus (a data-constrained run by construction) and a temperature "
    "mixture w_d proportional to sqrt(available_d) (alpha = 0.5, the "
    "temperature_mix_sampling rule — sqrt, not pow, because sqrt is "
    "correctly-rounded IEEE on both engines), report per source: the "
    "requested token allocation, the implied EPOCH count "
    "(requested/available), and the over_repeat_cap flag at 4 epochs — "
    "the paper's threshold beyond which repeating data stops buying "
    "loss.  The flagged rows are exactly the domains a data-constrained "
    "recipe must either up-source or down-weight (pair with "
    "dsir_domain_affinity to find substitutes).  Determinism: the "
    "mixture normalizer is a DECIMAL sum of 6-dp-rounded sqrts (a "
    "cross-group float sum's accumulation order is engine-dependent); "
    "weights round before the budget multiply so every boundary is "
    "shared.  Scale: one per-source token aggregate (map-side "
    "combinable) + O(sources) arithmetic",
)
def mixture_epochs_plan(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    avail = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", " ")))
        .cast("bigint")
        .alias("avail_tokens")
    )
    wts = avail.select(
        "source",
        "avail_tokens",
        F.round(F.sqrt(F.col("avail_tokens").cast("double")), 6).alias("sq"),
    )
    tot = wts.agg(
        F.sum("avail_tokens").cast("bigint").alias("total_tokens"),
        F.sum(F.col("sq").cast("decimal(38,12)"))
        .cast("double")
        .alias("s"),
    )
    weight = F.round(F.col("sq") / F.col("s"), 6)
    requested = F.round(weight * (2 * F.col("total_tokens"))).cast("bigint")
    epochs = F.round(
        requested.cast("double") / F.col("avail_tokens"), 4
    )
    return (
        wts.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "avail_tokens",
            weight.alias("weight"),
            requested.alias("requested_tokens"),
            epochs.alias("epochs"),
            (requested.cast("double") / F.col("avail_tokens") > 4.0)
            .cast("int")
            .alias("over_repeat_cap"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Suffix-LCP repetition depth (round-13): the cross-doc boilerplate axis
# doc_repetition_profile (within-doc) and dedup_exact_substring (pairwise
# spans) flag but do not PROFILE.

#: depth ladder — suffix-array LCP distribution checkpoints.  The classic
#: identity makes this distributable: a suffix's LCP with its neighbour in
#: the sorted suffix stream is >= d  <=>  the d-gram at that position is
#: NON-UNIQUE in the corpus, so P(LCP >= d) per language is a duplicated-
#: d-gram counting problem — no sorted suffix stream is ever materialized.
_LCP_DEPTHS = (1, 2, 4, 8, 16)


@register(
    "lcp_repetition_depth",
    f"""
    WITH toks AS (
      SELECT lang, doc_id, string_split(text, ' ') AS t FROM documents
    ),
    lad AS (SELECT unnest([{', '.join(str(d) for d in _LCP_DEPTHS)}]) AS d),
    g AS (
      SELECT tk.lang, tk.doc_id, lad.d,
             array_to_string(tk.t[r.i : r.i + lad.d - 1], ' ') AS gram
      FROM toks tk, lad, unnest(range(1, len(tk.t) - lad.d + 2)) AS r(i)
    ),
    c AS (
      SELECT lang, d, gram, CAST(COUNT(*) AS BIGINT) AS cnt,
             MIN(doc_id) AS mn, MAX(doc_id) AS mx
      FROM g GROUP BY lang, d, gram
    )
    SELECT lang, CAST(d AS BIGINT) AS depth,
           CAST(SUM(cnt) AS BIGINT) AS n_positions,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT)
             AS dup_positions,
           CAST(SUM(CASE WHEN mn <> mx THEN cnt ELSE 0 END) AS BIGINT)
             AS crossdoc_positions,
           ROUND(CAST(SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS DOUBLE)
                 / SUM(cnt), 6) AS dup_share,
           ROUND(CAST(SUM(CASE WHEN mn <> mx THEN cnt ELSE 0 END) AS DOUBLE)
                 / SUM(cnt), 6) AS crossdoc_share
    FROM c GROUP BY lang, d ORDER BY lang, depth
    """,
    doc="SUFFIX-LCP REPETITION DEPTH per language (the suffix-array view "
    "of Lee et al. 2022's ExactSubstr, as a PROFILE instead of a dedup "
    "pass): the distribution of longest-common-prefix depth over the "
    "corpus's suffix stream at checkpoint depths 1/2/4/8/16, i.e. what "
    "fraction of token positions start a span that recurs elsewhere "
    "(dup_share ~ P(LCP >= d)) and — the axis within-doc "
    "doc_repetition_profile cannot see — recurs in ANOTHER document "
    "(crossdoc_share, the boilerplate mass dedup_exact_substring would "
    "cut).  DISTRIBUTED FORM: a suffix's LCP with its sorted-stream "
    "neighbour is >= d exactly when its d-gram is non-unique, so the "
    "whole profile is duplicated-d-gram counting — one positional "
    "ladder explode (|ladder| x token positions, map-side), one count "
    "per (lang, depth, gram) with min/max doc_id deciding cross-doc "
    "membership algebraically (a gram spans >= 2 docs iff min <> max — "
    "no distinct-count sketch needed), and an O(langs x ladder) rollup; "
    "NO suffix sort, NO pair join, NOTHING quadratic.  Integer masses, "
    "two exact int/int divisions at 6 dp — engine-exact.",
)
def lcp_repetition_depth(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    return _lcp_finalize(_lcp_gram_stats(docs))


def _lcp_gram_stats(docs):
    """(lang, d, gram, cnt, mn, mx) — the LCP family's one corpus-sized
    pass (and the streaming twin's per-batch partial: cnt is an integer
    sum, mn/mx are min/max — all three fold associatively and
    commutatively, so any micro-batching drains to the identical
    state)."""
    ladder = ", ".join(str(d) for d in _LCP_DEPTHS)
    # _toks bound ONCE per row (the with_shingles lesson: split() inlined
    # into a lambda re-splits per iteration once CollapseProject folds it)
    grams = (
        docs.withColumn("_toks", F.split("text", " "))
        .select(
            "lang",
            "doc_id",
            F.explode(
                F.expr(
                    f"flatten(transform(array({ladder}), d -> "
                    "CASE WHEN size(_toks) >= d THEN "
                    "transform(sequence(1, size(_toks) - d + 1), "
                    "i -> named_struct('d', d, 'gram', "
                    "array_join(slice(_toks, i, d), ' '))) "
                    "ELSE CAST(array() AS ARRAY<STRUCT<d: INT, gram: STRING>>) "
                    "END))"
                )
            ).alias("e"),
        )
        .select(
            "lang", "doc_id", F.col("e.d").alias("d"), F.col("e.gram").alias("gram")
        )
    )
    return grams.groupBy("lang", "d", "gram").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.min("doc_id").alias("mn"),
        F.max("doc_id").alias("mx"),
    )


def _lcp_finalize(c):
    """(lang, d, gram, cnt, mn, mx) -> the per-(lang, depth) profile."""
    dup = F.sum(F.when(F.col("cnt") >= 2, F.col("cnt")).otherwise(F.lit(0)))
    xdoc = F.sum(
        F.when(F.col("mn") != F.col("mx"), F.col("cnt")).otherwise(F.lit(0))
    )
    return (
        c.groupBy("lang", F.col("d").cast("bigint").alias("depth"))
        .agg(
            F.sum("cnt").cast("bigint").alias("n_positions"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            dup.cast("bigint").alias("dup_positions"),
            xdoc.cast("bigint").alias("crossdoc_positions"),
            F.round(
                dup.cast("double") / F.sum("cnt"), 6
            ).alias("dup_share"),
            F.round(
                xdoc.cast("double") / F.sum("cnt"), 6
            ).alias("crossdoc_share"),
        )
        .orderBy("lang", "depth")
    )


@register(
    "streaming_lcp_depth_ingest",
    f"""
    WITH toks AS (
      SELECT lang, doc_id, string_split(text, ' ') AS t FROM documents
    ),
    lad AS (SELECT unnest([{', '.join(str(d) for d in _LCP_DEPTHS)}]) AS d),
    g AS (
      SELECT tk.lang, tk.doc_id, lad.d,
             array_to_string(tk.t[r.i : r.i + lad.d - 1], ' ') AS gram
      FROM toks tk, lad, unnest(range(1, len(tk.t) - lad.d + 2)) AS r(i)
    ),
    c AS (
      SELECT lang, d, gram, CAST(COUNT(*) AS BIGINT) AS cnt,
             MIN(doc_id) AS mn, MAX(doc_id) AS mx
      FROM g GROUP BY lang, d, gram
    )
    SELECT lang, CAST(d AS BIGINT) AS depth,
           CAST(SUM(cnt) AS BIGINT) AS n_positions,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS BIGINT)
             AS dup_positions,
           CAST(SUM(CASE WHEN mn <> mx THEN cnt ELSE 0 END) AS BIGINT)
             AS crossdoc_positions,
           ROUND(CAST(SUM(CASE WHEN cnt >= 2 THEN cnt ELSE 0 END) AS DOUBLE)
                 / SUM(cnt), 6) AS dup_share,
           ROUND(CAST(SUM(CASE WHEN mn <> mx THEN cnt ELSE 0 END) AS DOUBLE)
                 / SUM(cnt), 6) AS crossdoc_share
    FROM c GROUP BY lang, d ORDER BY lang, depth
    """,
    doc="SUFFIX-LCP DEPTH AT INGEST — the tenth per-batch fold: each "
    "micro-batch reduces to its own (lang, depth, gram) partial of "
    "(count, min doc_id, max doc_id) and the state fold is plain "
    "SUM/MIN/MAX behind the applied-batch replay sidecar — all three "
    "commute and associate, so the drained profile equals the one-shot "
    "batch audit (lcp_repetition_depth) bit-for-bit under ANY slicing "
    "and the batch oracle covers every batching.  This is how a crawl "
    "watches boilerplate accumulate: cross-doc duplicated-span mass "
    "per depth firms up as documents arrive, BEFORE a dedup pass is "
    "scheduled.  State is O(depths x gram vocabulary) — the largest "
    "state of the fold family, the honest cost of an exact profile "
    "(the bounded-state alternative is a CMS over grams, the "
    "freq_tokens_cms path); the profile windows run at drain time over "
    "the folded vocabulary table, never over positions.",
)
def streaming_lcp_depth_ingest(spark, sf_dir):
    import atexit
    import shutil
    import tempfile

    from newyork_taxi_etl_spark.streaming import windows as W

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    work = tempfile.mkdtemp(prefix="nyetl_lcpingest_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    return W.run_streaming_lcp_depth_ingest(
        spark, docs, work, cache_key=f"documents_lcp:{sf_dir}"
    )


_DOREMI_SQL = """
    WITH toks AS (
      SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    tf AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM toks WHERE tok <> '' GROUP BY source, tok
    ),
    st AS (
      SELECT source, CAST(SUM(cnt) AS BIGINT) AS n_s,
             CAST(COUNT(*) AS BIGINT) AS v_s
      FROM tf GROUP BY source
    ),
    g AS (
      SELECT tok, CAST(SUM(cnt) AS BIGINT) AS cnt_g FROM tf GROUP BY tok
    ),
    gt AS (
      SELECT CAST(SUM(cnt_g) AS BIGINT) AS n_g,
             CAST(COUNT(*) AS BIGINT) AS v_g
      FROM g
    ),
    scored AS (
      SELECT tf.source,
             SUM(CAST(ROUND(tf.cnt * -ln((g.cnt_g + 1)
                   / CAST(gt.n_g + gt.v_g AS DOUBLE)), 12)
                 AS DECIMAL(38,12))) AS sr,
             SUM(CAST(ROUND(tf.cnt * -ln((tf.cnt + 1)
                   / CAST(st.n_s + gt.v_g AS DOUBLE)), 12)
                 AS DECIMAL(38,12))) AS si
      FROM tf
      JOIN g USING (tok) JOIN st USING (source) CROSS JOIN gt
      GROUP BY tf.source
    ),
    m AS (
      SELECT s.source, st.n_s,
             ROUND(CAST(CAST(s.sr AS VARCHAR) AS DOUBLE) / st.n_s, 12)
               AS nll_ref,
             ROUND(CAST(CAST(s.si AS VARCHAR) AS DOUBLE) / st.n_s, 12)
               AS nll_in
      FROM scored s JOIN st USING (source)
    ),
    w AS (
      SELECT source, n_s, nll_ref, nll_in,
             ROUND((CAST(n_s AS DOUBLE)
                    / (SELECT CAST(SUM(n_s) AS DOUBLE) FROM m))
                   * exp(nll_ref - nll_in), 12) AS raw_w
      FROM m
    )
    SELECT source,
           n_s AS n_tokens,
           ROUND(nll_ref, 6) AS nll_ref,
           ROUND(nll_in, 6) AS nll_in,
           ROUND(nll_ref - nll_in, 6) AS excess,
           ROUND(raw_w / (SELECT CAST(CAST(SUM(CAST(raw_w
                 AS DECIMAL(38,12))) AS VARCHAR) AS DOUBLE) FROM w), 6)
             AS weight
    FROM w ORDER BY source
    """


@register(
    "doremi_domain_weights",
    _DOREMI_SQL,
    doc="DoReMi-STYLE DOMAIN REWEIGHTING (Xie et al. 2023, one-step "
    "proxy): per-source EXCESS LOSS — the mean token NLL a GLOBAL add-1 "
    "unigram reference pays on the domain minus what the IN-DOMAIN "
    "model pays — measures how much domain-specific structure the "
    "shared model misses; mixture weights are the token-share baseline "
    "exponentially tilted by the excess (eta = 1) and normalized, the "
    "multiplicative-weights update DoReMi iterates (one step here: the "
    "proxy is the in-domain LM, not a trained transformer — stated, "
    "not hidden).  Pairs with domain_mix_weights (size-only heuristic) "
    "and quality_psi_by_domain (drift): together size, difficulty and "
    "drift per feed.  Scale: scoring happens at VOCAB level — "
    "Sum(cnt x nll) over the (source, tok) frequency table, never a "
    "per-token-instance join — so the whole query is two vocab-sized "
    "aggregates, two broadcast model joins and an O(sources) softmax; "
    "12-dp decimal sums keep both engines exact.",
)
def doremi_domain_weights(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    return _doremi_from_tf(_doremi_tf(docs))


def _doremi_tf(docs):
    """(source, tok, cnt) term frequencies — the family's one
    corpus-sized pass and the streaming twin's additive per-batch
    partial (integer counts commute under any slicing)."""
    return (
        docs.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("tok")
        )
        .filter(F.col("tok") != "")
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _doremi_from_tf(tf):
    """The DoReMi finalize: models, vocab-level scoring, excess and the
    multiplicative-weights softmax — all from the (source, tok, cnt)
    table, shared by the batch query and the drain path."""
    dec = "decimal(38,12)"
    st = tf.groupBy("source").agg(
        F.sum("cnt").cast("bigint").alias("n_s"),
        F.count(F.lit(1)).cast("bigint").alias("v_s"),
    )
    g = tf.groupBy("tok").agg(F.sum("cnt").cast("bigint").alias("cnt_g"))
    gt = g.agg(
        F.sum("cnt_g").cast("bigint").alias("n_g"),
        F.count(F.lit(1)).cast("bigint").alias("v_g"),
    )
    nll_ref_t = -F.log(
        (F.col("cnt_g") + 1) / (F.col("n_g") + F.col("v_g")).cast("double")
    )
    # BOTH models smooth over the GLOBAL vocabulary: add-1 with the
    # domain's own (smaller) vocab would manufacture excess out of the
    # normalization term alone (planted-test finding: the mirror domain
    # out-scored the niche one on pure V_s size) — with a shared event
    # space the excess is a smoothed divergence of the distributions
    nll_in_t = -F.log(
        (F.col("cnt") + 1) / (F.col("n_s") + F.col("v_g")).cast("double")
    )
    scored = (
        tf.join(g, "tok")
        .join(F.broadcast(st), "source")
        .crossJoin(F.broadcast(gt))
        .groupBy("source")
        .agg(
            F.sum(F.round(F.col("cnt") * nll_ref_t, 12).cast(dec)).alias("sr"),
            F.sum(F.round(F.col("cnt") * nll_in_t, 12).cast(dec)).alias("si"),
        )
    )
    m = scored.join(F.broadcast(st), "source").select(
        "source",
        "n_s",
        F.round(F.col("sr").cast("double") / F.col("n_s"), 12).alias(
            "nll_ref"
        ),
        F.round(F.col("si").cast("double") / F.col("n_s"), 12).alias(
            "nll_in"
        ),
    )
    ntot = m.agg(F.sum("n_s").cast("double").alias("ntot"))
    w = m.crossJoin(F.broadcast(ntot)).select(
        "source",
        "n_s",
        "nll_ref",
        "nll_in",
        F.round(
            (F.col("n_s").cast("double") / F.col("ntot"))
            * F.exp(F.col("nll_ref") - F.col("nll_in")),
            12,
        ).alias("raw_w"),
    )
    wtot = w.agg(
        F.sum(F.col("raw_w").cast(dec)).cast("double").alias("wtot")
    )
    return (
        w.crossJoin(F.broadcast(wtot))
        .select(
            "source",
            F.col("n_s").alias("n_tokens"),
            F.round(F.col("nll_ref"), 6).alias("nll_ref"),
            F.round(F.col("nll_in"), 6).alias("nll_in"),
            F.round(F.col("nll_ref") - F.col("nll_in"), 6).alias("excess"),
            F.round(F.col("raw_w") / F.col("wtot"), 6).alias("weight"),
        )
        .orderBy("source")
    )


@register(
    "streaming_doremi_ingest",
    _DOREMI_SQL,
    doc="DoReMi REWEIGHTING AT INGEST — the eleventh per-batch fold "
    "(fourth with no build phase): each micro-batch reduces to its own "
    "(source, token) integer term-frequency partial and the state fold "
    "is plain addition behind the applied-batch replay sidecar; the "
    "models, vocab-level scoring, excess losses and the multiplicative-"
    "weights softmax all run AT DRAIN over the folded table via the "
    "SAME _doremi_from_tf finalize the batch query uses — counts "
    "commute, so the drained weights equal the one-shot batch answer "
    "bit-for-bit under any slicing and the batch oracle covers every "
    "batching.  This is how mixture design actually firms up during a "
    "crawl: domain difficulty (and hence sampling weights) stabilize "
    "long before ingestion finishes.  State is O(sources x vocab) — "
    "the exact-statistic cost, same class as the LCP and heavy-hitter "
    "folds; per batch nothing shuffles but the batch's own counts.",
)
def streaming_doremi_ingest(spark, sf_dir):
    import atexit
    import shutil
    import tempfile

    from newyork_taxi_etl_spark.streaming import windows as W

    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    work = tempfile.mkdtemp(prefix="nyetl_doremiingest_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    return W.run_streaming_doremi_ingest(spark, docs, work)
