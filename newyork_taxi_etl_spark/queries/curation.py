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
