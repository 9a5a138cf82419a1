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

from newyork_taxi_etl_spark.functions.text import (
    minhash_expr,
    with_shingles,
)


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
    out = with_shingles(df, text_col, n, out="_sh")
    for i in range(k):
        out = out.withColumn(f"mh_{i}", minhash_expr("_sh", i))
    return out.drop("_sh")


def lsh_band_rows(
    sigs: DataFrame,
    id_col: str = "doc_id",
    k: int = 4,
    rows_per_band: int = 2,
) -> DataFrame:
    """Exploded LSH band keys ``(id, band_idx, band_hash)`` from MinHash
    signature columns — the one band construction shared by the batch
    pair join (:func:`lsh_candidate_pairs`) and the incremental streaming
    index (``streaming.windows.run_streaming_lsh_index``), so the two
    paths cannot drift."""
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
    return sigs.select(F.col(id_col), F.explode(bands).alias("band")).select(
        id_col, "band.band_idx", "band.band_hash"
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    k: int = 4,
    rows_per_band: int = 2,
    max_band_size: int | None = None,
) -> DataFrame:
    """Banded LSH: hash r consecutive signatures per band, explode, self-join
    on (band_idx, band_hash), emit distinct id pairs (a < b).

    ``max_band_size`` is the hot-band escape hatch (the banding twin of
    ``shingle_jaccard_pairs``'s ``max_df_frac``): a band bucket holding m
    documents emits m*(m-1)/2 pairs, so ONE degenerate bucket — boilerplate
    docs whose shingle sets collapse to the same MinHash signatures — turns
    the bucket join quadratic no matter how selective the other buckets
    are. When set, buckets with more than ``max_band_size`` members are
    dropped BEFORE the self-join (their members are near-identical
    boilerplate; exact dedup or a dedicated boilerplate pass handles them
    far cheaper than pair enumeration). The hot-bucket set is tiny by
    construction (only above-cap buckets), so its anti-join broadcasts;
    the bucket-count aggregate is one map-side-combinable pass over the
    exploded band keys. Semantics are reproducible in SQL (identical
    HAVING cap in the oracle), so capped results stay value-checkable.
    """
    exploded = lsh_band_rows(sigs, id_col, k, rows_per_band)
    # The self-join references this subtree twice, and the hot-bucket
    # aggregate adds two more references — Spark shares nothing between
    # plan branches (same reason operators/graph.py checkpoints edges),
    # so without this the md5-over-shingles signature work runs up to 4x.
    exploded = exploded.localCheckpoint(eager=True)
    if max_band_size is not None:
        hot = (
            exploded.groupBy("band_idx", "band_hash")
            .agg(F.count(F.lit(1)).alias("_m"))
            .filter(F.col("_m") > max_band_size)
            .select("band_idx", "band_hash")
        )
        exploded = exploded.join(
            F.broadcast(hot), ["band_idx", "band_hash"], "left_anti"
        )
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
    max_df_frac: float | None = None,
    metric: str = "jaccard",
) -> DataFrame:
    """Exact n-gram-shingle Jaccard via an inverted-index candidate join.

    Explodes each doc's distinct shingle set and equi-joins on
    (block, shingle): only pairs that SHARE a shingle ever meet, so the
    quadratic all-pairs term is replaced by sum_g f_g^2 over shingle
    frequencies (bounded by the hottest shingle, not the block size). The
    per-pair |intersection| falls out of a hash aggregate on the pair key,
    and |union| = |a| + |b| - shared — no per-pair array ops at all. The
    result is identical to blocked all-pairs for any threshold > 0, since a
    zero-overlap pair has jaccard exactly 0.

    ``max_df_frac`` is the 100 TB knob: a shingle present in more than that
    fraction of a block's documents (boilerplate — headers, licenses,
    navigation chrome) contributes f^2 join mass while carrying ~zero
    dedup signal, and one such hot shingle can dominate the whole job.
    When set, shingles with df > max_df_frac * block_doc_count are dropped
    BEFORE the self-join (classic stopword-shingle pruning) and Jaccard is
    computed over the pruned shingle sets — so the doc sizes used in
    |union| are recomputed post-prune, keeping the semantics internally
    consistent (and mirrorable in an oracle).

    Shuffle shape: one hash shuffle on (block, shingle), one on the pair
    key — both parallel and skew-bounded; the cap bounds the one term that
    could otherwise go quadratic (a degenerate hot shingle). The hot set
    itself is tiny by construction (only above-cap shingles), so its
    anti-join broadcasts.
    """
    # A small parquet table arrives as one input split; repartition before the
    # shingle explode so tokenization parallelizes (at 100 TB the scan itself
    # provides the splits and this is a cheap narrow-ish extra exchange).
    n_part = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    # Materialize the per-doc distinct-shingle ARRAY table once (O(corpus)
    # rows, one array column): every downstream consumer explodes from the
    # materialized arrays. Without this, Catalyst inlines the shingle
    # transform (an interpreted higher-order lambda — tokenize + concat per
    # element) into each consumer's Generate, re-evaluating it per branch:
    # measured 4.9s vs 0.9s+0.15s on sf0.1. At 100 TB this is the standard
    # "tokenize once" stage of any shingling pipeline, not a luxury cache.
    sh = (
        with_shingles(df.repartition(n_part, F.col(id_col)), text_col, n)
        .select(
            F.col(id_col),
            F.col(block_col).alias("blk"),
            F.array_distinct(F.col("sh")).alias("sh"),
        )
        .withColumn("n_sh", F.size("sh"))
        .localCheckpoint(eager=True)
    )
    inv = sh.select(id_col, "blk", "n_sh", F.explode("sh").alias("g"))

    if max_df_frac is not None:
        n_docs = sh.groupBy("blk").agg(F.count(F.lit(1)).alias("n_docs"))
        hot = (
            inv.groupBy("blk", "g")
            .agg(F.count(F.lit(1)).alias("df"))
            .join(n_docs, "blk")
            .filter(F.col("df") > F.col("n_docs") * F.lit(max_df_frac))
            .select("blk", "g")
        )
        inv = inv.join(F.broadcast(hot), ["blk", "g"], "left_anti")
        # per-doc sizes over the PRUNED sets (joined back onto the pair
        # aggregate; linear shuffles, nothing quadratic)
        sizes = inv.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
        a, b = inv.alias("a"), inv.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.blk") == F.col("b.blk"))
                & (F.col("a.g") == F.col("b.g"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .groupBy(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .agg(F.count(F.lit(1)).alias("shared"))
            .join(
                sizes.select(
                    F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")
                ),
                "id_a",
            )
            .join(
                sizes.select(
                    F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")
                ),
                "id_b",
            )
        )
    else:
        a, b = inv.alias("a"), inv.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.blk") == F.col("b.blk"))
                & (F.col("a.g") == F.col("b.g"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .groupBy(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
                F.col("a.n_sh").alias("n_a"),
                F.col("b.n_sh").alias("n_b"),
            )
            .agg(F.count(F.lit(1)).alias("shared"))
        )
    if metric == "containment":
        # Asymmetric containment against the SMALLER set: shared/min(|A|,|B|)
        # = max(C(A->B), C(B->A)). Catches quote/subset duplication (a short
        # doc embedded verbatim in a longer one) that symmetric Jaccard
        # provably misses: a 10-shingle doc inside a 200-shingle doc has
        # containment 1.0 but Jaccard 0.05.
        m = F.col("shared").cast("double") / F.least(
            F.col("n_a"), F.col("n_b")
        )
        return (
            pairs.select(
                "id_a",
                "id_b",
                F.col("shared").cast("bigint").alias("shared"),
                F.round(m, 6).alias("containment"),
            )
            .filter(F.col("containment") >= threshold)
        )
    j = F.col("shared").cast("double") / (
        F.col("n_a") + F.col("n_b") - F.col("shared")
    )
    return (
        pairs.select("id_a", "id_b", F.round(j, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def with_simhash(
    df: DataFrame, text_col: str = "text", bits: int = 16
) -> DataFrame:
    """SimHash over the distinct-token set: bit i votes +1/-1 by the high
    bit of hex digit i of each token's md5; majority wins.

    Engine-portable (md5 + substring), no UDF; ``bits`` <= 32 (md5 hex len).
    Each token is hashed ONCE into a digest array; the per-bit votes then
    only inspect one hex digit of the precomputed digest (16x fewer md5
    evaluations than hashing inside each bit's aggregate).
    """
    digests = f"transform(array_distinct(split({text_col}, ' ')), t -> md5(t))"
    sim = (
        f"aggregate({digests}, array_repeat(0, {bits}), "
        f"(acc, h) -> zip_with(acc, sequence(1, {bits}), (a, i) -> a + "
        f"(CASE WHEN substring(h, i, 1) IN "
        f"('0','1','2','3','4','5','6','7') THEN 1 ELSE -1 END)), "
        f"acc -> concat_ws('', "
        f"transform(acc, v -> CASE WHEN v >= 0 THEN '1' ELSE '0' END)))"
    )
    return df.withColumn("simhash", F.expr(sim))


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


def cdc_segments(
    docs: DataFrame, boundary_mod: int = 8, min_tokens: int = 5
) -> DataFrame:
    """CONTENT-DEFINED segmentation of documents (the rsync/CDC
    discipline shared by passage dedup and boilerplate stripping): a
    token opens a new segment when ``int(md5(token)[:4], 16) %
    boundary_mod == 0``, so identical spans segment identically at any
    offset in any document.  Returns ``(chunk_id, doc_id, sid, ntok,
    ctext)`` for segments of at least ``min_tokens`` tokens; chunk_id =
    doc_id * 1000 + sid (a join key only).  Per-doc windows — the
    segment numbering partitions by doc_id, so the shape is
    embarrassingly parallel at any corpus size."""
    from pyspark.sql import Window

    toks = F.split(F.col("text"), " ")
    tok_rows = docs.select(
        "doc_id", F.posexplode(toks).alias("pos", "tok")
    ).withColumn(
        "b",
        (
            F.expr("CAST(conv(substr(md5(tok), 1, 4), 16, 10) AS BIGINT)")
            % boundary_mod
            == 0
        ).cast("int"),
    )
    wseg = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seg = tok_rows.withColumn("sid", F.sum("b").over(wseg))
    return (
        seg.groupBy("doc_id", "sid")
        .agg(
            F.count(F.lit(1)).alias("ntok"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x["tok"],
                ),
                " ",
            ).alias("ctext"),
        )
        .filter(F.col("ntok") >= min_tokens)
        .select(
            (F.col("doc_id") * 1000 + F.col("sid")).alias("chunk_id"),
            "doc_id",
            "sid",
            "ntok",
            "ctext",
        )
    )


def passage_dup_pairs(
    docs: DataFrame,
    boundary_mod: int = 8,
    min_tokens: int = 5,
    threshold: float = 0.8,
    max_band_size: int | None = 64,
) -> DataFrame:
    """Cross-document PASSAGE-level near-dup pairs via CONTENT-DEFINED
    chunking + MinHash-LSH.

    Fixed-grid windows cannot catch a boilerplate section shared at
    different offsets (the chunk grids misalign), so passages are cut at
    CONTENT-DEFINED boundaries instead — a token opens a new segment when
    ``int(md5(token)[:4], 16) % boundary_mod == 0`` (the rsync/CDC
    discipline): identical sections segment identically wherever they sit
    in a document.  Segments shorter than ``min_tokens`` are dropped (a
    small-vocabulary corpus genuinely repeats tiny spans — those are not
    boilerplate), each surviving segment gets 4 MinHash signatures over
    its distinct 3-gram shingles, banded 2x2 into LSH buckets (hot-bucket
    cap as in :func:`lsh_candidate_pairs`), and CROSS-DOC segment pairs
    from shared buckets are gated at exact shingle-Jaccard >=
    ``threshold``.  Output per doc pair: duplicated-segment count + max
    segment jaccard.  Planted-section recall (arbitrary alignment) is
    floored in tests/test_dedup.py.  Segment ids are
    ``doc_id * 1000 + seg_index`` (seg_index < token count << 1000; the
    id is only a join key).
    """
    from newyork_taxi_etl_spark.functions.text import (
        minhash_expr,
        with_shingles,
    )

    chunks = cdc_segments(docs, boundary_mod, min_tokens).select(
        "chunk_id", "doc_id", "ctext"
    )
    csh = (
        with_shingles(chunks, "ctext", 3, out="sh_raw")
        .select("chunk_id", "doc_id", F.array_distinct("sh_raw").alias("s"))
        .filter(F.size("s") > 0)
        .localCheckpoint(eager=True)  # referenced by sigs + both pair sides
    )
    sigs = csh.select(
        "chunk_id",
        "doc_id",
        *[minhash_expr("s", i).alias(f"mh_{i}") for i in range(4)],
    )
    bands = lsh_band_rows(sigs, id_col="chunk_id", k=4, rows_per_band=2)
    bands = bands.withColumn(
        "doc_id", F.expr("chunk_id div 1000")
    ).localCheckpoint(eager=True)  # hot agg + both join sides
    if max_band_size is not None:
        hot = (
            bands.groupBy("band_idx", "band_hash")
            .agg(F.count(F.lit(1)).alias("_m"))
            .filter(F.col("_m") > max_band_size)
            .select("band_idx", "band_hash")
        )
        bands = bands.join(
            F.broadcast(hot), ["band_idx", "band_hash"], "left_anti"
        )
    a, b = bands.alias("a"), bands.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.chunk_id").alias("ca"), F.col("b.chunk_id").alias("cb")
        )
        .distinct()
    )
    sa = csh.select(
        F.col("chunk_id").alias("ca"),
        F.col("doc_id").alias("id_a"),
        F.col("s").alias("s_a"),
    )
    sb = csh.select(
        F.col("chunk_id").alias("cb"),
        F.col("doc_id").alias("id_b"),
        F.col("s").alias("s_b"),
    )
    inter = F.size(F.array_intersect("s_a", "s_b"))
    j = F.round(
        inter.cast("double") / (F.size("s_a") + F.size("s_b") - inter), 6
    )
    return (
        cand.join(sa, "ca")
        .join(sb, "cb")
        .select("id_a", "id_b", j.alias("j"))
        .filter(F.col("j") >= threshold)
        .groupBy("id_a", "id_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_dup_chunks"),
            F.max("j").alias("max_jaccard"),
        )
        .orderBy("id_a", "id_b")
    )


def exact_substring_runs(
    docs: DataFrame,
    k: int = 8,
    max_occ: int = 64,
    min_tokens: int = 12,
) -> DataFrame:
    """Verbatim >= ``min_tokens``-token substrings shared ACROSS documents
    — the relational approximation of the suffix-array pass in Lee et al.
    2022, "Deduplicating Training Data Makes Language Models Better"
    (§4.1, ExactSubstr): where that work sorts a corpus-wide suffix array
    to find maximal duplicated spans, the same spans fall out of

    1. POSITIONAL k-token shingles (doc_id, pos, gram) — one projection;
    2. an occurrence-capped inverted index on the gram (grams occurring
       more than ``max_occ`` times carry f² join mass and no span signal
       — the hot-band guard the LSH family already applies; a capped
       gram can only SPLIT a reported run, never invent one);
    3. a self-join within gram groups keeping both positions, so a pair
       sharing a maximal L-token verbatim span produces exactly
       L - k + 1 matches on ONE diagonal (pos_a - pos_b constant);
    4. islands-and-gaps per (pair, diagonal): run_key = pos_a -
       row_number() is constant exactly on consecutive-position runs —
       a window bounded by the PAIR's match count, never the corpus.

    longest_run_tokens = max run length + k - 1 recovers the span length
    in tokens.  Distinguishing property vs the Jaccard/containment
    family: a scrambled doc with an identical token MULTISET shares no
    k-gram diagonal run, while a verbatim quote of min_tokens tokens is
    found at ANY offset pair.  Scale: join mass is capped at max_occ²
    per gram; everything else is projections and map-side-combinable
    aggregates.
    """
    from pyspark.sql import Window

    from newyork_taxi_etl_spark.session import spread

    # spread: the interpreted shingle transform must not serialize onto
    # a degenerate one-split scan (structural no-op on a real cluster).
    # The positional inverted index is then consumed FOUR times (hot
    # count + both sides of the pair self-join): pin it once so the
    # shingle transform runs one pass — at real scale this is the stage
    # you'd persist to the index store (the ANN-index discipline), and
    # its size is O(corpus tokens), the same as the text it came from.
    # slice/array_join shingling: ONE token-array reference per shingle.
    # with_shingles' element_at form pays k references per shingle — at
    # k=8, CollapseProject folds the token binding into the transform and
    # every reference re-splits the text (measured 15 s vs 0.6 s on the
    # sf0.1 corpus, local[32]).
    sh = (
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
        .localCheckpoint()
    )
    hot = (
        sh.groupBy("g")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") > max_occ)
        .select("g")
    )
    pruned = sh.join(hot, "g", "left_anti")  # AQE broadcasts the small hot set
    a, b = pruned.alias("a"), pruned.alias("b")
    pairs = a.join(
        b,
        (F.col("a.g") == F.col("b.g"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.col("a.pos").alias("pos_a"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_a")
    runs = pairs.withColumn(
        "run_key", F.col("pos_a") - F.row_number().over(w)
    )
    return (
        runs.groupBy("id_a", "id_b", "diag", "run_key")
        .agg(F.count(F.lit(1)).alias("n_sh"))
        .groupBy("id_a", "id_b")
        .agg(
            (F.max("n_sh") + F.lit(k - 1))
            .cast("bigint")
            .alias("longest_run_tokens"),
            F.sum("n_sh").cast("bigint").alias("n_shared_shingles"),
        )
        .filter(F.col("longest_run_tokens") >= min_tokens)
    )


def substring_strip_ledger(
    docs: DataFrame,
    k: int = 8,
    max_occ: int = 64,
    min_tokens: int = 12,
) -> DataFrame:
    """The DELETE step of ExactSubstr dedup (Lee et al. 2022 remove the
    duplicated span, not the document): every verbatim run found by
    :func:`exact_substring_runs`'s machinery marks its token interval in
    the HIGHER-id doc of the pair (first occurrence wins, the
    exact-dedup keeper rule applied at span granularity); per-doc
    intervals union (classic merge-overlapping-intervals: sort by start,
    running max of end, island ids — a window bounded by ONE doc's span
    count) and the ledger reports per-doc tokens removed.

    Returns (doc_id, n_spans, tokens_removed) for affected docs only.
    """
    from pyspark.sql import Window

    from newyork_taxi_etl_spark.session import spread

    sh = (
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
        .localCheckpoint()
    )
    hot = (
        sh.groupBy("g")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") > max_occ)
        .select("g")
    )
    pruned = sh.join(hot, "g", "left_anti")
    a, b = pruned.alias("a"), pruned.alias("b")
    pairs = a.join(
        b,
        (F.col("a.g") == F.col("b.g"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.col("b.pos").alias("pos_b"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_b")
    runs = (
        pairs.withColumn("run_key", F.col("pos_b") - F.row_number().over(w))
        .groupBy("id_a", "id_b", "diag", "run_key")
        .agg(
            F.min("pos_b").alias("s"),
            (F.max("pos_b") + F.lit(k - 1)).alias("e"),
        )
        .filter(F.col("e") - F.col("s") + 1 >= min_tokens)
    )
    # union intervals per victim doc (id_b keeps nothing; id_a keeps all)
    ivw = Window.partitionBy("id_b").orderBy("s", "e")
    merged = (
        runs.select("id_b", "s", "e")
        .withColumn(
            "prev_max",
            F.max("e").over(ivw.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "new_island",
            (
                F.col("prev_max").isNull()
                | (F.col("s") > F.col("prev_max"))
            ).cast("int"),
        )
        .withColumn(
            "island",
            F.sum("new_island").over(
                ivw.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("id_b", "island")
        .agg(
            F.min("s").alias("s"),
            F.max("e").alias("e"),
        )
    )
    return merged.groupBy(F.col("id_b").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias(
            "tokens_removed"
        ),
    )


def substring_diag_runs(
    docs: DataFrame, k: int = 8, max_occ: int = 64
) -> DataFrame:
    """The shared diagonal-run table of the ExactSubstr family (r16,
    guide §2.4): :func:`exact_substring_runs` and
    :func:`substring_strip_ledger` build the IDENTICAL capped positional
    inverted index, pair-diagonal join and islands-and-gaps grouping —
    they differ only in the final aggregation.  Within a (pair, diag)
    group pos_a = pos_b + diag, so ordering by pos_a and by pos_b is the
    same order and the two operators' run groups coincide; this emits one
    row per maximal run carrying everything both finishers need:
    (id_a, id_b, diag, n_sh, s, e) with s = min(pos_b),
    e = max(pos_b) + k - 1 (victim-doc token interval), n_sh = run
    length in shingles.  No min_tokens filter — finishers apply their
    own."""
    from pyspark.sql import Window

    from newyork_taxi_etl_spark.session import spread

    sh = (
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
        .localCheckpoint()
    )
    hot = (
        sh.groupBy("g")
        .agg(F.count(F.lit(1)).alias("occ"))
        .filter(F.col("occ") > max_occ)
        .select("g")
    )
    pruned = sh.join(hot, "g", "left_anti")
    a, b = pruned.alias("a"), pruned.alias("b")
    pairs = a.join(
        b,
        (F.col("a.g") == F.col("b.g"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(
        F.col("a.doc_id").alias("id_a"),
        F.col("b.doc_id").alias("id_b"),
        F.col("b.pos").alias("pos_b"),
        (F.col("a.pos") - F.col("b.pos")).alias("diag"),
    )
    w = Window.partitionBy("id_a", "id_b", "diag").orderBy("pos_b")
    return (
        pairs.withColumn("run_key", F.col("pos_b") - F.row_number().over(w))
        .groupBy("id_a", "id_b", "diag", "run_key")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sh"),
            F.min("pos_b").cast("bigint").alias("s"),
            (F.max("pos_b") + F.lit(k - 1)).cast("bigint").alias("e"),
        )
        .drop("run_key")
    )


def exact_substring_runs_from(
    runs: DataFrame, k: int = 8, min_tokens: int = 12
) -> DataFrame:
    """:func:`exact_substring_runs`'s final aggregation over a
    :func:`substring_diag_runs` table (value-identical: n_sh and the
    per-pair max/sum are the same numbers the inline path aggregates)."""
    return (
        runs.groupBy("id_a", "id_b")
        .agg(
            (F.max("n_sh") + F.lit(k - 1))
            .cast("bigint")
            .alias("longest_run_tokens"),
            F.sum("n_sh").cast("bigint").alias("n_shared_shingles"),
        )
        .filter(F.col("longest_run_tokens") >= min_tokens)
    )


def substring_strip_ledger_from(
    runs: DataFrame, min_tokens: int = 12
) -> DataFrame:
    """:func:`substring_strip_ledger`'s interval-union finisher over a
    :func:`substring_diag_runs` table (value-identical: the run (s, e)
    intervals are the same rows the inline path merges)."""
    from pyspark.sql import Window

    spans = runs.select("id_b", "s", "e").filter(
        F.col("e") - F.col("s") + 1 >= min_tokens
    )
    ivw = Window.partitionBy("id_b").orderBy("s", "e")
    merged = (
        spans.withColumn(
            "prev_max",
            F.max("e").over(ivw.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "new_island",
            (
                F.col("prev_max").isNull()
                | (F.col("s") > F.col("prev_max"))
            ).cast("int"),
        )
        .withColumn(
            "island",
            F.sum("new_island").over(
                ivw.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("id_b", "island")
        .agg(
            F.min("s").alias("s"),
            F.max("e").alias("e"),
        )
    )
    return merged.groupBy(F.col("id_b").alias("doc_id")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_spans"),
        F.sum(F.col("e") - F.col("s") + 1).cast("bigint").alias(
            "tokens_removed"
        ),
    )
