"""Graph queries: near-dup pairs → duplicate clusters (north-star surface).

Completes the dedup pipeline end-to-end: the pair emitters
(``operators/dedup.py``, ``operators/similarity.py``) produce *edges*;
``dedup_clusters`` runs min-label-propagation connected components
(``operators/graph.py``) over the LSH pair graph so every near-dup document
maps to a canonical representative (the component-minimum id — the "keep
this one" decision a training-data pipeline acts on).

The oracle is a DuckDB recursive CTE computing the same transitive closure:
``component(u) = min id reachable from u`` — tractable at oracle SF because
the pair set is LSH-bounded, while the Spark side scales as rounds of
join+min (one shuffle per round, lineage truncated per round).
"""

from __future__ import annotations

from newyork_taxi_etl_spark.operators.graph import connected_components
from newyork_taxi_etl_spark.operators.similarity import cosine_pairs_lsh
from newyork_taxi_etl_spark.registry import register
from newyork_taxi_etl_spark.sources.readers import table_path

_BUCKET_SQL = (
    "concat("
    "CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END, "
    "CASE WHEN embedding[17] >= 0 THEN '1' ELSE '0' END, "
    "CASE WHEN embedding[33] >= 0 THEN '1' ELSE '0' END, "
    "CASE WHEN embedding[49] >= 0 THEN '1' ELSE '0' END)"
)

_COS_SQL = (
    "ROUND(list_dot_product(CAST(a.embedding AS DOUBLE[]),"
    " CAST(b2.embedding AS DOUBLE[]))"
    " / (sqrt(list_dot_product(CAST(a.embedding AS DOUBLE[]),"
    " CAST(a.embedding AS DOUBLE[])))"
    " * sqrt(list_dot_product(CAST(b2.embedding AS DOUBLE[]),"
    " CAST(b2.embedding AS DOUBLE[])))), 4)"
)


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE b AS (
      SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
      WHERE {_COS_SQL} >= 0.4
    ),
    sym AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach (u, v) AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
    )
    SELECT u AS node, LEAST(u, MIN(v)) AS component
    FROM reach GROUP BY u ORDER BY node
    """,
    doc="dup clustering: LSH near-dup pairs -> connected components "
    "(iterative join+min label propagation, lineage truncated per round) -> "
    "component-minimum canonical id per doc; oracle = recursive-CTE "
    "transitive closure over the identical pair set",
)
def dedup_clusters(spark, sf_dir):
    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    pairs = cosine_pairs_lsh(emb, threshold=0.4)
    return connected_components(pairs).orderBy("node")


@register(
    "dedup_canonical_docs",
    f"""
    WITH RECURSIVE b AS (
      SELECT vec_id, embedding, {_BUCKET_SQL} AS bucket FROM embeddings
    ),
    pairs AS (
      SELECT a.vec_id AS id_a, b2.vec_id AS id_b
      FROM b a JOIN b b2 ON a.bucket = b2.bucket AND a.vec_id < b2.vec_id
      WHERE {_COS_SQL} >= 0.4
    ),
    sym AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION ALL
      SELECT id_b AS u, id_a AS v FROM pairs
    ),
    reach (u, v) AS (
      SELECT u, v FROM sym
      UNION
      SELECT r.u, s.v FROM reach r JOIN sym s ON r.v = s.u
    ),
    comp AS (
      SELECT u AS node, LEAST(u, MIN(v)) AS component FROM reach GROUP BY u
    )
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d
    WHERE d.doc_id NOT IN (SELECT node FROM comp WHERE node <> component)
    ORDER BY d.doc_id
    """,
    doc="end-to-end dedup: LSH near-dup pairs over the doc embeddings "
    "(vec_id == doc_id) -> connected components -> DROP every cluster "
    "member except the component-minimum id -> surviving canonical "
    "documents. The final step is a left-anti join of the corpus against "
    "the (tiny) drop list — broadcast anti join, no corpus shuffle; this "
    "is the query a training-data pipeline actually ships",
)
def dedup_canonical_docs(spark, sf_dir):
    from pyspark.sql import functions as F

    emb = spark.read.parquet(table_path(sf_dir, "embeddings"))
    comps = connected_components(cosine_pairs_lsh(emb, threshold=0.4))
    drop = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    return (
        # drop list is bounded by the dup count (<< corpus): broadcast the
        # anti side so the corpus never shuffles
        docs.join(F.broadcast(drop), "doc_id", "left_anti")
        .select("doc_id", "lang", "source", "n_chars")
        .orderBy("doc_id")
    )
