"""Multimodal queries: binary-column plumbing through Arrow/pandas batches.

``multimodal_features`` routes every blob through the real mapInPandas
pipeline (decode-stub → byte stats) and is value-checked against a SQL
oracle on the deterministic features; entropy + codec-stub error paths are
unit-tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from newyork_taxi_etl_spark.operators import multimodal as M
from newyork_taxi_etl_spark.registry import register
from newyork_taxi_etl_spark.sources.readers import table_path


@register(
    "multimodal_features",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(ascii(substring(text, 1, 1)) AS INT) AS first_byte
    FROM documents
    ORDER BY doc_id
    """,
    doc="binary-column pipeline: blob + metadata struct -> mapInPandas "
    "(Arrow batches) -> deterministic byte features; the Python boundary is "
    "value-checked against the oracle",
)
def multimodal_features(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    feats = M.extract_features(M.attach_blob(docs))
    return feats.select("doc_id", "n_bytes", "first_byte")


@register(
    "multimodal_frame_sample",
    """
    SELECT doc_id,
           CAST(i - 1 AS INT) AS frame_idx,
           substring(text, (i - 1) * 64 + 1, 1) AS frame_char
    FROM documents,
         unnest(range(1, greatest(length(text) // 64, 1) + 1)) AS t(i)
    ORDER BY doc_id, frame_idx
    """,
    doc="frame-sampling shape: fixed-rate byte sampling from the opaque "
    "payload via posexplode(transform(sequence(...)))",
)
def multimodal_frame_sample(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    sampled = M.frame_sample(M.attach_blob(docs), every_n_bytes=64)
    return sampled.select(
        "doc_id",
        F.col("frame_idx").cast("int").alias("frame_idx"),
        F.decode(F.col("frame_byte"), "UTF-8").alias("frame_char"),
    )


@register(
    "multimodal_resize",
    """
    SELECT doc_id,
           32 AS thumb_len,
           md5(rpad(substr(text, 1, 32), 32, ' ')) AS thumb_md5
    FROM documents
    """,
    doc="resize shape over opaque payloads: truncate-or-pad each blob to a "
    "32-byte budget in mapInPandas (Arrow batches, partition-preserving), "
    "emitting (len, digest) — the thumbnail/clip dataflow with the codec "
    "swapped for a deterministic byte slice",
)
def multimodal_resize(spark, sf_dir):
    docs = spark.read.parquet(table_path(sf_dir, "documents"))
    return M.resize_blobs(M.attach_blob(docs), target_bytes=32)
