"""Multimodal plumbing unit tests: entropy, codec stub, frame sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from newyork_taxi_etl_spark.operators import multimodal as M


def _docs(spark):
    return spark.createDataFrame(
        [(1, "aaaa"), (2, "abcd"), (3, "a")], ["doc_id", "text"]
    )


def test_entropy_and_byte_stats(spark):
    feats = {
        r.doc_id: r
        for r in M.extract_features(M.attach_blob(_docs(spark))).collect()
    }
    assert feats[1].byte_entropy == 0.0          # uniform byte -> zero entropy
    assert feats[2].byte_entropy == 2.0          # 4 distinct bytes -> log2(4)
    assert feats[1].n_bytes == 4
    assert feats[3].first_byte == ord("a")


def test_codec_stub_raises_for_unknown_media_type():
    with pytest.raises(NotImplementedError, match="no codec"):
        M.decode_media(b"\x00\x01", "image/png")


def test_frame_sample_rate(spark):
    docs = spark.createDataFrame([(1, "x" * 200)], ["doc_id", "text"])
    frames = M.frame_sample(M.attach_blob(docs), every_n_bytes=64).collect()
    assert len(frames) == 3                       # 200 // 64
    assert [f.frame_idx for f in frames] == [0, 1, 2]


def test_mapinpandas_preserves_partitioning(spark):
    """The Arrow boundary must not introduce a shuffle."""
    docs = _docs(spark).repartition(2, "doc_id")
    feats = M.extract_features(M.attach_blob(docs))
    plan = feats._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" in plan    # only the explicit one
    assert plan.count("Exchange") == 1            # mapInPandas adds none
