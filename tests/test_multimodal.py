"""Multimodal plumbing: binary blob schema, mapInPandas decode batch
shape, metadata correctness, and column pruning of the blob."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from web_analytics_visits_re_processing_spark.operators.multimodal import (
    decode_image_meta,
    resize_images,
    with_synthetic_image_blob,
)
from web_analytics_visits_re_processing_spark.sources.tables import load_table


def test_decode_image_meta_roundtrip(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    blobs = with_synthetic_image_blob(docs)
    assert dict(blobs.dtypes)["image"] == "binary"

    meta = decode_image_meta(blobs).collect()
    assert len(meta) == 50
    src = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in meta:
        payload = src[r["doc_id"]].encode("utf-8")
        assert r["format"] == "img"
        assert r["n_bytes"] == len(payload) + 8  # 4 magic + 2w + 2h
        assert r["width"] == len(payload) % 640 + 16
        assert r["height"] == len(payload) % 480 + 9


def test_codec_stub_raises(spark, sf_dir):
    docs = with_synthetic_image_blob(load_table(spark, sf_dir, "documents").limit(1))
    with pytest.raises(NotImplementedError):
        resize_images(docs, 64, 64)


def test_metadata_query_prunes_blob_column(spark, sf_dir, tmp_path):
    """Reading only metadata from a parquet with a blob column must not
    scan the blob (ReadSchema excludes it)."""
    docs = load_table(spark, sf_dir, "documents").limit(20)
    p = str(tmp_path / "blobs")
    with_synthetic_image_blob(docs).write.parquet(p)
    back = spark.read.parquet(p).select("doc_id", "n_chars")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "image" not in plan
    assert back.count() == 20
