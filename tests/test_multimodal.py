"""Multimodal binary-column plumbing tests (decode stubbed by design)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F, types as T

from moisturizer_spark.operators.multimodal import (
    add_content_address,
    dedup_by_content,
    extract_features,
    sample_frames,
)

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("content_type", T.StringType()),
    ]
)


@pytest.fixture()
def media(spark):
    rows = [
        (1, b"\x89PNG-fake-one", "image/png"),
        (2, b"\x89PNG-fake-two", "image/png"),
        (3, b"\x89PNG-fake-one", "image/png"),  # exact dup of 1
        (4, None, "image/png"),
    ]
    return spark.createDataFrame(rows, SCHEMA)


def test_content_address_is_deterministic_sha(media):
    out = {r["doc_id"]: r["content_sha"] for r in add_content_address(media).collect()}
    assert out[1] == out[3] != out[2]
    assert len(out[1]) == 64


def test_dedup_by_content(media):
    kept = sorted(r["doc_id"] for r in dedup_by_content(media.filter("content IS NOT NULL")).collect())
    assert kept == [1, 2]  # min-id representative per payload


def test_extract_features_arrow_batch_shape(media):
    def fake_extractor(content: bytes):
        return [float(len(content)), float(content[0])]

    out = extract_features(media, extractor=fake_extractor, dim=2)
    rows = {r["doc_id"]: r["features"] for r in out.collect()}
    assert rows[1] == [13.0, 137.0]
    assert rows[4] is None  # null payload passes through as null features
    assert out.schema["features"].dataType == T.ArrayType(T.FloatType())


def test_extract_features_default_stub_raises(media):
    with pytest.raises(Exception) as exc_info:
        extract_features(media).collect()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_sample_frames(media):
    def fake_splitter(content: bytes):
        return [content[:4], content[4:8]]

    frames = sample_frames(media, splitter=fake_splitter)
    got = frames.filter(F.col("doc_id") == 1).orderBy("frame_idx").collect()
    assert [bytes(r["frame"]) for r in got] == [b"\x89PNG", b"-fak"]
    # null-payload rows produce no frames
    assert frames.filter(F.col("doc_id") == 4).count() == 0
