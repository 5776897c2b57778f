"""Multimodal column plumbing tests (operators/multimodal.py)."""

from __future__ import annotations

import hashlib

import pytest

from dbt_economic_indicators_eu_spark.operators.multimodal import (
    decode_image,
    extract_media_features,
    sample_video_frames,
)


def test_media_features_bytes_nulls_empty(spark):
    rows = [
        (1, b"hello world"),
        (2, b""),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    out = {r.doc_id: r for r in extract_media_features(df).collect()}

    assert out[1].n_bytes == 11
    assert out[1].content_md5 == hashlib.md5(b"hello world").hexdigest()
    assert out[1].is_empty is False

    assert out[2].n_bytes == 0
    assert out[2].is_empty is True

    assert out[3].n_bytes == 0
    assert out[3].content_md5 is None
    assert out[3].is_empty is True


def test_media_features_partition_invariant(spark):
    """mapInPandas output must not depend on partitioning/batch layout."""
    rows = [(i, bytes([i % 251] * i)) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    one = sorted(extract_media_features(df.coalesce(1)).collect())
    many = sorted(extract_media_features(df.repartition(8)).collect())
    assert one == many


def test_codec_stubs_raise(spark):
    df = spark.createDataFrame([(1, b"x")], "doc_id bigint, media binary")
    with pytest.raises(NotImplementedError):
        decode_image(df)
    with pytest.raises(NotImplementedError):
        sample_video_frames(df)
