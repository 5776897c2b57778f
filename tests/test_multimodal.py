"""Multimodal column plumbing tests (operators/multimodal.py)."""

from __future__ import annotations

import hashlib

import pytest

from dbt_economic_indicators_eu_spark.operators.multimodal import (
    _fake_dims,
    decode_image,
    extract_media_features,
    resize_nearest,
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
    # codec null convention: None media decodes as EMPTY bytes, so its
    # fingerprint is md5(b"") — total like n_bytes/is_empty, and what
    # the DuckDB oracle computes via coalesce (null-injection parity)
    assert out[3].content_md5 == hashlib.md5(b"").hexdigest()
    assert out[3].is_empty is True


def test_media_features_partition_invariant(spark):
    """mapInPandas output must not depend on partitioning/batch layout."""
    rows = [(i, bytes([i % 251] * i)) for i in range(1, 40)]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")
    one = sorted(extract_media_features(df.coalesce(1)).collect())
    many = sorted(extract_media_features(df.repartition(8)).collect())
    assert one == many


def test_decode_geometry_and_pixels(spark):
    media = bytes(range(200))
    df = spark.createDataFrame([(1, media)], "doc_id bigint, media binary")
    r = decode_image(df).collect()[0]
    w, h = _fake_dims(len(media))
    assert (r.width, r.height, r.channels) == (w, h, 1)
    assert bytes(r.pixels) == media[: w * h]


def test_resize_matches_numpy_strided_slice(spark):
    np = pytest.importorskip("numpy")
    media = bytes((7 * i) % 256 for i in range(300))
    df = spark.createDataFrame([(1, media)], "doc_id bigint, media binary")
    r = resize_nearest(decode_image(df), factor=2).collect()[0]
    w, h = _fake_dims(len(media))
    arr = np.frombuffer(media[: w * h], dtype=np.uint8).reshape(h, w)
    expect = arr[::2, ::2]
    assert (r.r_width, r.r_height) == (expect.shape[1], expect.shape[0])
    assert bytes(r.r_pixels) == expect.tobytes()


def test_frame_sample_fanout_and_sums(spark):
    # 5 complete 16-byte frames + 3 leftover bytes -> frames 0, 2, 4
    media = bytes(range(83))
    df = spark.createDataFrame([(1, media)], "doc_id bigint, media binary")
    rows = sorted(
        sample_video_frames(df, frame_size=16, every_n=2).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in rows] == [0, 2, 4]
    for r in rows:
        frame = media[r.frame_idx * 16 : (r.frame_idx + 1) * 16]
        assert r.frame_sum == sum(frame)


def test_frame_sample_short_media_emits_nothing(spark):
    df = spark.createDataFrame([(1, b"short")], "doc_id bigint, media binary")
    assert sample_video_frames(df, frame_size=16, every_n=2).count() == 0


def test_codec_total_on_short_media(spark):
    """Media shorter than one pixel row (including empty and None) must
    decode to a zero-padded black row through decode→resize AND the
    fused operator — not raise at np.reshape. Byte sums for such rows
    count only the real bytes (padding is zeros)."""
    from dbt_economic_indicators_eu_spark.operators.multimodal import (
        decode_resize_features,
    )

    rows = [(1, b""), (2, None), (3, b"hi"), (4, b"hello!!"), (5, bytes(range(200)))]
    df = spark.createDataFrame(rows, "doc_id bigint, media binary")

    fused = {r.doc_id: r for r in decode_resize_features(df, factor=2).collect()}
    chained = {
        r.doc_id: r for r in resize_nearest(decode_image(df), factor=2).collect()
    }
    for doc_id, media in rows:
        b = media or b""
        w, h = _fake_dims(len(b))
        r = fused[doc_id]
        assert (r.width, r.height) == (w, h)
        assert r.pixel_sum == sum(b[: w * h])
        assert (chained[doc_id].r_width, chained[doc_id].r_height) == (
            r.r_width,
            r.r_height,
        )
        assert chained[doc_id].r_pixels is not None


def test_fused_pipeline_matches_composed(spark):
    """decode_resize_features (one Arrow pass) must equal the unfused
    decode -> resize -> byte-sum composition row-for-row."""
    from pyspark.sql import functions as F

    from dbt_economic_indicators_eu_spark.operators.multimodal import (
        decode_resize_features,
    )
    from dbt_economic_indicators_eu_spark.queries.datapipe import byte_sum_udf
    from dbt_economic_indicators_eu_spark.queries.common import load

    docs = load(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", F.encode("text", "utf-8").alias("media")
    )
    fused = decode_resize_features(docs, factor=2)
    decoded = decode_image(docs)
    resized = resize_nearest(decoded, factor=2)
    bs = byte_sum_udf()
    composed = decoded.select(
        "doc_id", "width", "height", bs("pixels").alias("pixel_sum")
    ).join(
        resized.select("doc_id", "r_width", "r_height", bs("r_pixels").alias("resized_sum")),
        "doc_id",
    )
    a = sorted(map(tuple, fused.collect()))
    b = sorted(map(tuple, composed.select(*fused.columns).collect()))
    assert a == b
