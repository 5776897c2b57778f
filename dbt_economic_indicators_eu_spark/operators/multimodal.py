"""Multimodal column plumbing — binary media columns with typed
metadata, processed via Arrow-batched ``mapInPandas`` (driver north
star: decode / feature-extract / resize / frame-sample).

The image/audio libraries are not in this container, so the *codec*
steps are stubs (clearly marked); everything Spark-side — schema,
batch iteration, partitioning behavior, output contract — is real and
tested. At 100 TB the pattern is: media as opaque ``binary`` parquet
columns (never strings), feature extraction in Arrow batches (one
Python roundtrip per ~10k rows, not per row), and decoded outputs kept
columnar (arrays/structs) for downstream JVM processing.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_FEATURES_SCHEMA = "doc_id bigint, n_bytes int, content_md5 string, is_empty boolean"


def extract_media_features(df: DataFrame, id_col: str = "doc_id", media_col: str = "media") -> DataFrame:
    """Cheap byte-level features over a binary column via mapInPandas.

    Columns in = (id_col, media_col binary); out = MEDIA_FEATURES_SCHEMA.
    Deterministic (md5 of raw bytes) so an engine-independent oracle can
    verify the Arrow plumbing end-to-end.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            media = pdf[media_col]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": media.apply(lambda b: 0 if b is None else len(b)).astype("int32"),
                    # None media follows the codec's null convention
                    # (decode as empty bytes) — md5 of b"", not NULL,
                    # so the fingerprint is total like n_bytes/is_empty
                    "content_md5": media.apply(
                        lambda b: hashlib.md5(b"" if b is None else bytes(b)).hexdigest()
                    ),
                    "is_empty": media.apply(lambda b: b is None or len(b) == 0),
                }
            )

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        batches, schema=MEDIA_FEATURES_SCHEMA
    )


# ---- codec path: deterministic fake decoder + REAL pixel operators ------
#
# The image/audio libraries are not in this container, so the *codec*
# is a clearly-marked deterministic fake: it derives (width, height)
# from the byte length and takes the first width*height bytes as 8-bit
# grayscale pixels. Everything downstream of the fake — nearest-
# neighbor resize, frame sampling with 1:N Arrow fan-out, and all the
# Spark-side plumbing (binary in, typed columns out, batch iteration)
# — is REAL and is exactly what a Pillow/ffmpeg-backed decoder would
# feed. Because the fake is pure byte arithmetic, a DuckDB oracle can
# verify the whole pipeline value-for-value.

DECODED_IMAGE_SCHEMA = "doc_id bigint, width int, height int, channels int, pixels binary"


def _fake_dims(n_bytes: int) -> tuple[int, int]:
    """FAKE codec geometry: w in 8..16 and h capped so w*h <= n_bytes.
    A real decoder reads these from the image header. Note h is floored
    at 1, so media shorter than w bytes (including empty) yields
    w*h > n_bytes — callers must zero-pad to w*h (``_fake_pixels``) so
    the codec is total over arbitrary byte strings."""
    w = 8 + n_bytes % 9
    h = max(1, min(8 + (n_bytes // 7) % 9, n_bytes // w))
    return w, h


def _fake_pixels(b: bytes, w: int, h: int) -> bytes:
    """First w*h media bytes as the pixel buffer, zero-padded when the
    media is shorter than one row (h=1 floor in ``_fake_dims``) — keeps
    byte sums unchanged for all real-sized media while making the fake
    decoder total (empty/short media decodes to a black row instead of
    raising at reshape)."""
    return b[: w * h].ljust(w * h, b"\x00")


def decode_image(df: DataFrame, id_col: str = "doc_id", media_col: str = "media") -> DataFrame:
    """Decode a binary media column to 8-bit grayscale pixel rows.

    FAKE CODEC (no image libs in this container): dimensions come from
    ``_fake_dims`` and pixels are the first width*height raw bytes — a
    real implementation swaps only the per-row body for
    Pillow/libjpeg, the mapInPandas contract is unchanged."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "width": [], "height": [], "channels": [], "pixels": []}
            for doc_id, media in zip(pdf[id_col], pdf[media_col]):
                b = bytes(media) if media is not None else b""
                w, h = _fake_dims(len(b))
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["channels"].append(1)
                out["pixels"].append(_fake_pixels(b, w, h))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        batches, schema=DECODED_IMAGE_SCHEMA
    )


def resize_nearest(decoded: DataFrame, factor: int = 2) -> DataFrame:
    """REAL nearest-neighbor downsample on raw grayscale pixels
    (numpy strided slicing per Arrow batch): output pixel (x, y) =
    input pixel (factor*x, factor*y). Runs on whatever ``decode_image``
    (or a real codec) emits."""
    import numpy as np

    schema = "doc_id bigint, r_width int, r_height int, r_pixels binary"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "r_width": [], "r_height": [], "r_pixels": []}
            for doc_id, w, h, px in zip(pdf["doc_id"], pdf["width"], pdf["height"], pdf["pixels"]):
                # tolerate under-filled buffers (a decoder that skipped
                # the _fake_pixels padding) — zero-pad to the declared
                # geometry rather than raise mid-batch
                arr = np.frombuffer(
                    _fake_pixels(bytes(px), int(w), int(h)), dtype=np.uint8
                ).reshape(int(h), int(w))
                small = arr[::factor, ::factor]
                out["doc_id"].append(doc_id)
                out["r_width"].append(small.shape[1])
                out["r_height"].append(small.shape[0])
                out["r_pixels"].append(small.tobytes())
            yield pd.DataFrame(out)

    return decoded.mapInPandas(batches, schema=schema)


def sample_video_frames(
    df: DataFrame,
    frame_size: int = 16,
    every_n: int = 2,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Sample every ``every_n``-th fixed-size frame from a binary media
    column — one OUTPUT row per sampled frame (the Arrow path supports
    1:N fan-out natively: batches out are longer than batches in).

    FAKE CONTAINER (no video libs here): media is treated as a raw
    concatenation of ``frame_size``-byte frames; a real implementation
    swaps the frame iterator for an ffmpeg demuxer, keeping the same
    fan-out contract. frame_sum is a cheap per-frame feature proving
    each sampled frame's bytes reached Python intact."""
    schema = "doc_id bigint, frame_idx int, frame_sum bigint"

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {"doc_id": [], "frame_idx": [], "frame_sum": []}
            for doc_id, media in zip(pdf[id_col], pdf[media_col]):
                b = bytes(media) if media is not None else b""
                n_frames = len(b) // frame_size
                for idx in range(0, n_frames, every_n):
                    frame = b[idx * frame_size : (idx + 1) * frame_size]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_sum"].append(sum(frame))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(batches, schema=schema)


def decode_resize_features(
    df: DataFrame,
    factor: int = 2,
    id_col: str = "doc_id",
    media_col: str = "media",
) -> DataFrame:
    """Operator fusion of decode_image -> resize_nearest -> byte-sum
    features: ONE Arrow pass per batch instead of separate Python
    stages per operator. The unfused operators remain the composition
    surface (a real pipeline mixes and matches them); this fused body
    is what a production media pipeline compiles the common
    decode+thumbnail+stats chain into — the pixels never re-cross the
    Arrow boundary between stages. Equality with the unfused chain is
    pinned by tests/test_multimodal.py::test_fused_pipeline_matches_composed."""
    import numpy as np

    schema = (
        "doc_id bigint, width int, height int, pixel_sum bigint, "
        "r_width int, r_height int, resized_sum bigint"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = {k: [] for k in (
                "doc_id", "width", "height", "pixel_sum",
                "r_width", "r_height", "resized_sum",
            )}
            for doc_id, media in zip(pdf[id_col], pdf[media_col]):
                b = bytes(media) if media is not None else b""
                w, h = _fake_dims(len(b))
                arr = np.frombuffer(_fake_pixels(b, w, h), dtype=np.uint8).reshape(h, w)
                small = arr[::factor, ::factor]
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["pixel_sum"].append(int(arr.sum()))
                out["r_width"].append(small.shape[1])
                out["r_height"].append(small.shape[0])
                out["resized_sum"].append(int(small.sum()))
            yield pd.DataFrame(out)

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(batches, schema=schema)
