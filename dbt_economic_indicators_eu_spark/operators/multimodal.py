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
                    "content_md5": media.apply(
                        lambda b: None if b is None else hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "is_empty": media.apply(lambda b: b is None or len(b) == 0),
                }
            )

    return df.select(F.col(id_col), F.col(media_col)).mapInPandas(
        batches, schema=MEDIA_FEATURES_SCHEMA
    )


# ---- codec stubs (no image/audio libs in this container) ----------------

DECODED_IMAGE_SCHEMA = "doc_id bigint, width int, height int, channels int, pixels binary"


def decode_image(df: DataFrame, id_col: str = "doc_id", media_col: str = "media") -> DataFrame:
    """STUB: real implementation would Pillow/libjpeg-decode each batch
    inside mapInPandas and emit (width, height, channels, raw pixels).
    The Spark-side contract (binary in, struct-ish columns out, Arrow
    batching) is identical to extract_media_features."""
    raise NotImplementedError(
        "image codec not available in this environment; see extract_media_features "
        "for the identical mapInPandas plumbing exercised end-to-end"
    )


def sample_video_frames(df: DataFrame, every_n_frames: int = 30) -> DataFrame:
    """STUB: frame sampling (media binary → one row per sampled frame)
    would be mapInPandas emitting multiple rows per input row — the
    Arrow path supports 1:N fan-out natively (return longer batches)."""
    raise NotImplementedError("video codec not available in this environment")
