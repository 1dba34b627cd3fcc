"""Multimodal column operators: images/audio/video as opaque binary
columns with typed metadata, processed by Arrow-batched pandas UDFs
over ``mapInPandas``.

The image path is REAL (this repo ships NumPy codecs); audio decode
and video frame-sampling are STUBS — the Spark-side plumbing (schema,
batching, partitioning) is real and tested, while the codec call
raises ``NotImplementedError`` unless the deterministic fake is
requested (the decoder libraries are not in this container).

Batch-size note for binary payloads: cap
``spark.sql.execution.arrow.maxRecordsPerBatch`` (the session helper
uses 2048) so a batch of image bytes stays within Python worker memory.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

IMAGE_FEATURES_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("decode_ok", BooleanType()),
    StructField("h", IntegerType()),
    StructField("w", IntegerType()),
    StructField("mean_r", DoubleType()),
    StructField("mean_g", DoubleType()),
    StructField("mean_b", DoubleType()),
    StructField("luma_std", DoubleType()),
])

THUMBNAIL_SCHEMA = StructType([
    StructField("image_id", StringType()),
    StructField("thumb", BinaryType()),   # 16x16 RGB raw
])

AUDIO_FEATURES_SCHEMA = StructType([
    StructField("clip_id", StringType()),
    StructField("n_samples", IntegerType()),
    StructField("rms", DoubleType()),
])

VIDEO_FRAMES_SCHEMA = StructType([
    StructField("video_id", StringType()),
    StructField("frame_idx", IntegerType()),
    StructField("frame", BinaryType()),
])


def image_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract image payloads (REAL — NumPy codecs).

    Input: pairs-shaped frame (image_id, bytes, w, h, fmt, ...).
    One decode per image, batch-at-a-time via mapInPandas.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mehc_curation_spark.codecs.image import DecodeError, decode_image

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    px = decode_image(r.bytes, r.fmt, int(r.w), int(r.h))
                    luma = (0.299 * px[:, :, 0] + 0.587 * px[:, :, 1]
                            + 0.114 * px[:, :, 2])
                    rows.append((r.image_id, True, px.shape[0], px.shape[1],
                                 round(float(px[:, :, 0].mean()), 4),
                                 round(float(px[:, :, 1].mean()), 4),
                                 round(float(px[:, :, 2].mean()), 4),
                                 round(float(luma.std()), 4)))
                except (DecodeError, TypeError, ValueError):
                    rows.append((r.image_id, False, None, None,
                                 None, None, None, None))
            yield pd.DataFrame(rows, columns=[f.name for f in
                                              IMAGE_FEATURES_SCHEMA.fields])

    return (df.select("image_id", "bytes", "w", "h", "fmt")
            .mapInPandas(run, IMAGE_FEATURES_SCHEMA))


def image_thumbnails(df: DataFrame, size: int = 16) -> DataFrame:
    """Resize to a size×size raw-RGB thumbnail (REAL — area-average
    resample from the phash module)."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from mehc_curation_spark.codecs.image import DecodeError, decode_image
        from mehc_curation_spark.codecs.phash import _resample_area

        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                try:
                    px = decode_image(r.bytes, r.fmt, int(r.w), int(r.h))
                    thumb = np.stack(
                        [_resample_area(px[:, :, c].astype(np.float64), size)
                         for c in range(3)], axis=2)
                    data = np.clip(np.round(thumb), 0, 255).astype(np.uint8).tobytes()
                    rows.append((r.image_id, data))
                except (DecodeError, TypeError, ValueError):
                    rows.append((r.image_id, None))
            yield pd.DataFrame(rows, columns=["image_id", "thumb"])

    return (df.select("image_id", "bytes", "w", "h", "fmt")
            .mapInPandas(run, THUMBNAIL_SCHEMA))


def audio_features(df: DataFrame, clip_col: str = "bytes",
                   id_col: str = "clip_id", use_fake: bool = False) -> DataFrame:
    """STUB: audio decode + RMS features.

    No audio codec library ships in this container; with
    ``use_fake=True`` a deterministic fake decoder (bytes → int16 PCM
    interpretation) exercises the full Spark plumbing; otherwise the
    decode step raises ``NotImplementedError``.
    """
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                data = getattr(r, clip_col)
                if not use_fake:
                    raise NotImplementedError(
                        "audio decode requires a codec library not present "
                        "in this environment; pass use_fake=True to exercise "
                        "the pipeline plumbing")
                pcm = np.frombuffer(bytes(data or b""), dtype=np.int16)
                rms = float(np.sqrt(np.mean(pcm.astype(np.float64) ** 2))) if pcm.size else 0.0
                rows.append((getattr(r, id_col), int(pcm.size), round(rms, 4)))
            yield pd.DataFrame(rows, columns=["clip_id", "n_samples", "rms"])

    return df.select(df[id_col].alias(id_col), df[clip_col].alias(clip_col)) \
             .mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def video_frame_sample(df: DataFrame, video_col: str = "bytes",
                       id_col: str = "video_id", every_n: int = 10,
                       use_fake: bool = False) -> DataFrame:
    """STUB: sample every Nth frame of a video payload.

    With ``use_fake=True`` the payload is treated as a deterministic
    sequence of 8x8 raw-RGB frames so partitioning/explode shape is
    real; otherwise raises ``NotImplementedError``.
    """
    frame_bytes = 8 * 8 * 3

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                data = bytes(getattr(r, video_col) or b"")
                if not use_fake:
                    raise NotImplementedError(
                        "video decode requires a codec library not present "
                        "in this environment; pass use_fake=True to exercise "
                        "the pipeline plumbing")
                n_frames = len(data) // frame_bytes
                for i in range(0, n_frames, every_n):
                    rows.append((getattr(r, id_col), i,
                                 data[i * frame_bytes:(i + 1) * frame_bytes]))
            yield pd.DataFrame(rows, columns=["video_id", "frame_idx", "frame"])

    return df.select(df[id_col].alias(id_col), df[video_col].alias(video_col)) \
             .mapInPandas(run, VIDEO_FRAMES_SCHEMA)
