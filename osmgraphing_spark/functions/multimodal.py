"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A 100 TB training-data pipeline carries media as ``binary`` columns with a
metadata struct; all Spark-side plumbing here is real (schemas, Arrow batch
shapes, partition-preserving mapInPandas) while the actual codec calls are
STUBBED — the container has no image/audio libraries, so decode is either a
clearly-marked NotImplementedError (strict mode) or a deterministic fake
(test mode) keyed on the content hash. Swap ``_decode_image_impl`` for a
PIL/libvips call in production; nothing else changes.

Design rules applied:
- media bytes never hit the driver; every transform is mapInPandas over
  Arrow batches (bounded memory per batch via maxRecordsPerBatch);
- metadata travels as a typed struct column so Catalyst can prune/push
  filters on it WITHOUT touching the binary blob (check ReadSchema in
  .explain: a filter on meta.width must not read ``data``);
- derived features (embeddings, frame samples) are array columns, keeping
  downstream similarity ops (operators/similarity.py) directly applicable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BinaryType, FloatType, IntegerType, LongType, StringType,
    StructField, StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("data", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("channels", IntegerType()),
                    StructField("sample_rate", IntegerType()),
                    StructField("n_frames", IntegerType()),
                    StructField("format", StringType()),
                ]
            ),
        ),
    ]
)

STRICT = False  # True → decode raises NotImplementedError (production stub)


def _decode_image_impl(data: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """STUB — production: PIL.Image.open(io.BytesIO(data)). Here: a
    deterministic fake decode keyed on sha256(data) so tests exercise the
    full pipeline shape with reproducible values."""
    if STRICT:
        raise NotImplementedError(
            "image decode requires an image library not present in this "
            "container; set functions.multimodal.STRICT=False for the "
            "deterministic fake"
        )
    seed = int.from_bytes(hashlib.sha256(data).digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


def _resize_impl(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize — pure numpy (no codec needed), real logic."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return img[np.ix_(ys, xs)]


def image_features(
    media: DataFrame, out_w: int = 8, out_h: int = 8
) -> DataFrame:
    """decode → resize → channel-mean feature vector per image.
    → (media_id, feature array<float>). One Arrow batch at a time; the
    binary column never leaves the executor."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for row in pdf.itertuples(index=False):
                if row.kind != "image":
                    continue
                meta = row.meta
                # Arrow → pandas widens nullable struct ints to float; coerce
                img = _decode_image_impl(
                    bytes(row.data),
                    int(meta["width"]),
                    int(meta["height"]),
                    int(meta["channels"]),
                )
                small = _resize_impl(img, out_w, out_h)
                feats.append(small.mean(axis=2).astype(np.float32).ravel())
                ids.append(row.media_id)
            yield pd.DataFrame({"media_id": ids, "feature": [f.tolist() for f in feats]})

    return media.select("media_id", "kind", "data", "meta").mapInPandas(
        run, schema="media_id long, feature array<float>"
    )


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: → (media_id, frame_idx) rows for
    every n-th frame, from metadata only (no decode; the decode of chosen
    frames is the same stubbed path as images)."""
    return (
        media.where(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n)
                )
            ).alias("frame_idx"),
        )
    )


def synth_media(spark, n: int = 32) -> DataFrame:
    """Deterministic fake media table for tests (binary payload = seeded
    bytes; metadata consistent with the fake decoder)."""
    rows = []
    for i in range(n):
        kind = ["image", "audio", "video"][i % 3]
        payload = hashlib.sha256(str(i).encode()).digest() * 4
        meta = {
            "width": 16 + (i % 4) * 8 if kind == "image" else None,
            "height": 16 + (i % 3) * 8 if kind == "image" else None,
            "channels": 3 if kind == "image" else None,
            "sample_rate": 16000 if kind == "audio" else None,
            "n_frames": 100 + i if kind == "video" else None,
            "format": {"image": "png", "audio": "wav", "video": "mp4"}[kind],
        }
        rows.append((i, kind, bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
