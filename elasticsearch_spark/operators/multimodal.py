"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow batches via
``mapInPandas``.

The DECODERS ARE DETERMINISTIC STUBS — this container ships no
image/audio codecs (no PIL/ffmpeg), so ``decode_image``/"frames" derive
pixel data from the bytes with a seeded hash.  Swapping in a real
decoder changes ONLY the marked function body; everything Spark-side —
schemas, mapInPandas signatures, batch iteration, partitioning, the
explode shape for frame sampling — is real and tested.
"""

from __future__ import annotations

import hashlib
import zlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("phash", T.LongType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def decode_image(data: bytes) -> np.ndarray:
    """STUB DECODER — deterministic fake.

    A real deployment replaces this body with e.g.
    ``np.asarray(PIL.Image.open(io.BytesIO(data)))``; the fake derives a
    (h, w, 3) uint8 array purely from the bytes so tests are stable.
    """
    if not data:
        raise ValueError("empty image payload")
    h = 8 + (data[0] % 8)
    w = 8 + (data[-1] % 8)
    seed = zlib.crc32(data)
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    return rng.randint(0, 256, size=(h, w, 3), dtype=np.uint8)


def _phash(img: np.ndarray) -> int:
    """Average-hash over an 8x8 luma downsample -> 64-bit int."""
    luma = img.mean(axis=2)
    hh, ww = luma.shape
    ys = np.linspace(0, hh, 9, dtype=int)
    xs = np.linspace(0, ww, 9, dtype=int)
    cells = np.array(
        [luma[ys[i]:ys[i + 1], xs[j]:xs[j + 1]].mean() for i in range(8) for j in range(8)]
    )
    bits = cells > cells.mean()
    out = 0
    for i, b_ in enumerate(bits):
        if b_:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out


def image_features(df: DataFrame, url_col: str = "url", binary_col: str = "data") -> DataFrame:
    """Per-image metadata + features via Arrow-batched mapInPandas."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, data in zip(pdf[url_col], pdf[binary_col]):
                try:
                    img = decode_image(bytes(data))
                except ValueError:
                    continue
                rows.append(
                    (
                        url,
                        len(data),
                        img.shape[1],
                        img.shape[0],
                        img.shape[2],
                        float(img.mean()),
                        _phash(img),
                    )
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA.fields])

    return df.select(url_col, binary_col).mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample(df: DataFrame, url_col: str = "url", binary_col: str = "data",
                 frame_bytes: int = 256, every_n: int = 2) -> DataFrame:
    """Sample every ``every_n``-th fixed-size frame from a binary stream
    (video stand-in): the row-exploding mapInPandas shape.  A real
    implementation replaces the fixed-size slicing with container
    demuxing; the fan-out plumbing is identical."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for url, data in zip(pdf[url_col], pdf[binary_col]):
                data = bytes(data)
                n_frames = len(data) // frame_bytes
                for idx in range(0, n_frames, every_n):
                    rows.append((url, idx, data[idx * frame_bytes:(idx + 1) * frame_bytes]))
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return df.select(url_col, binary_col).mapInPandas(run, FRAME_SCHEMA)


def phash_near_pairs(features: DataFrame, max_hamming: int = 3,
                     n_bands: int | None = None) -> DataFrame:
    """Near-duplicate IMAGES: (a, b, hamming ≤ max_hamming) over the
    64-bit perceptual hash computed by :func:`image_features`, via the
    same band-pigeonhole candidate machinery as token simhash
    (``operators/dedup.py::hamming_near_pairs``) — banding bounds the
    join at 10^12 images, exact xor+bit_count verification runs on
    candidates only.  This is the standard image-dedup pass of an LLM
    training-data pipeline; swapping the stub decoder for a real one
    changes nothing here."""
    from .dedup import hamming_near_pairs

    return hamming_near_pairs(
        features, id_col="url", hash_col="phash", n_bits=64,
        n_bands=n_bands, max_hamming=max_hamming,
    )


def binary_metadata(df: DataFrame, url_col: str = "url", binary_col: str = "data") -> DataFrame:
    """Cheap JVM-side metadata (no Python): size + content hash —
    the first-pass triage over multimodal blobs at scale."""
    return df.select(
        F.col(url_col).alias("url"),
        F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
        F.xxhash64(F.col(binary_col)).alias("content_hash"),
    )
