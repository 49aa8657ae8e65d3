"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed via Arrow-batched ``mapInPandas``.

Design (build brief): image/audio/video travel as ``binary`` columns
with a metadata struct; decode / feature-extract / resize /
frame-sample run as pandas-batch functions so the Python boundary is
Arrow-vectorized, one batch at a time, memory-bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.

The actual codec calls are STUBBED (no image/audio libs in this
container): ``decoder=`` defaults to a deterministic fake that derives
"pixels" from the payload bytes, keeping schema, batching, partitioning
and UDF signatures real and testable. Swap ``decoder`` for a Pillow/
ffmpeg-backed callable in production.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType, LongType,
                               StringType, StructField, StructType)

MEDIA_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),       # image | audio | video
    StructField("payload", BinaryType()),
    StructField("mime", StringType()),
    StructField("width", LongType()),
    StructField("height", LongType()),
    StructField("duration_ms", LongType()),
])

FEATURE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("n_bytes", LongType()),
    StructField("sha", StringType()),
    StructField("feature", ArrayType(DoubleType())),
])


def fake_decode(payload: bytes, dim: int = 8):
    """Deterministic stand-in for a real decoder: md5-derived floats.

    Raises on None payload like a real decoder would on corrupt input.
    """
    if payload is None:
        raise ValueError("cannot decode empty payload")
    h = hashlib.md5(bytes(payload)).digest()
    return [b / 255.0 for b in h[:dim]]


def extract_features(df: DataFrame, decoder: Optional[Callable] = None,
                     dim: int = 8) -> DataFrame:
    """binary payload → feature vector, Arrow-batched.

    Partitioning note: payloads dominate row size — repartition by
    media_id upstream if a few huge payloads skew batches.
    """
    decoder = decoder or (lambda p: fake_decode(p, dim))

    def process(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
        import pandas as pd
        for pdf in batches:
            out = pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "n_bytes": pdf["payload"].map(lambda p: len(p) if p is not None else 0),
                "sha": pdf["payload"].map(
                    lambda p: hashlib.sha256(bytes(p)).hexdigest() if p is not None else None),
                "feature": pdf["payload"].map(
                    lambda p: decoder(p) if p is not None else None),
            })
            yield out

    return df.mapInPandas(process, FEATURE_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int,
                  resizer: Optional[Callable] = None) -> DataFrame:
    """Image resize plumbing; the real pixel work is the ``resizer``
    callable (bytes, w, h) -> bytes. STUB default raises
    NotImplementedError per the build brief (no imaging libs here)."""
    if resizer is None:
        def resizer(payload, w, h):  # pragma: no cover - stub
            raise NotImplementedError(
                "image resize requires an imaging library (e.g. Pillow); "
                "inject resizer=callable(bytes, w, h) -> bytes")

    out_schema = StructType(MEDIA_SCHEMA.fields)

    def process(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = pdf["payload"].map(lambda p: resizer(p, width, height))
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.mapInPandas(process, out_schema)


def sample_frames(df: DataFrame, every_ms: int,
                  sampler: Optional[Callable] = None) -> DataFrame:
    """Video → frame rows (media_id, frame_idx, ts_ms, payload).

    ``sampler(payload, every_ms) -> list[(idx, ts_ms, frame_bytes)]``;
    deterministic fake slices the payload so downstream plumbing is
    testable without codecs.
    """
    if sampler is None:
        def sampler(payload, step):
            if payload is None:
                return []
            n = max(1, min(4, len(payload) // 16))
            return [(i, i * step, bytes(payload[i * 16:(i + 1) * 16]))
                    for i in range(n)]

    schema = StructType([
        StructField("media_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("ts_ms", LongType()),
        StructField("frame", BinaryType()),
    ])

    def process(batches):
        import pandas as pd
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                for idx, ts, frame in sampler(r["payload"], every_ms):
                    rows.append((r["media_id"], idx, ts, frame))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "ts_ms", "frame"])

    return df.mapInPandas(process, schema)


def synthetic_media(spark, n: int = 32, kind: str = "image") -> DataFrame:
    """Deterministic fake media table for tests."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media{i}".encode()).digest() * 4
        rows.append((i, kind, bytearray(payload), f"{kind}/fake", 64, 64, 1000))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
