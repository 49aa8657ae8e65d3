"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed via Arrow-batched ``mapInPandas``.

Design (build brief): image/audio/video travel as ``binary`` columns
with a metadata struct; decode / feature-extract / resize /
frame-sample run as pandas-batch functions so the Python boundary is
Arrow-vectorized, one batch at a time, memory-bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``.

Codec surface (round 8): HEADER decoding is REAL and stdlib-only —
``parse_image_header`` reads PNG IHDR, JPEG SOF and GIF logical-screen
headers with ``struct`` (no imaging libs needed), and ``probe_media``
runs it Arrow-batched over the payload column to validate claimed
metadata against the actual bytes.  Only PIXEL work stays injectable:
``extract_features``'s default feature is a deterministic md5 fake and
``resize_images`` requires a ``resizer=`` callable (a real resample
genuinely needs Pillow/ffmpeg, absent in this container) — schema,
batching, partitioning and UDF signatures are real and tested either
way.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Callable, Iterator, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from ..session import local_df
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


def parse_image_header(payload) -> Optional[dict]:
    """Decode image container headers with the stdlib only: PNG (IHDR),
    JPEG (first SOFn frame header, skipping APPn/DQT/DHT segments and
    stand-alone markers) and GIF (logical screen descriptor).

    Returns ``{"mime", "width", "height", "depth"}`` or None when the
    payload matches no known signature.  A truncated-but-recognized
    payload returns its mime with NULL dimensions rather than raising —
    at corpus scale corrupt bytes are data to report, not exceptions.
    """
    if not payload:
        return None
    b = bytes(payload)
    if b[:8] == b"\x89PNG\r\n\x1a\n":
        if len(b) >= 26 and b[12:16] == b"IHDR":
            w, h = struct.unpack(">II", b[16:24])
            return {"mime": "image/png", "width": w, "height": h,
                    "depth": int(b[24])}
        return {"mime": "image/png", "width": None, "height": None,
                "depth": None}
    if b[:2] == b"\xff\xd8":  # JPEG SOI
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                break
            marker = b[i + 1]
            if marker == 0xFF:          # fill byte
                i += 1
                continue
            if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
                i += 2                  # stand-alone marker, no segment
                continue
            seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
            if seg_len < 2:
                # A segment length includes its own two bytes; 0/1 is
                # corrupt — continuing would re-read payload bytes and
                # could surface a bogus SOF as a plausible frame header.
                break
            # SOF0..SOF15 carry the frame header; C4/C8/CC are
            # DHT/JPG/DAC, not frame headers
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= len(b):
                    h, w = struct.unpack(">HH", b[i + 5:i + 9])
                    return {"mime": "image/jpeg", "width": w, "height": h,
                            "depth": int(b[i + 4])}
                break
            i += 2 + seg_len
        return {"mime": "image/jpeg", "width": None, "height": None,
                "depth": None}
    if b[:6] in (b"GIF87a", b"GIF89a"):
        if len(b) >= 10:
            w, h = struct.unpack("<HH", b[6:10])
            return {"mime": "image/gif", "width": w, "height": h,
                    "depth": None}
        return {"mime": "image/gif", "width": None, "height": None,
                "depth": None}
    return None


def _parse_wav(b: bytes) -> Optional[dict]:
    """WAV/RIFF: fmt chunk → channels / sample rate / bit depth;
    data chunk's DECLARED size ÷ byte rate → duration.  The declared
    size works from a header-only prefix — the sample bytes themselves
    need not be present."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    out = {"mime": "audio/wav", "duration_ms": None,
           "sample_rate": None, "channels": None, "depth": None}
    byte_rate = data_size = None
    i = 12
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        # a fmt chunk must DECLARE >= 16 payload bytes before the
        # 16-byte unpack — a corrupt size < 16 would otherwise read
        # into the next chunk and surface garbage as a plausible
        # header (mirrors the JPEG scanner's seg_len < 2 guard)
        if cid == b"fmt " and size >= 16 and i + 24 <= len(b):
            _fmt, ch, sr, br, _align, bits = struct.unpack(
                "<HHIIHH", b[i + 8:i + 24])
            out.update(channels=int(ch), sample_rate=int(sr),
                       depth=int(bits))
            byte_rate = br
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size & 1)      # RIFF chunks are word-aligned
    if byte_rate and data_size is not None:
        out["duration_ms"] = int(round(data_size * 1000 / byte_rate))
    return out


def _parse_mp4(b: bytes) -> Optional[dict]:
    """MP4 / ISO-BMFF: signature is a leading ftyp box; duration comes
    from moov→mvhd (version 0 or 1 layout).  Encoders commonly write
    moov at EOF ('faststart' moves it up front) — a byte prefix without
    moov honestly reports duration NULL (status 'truncated')."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    out = {"mime": "video/mp4", "duration_ms": None,
           "sample_rate": None, "channels": None, "depth": None}

    def box(buf, i, end):
        """(payload_start, box_end) or None on a corrupt header."""
        if i + 8 > end:
            return None
        size = struct.unpack(">I", buf[i:i + 4])[0]
        hdr = 8
        if size == 1:                   # 64-bit largesize
            if i + 16 > end:
                return None
            size = struct.unpack(">Q", buf[i + 8:i + 16])[0]
            hdr = 16
        elif size == 0:                 # box extends to end of input
            size = end - i
        if size < hdr:
            return None
        return i + hdr, min(i + size, end)

    i = 0
    while (top := box(b, i, len(b))) is not None:
        start, end = top
        if b[i + 4:i + 8] == b"moov":
            j = start
            while (child := box(b, j, end)) is not None:
                cstart, cend = child
                if b[j + 4:j + 8] == b"mvhd" and cstart + 4 <= len(b):
                    ver = b[cstart]
                    if ver == 1 and cstart + 32 <= len(b):
                        ts = struct.unpack(">I", b[cstart + 20:cstart + 24])[0]
                        dur = struct.unpack(">Q", b[cstart + 24:cstart + 32])[0]
                    elif ver == 0 and cstart + 20 <= len(b):
                        ts = struct.unpack(">I", b[cstart + 12:cstart + 16])[0]
                        dur = struct.unpack(">I", b[cstart + 16:cstart + 20])[0]
                    else:
                        break
                    if ts:
                        out["duration_ms"] = int(round(dur * 1000 / ts))
                    break
                j = cend
        i = end
    return out


def parse_media_header(payload) -> Optional[dict]:
    """Unified stdlib header decode: the image formats of
    ``parse_image_header`` plus WAV/RIFF and MP4/ISO-BMFF.  Returns
    ``{"mime", "width", "height", "depth", "duration_ms",
    "sample_rate", "channels"}`` (absent facets NULL) or None when no
    signature matches.  Like the image path, only the first bytes of
    the payload are touched — no codec, no pixel/sample decode."""
    if not payload:
        return None
    b = bytes(payload)
    img = parse_image_header(b)
    if img is not None:
        img.setdefault("duration_ms", None)
        img.setdefault("sample_rate", None)
        img.setdefault("channels", None)
        img.setdefault("width", None)
        img.setdefault("height", None)
        return img
    for parser in (_parse_wav, _parse_mp4):
        hit = parser(b)
        if hit is not None:
            hit.setdefault("width", None)
            hit.setdefault("height", None)
            return hit
    return None


PROBE_SCHEMA = StructType([
    StructField("media_id", LongType()),
    StructField("kind", StringType()),
    StructField("mime", StringType()),           # claimed
    StructField("detected_mime", StringType()),  # from the bytes
    StructField("detected_width", LongType()),
    StructField("detected_height", LongType()),
    StructField("bit_depth", LongType()),
    StructField("detected_duration_ms", LongType()),   # WAV/MP4
    StructField("sample_rate", LongType()),            # WAV
    StructField("channels", LongType()),               # WAV
    StructField("n_bytes", LongType()),
    # "ok" (parsed; dims for images, duration for audio/video) |
    # "truncated" (signature matched, header incomplete) |
    # "unknown" (no recognized signature) |
    # "empty" (NULL / zero-byte payload)
    StructField("header_ok", StringType()),
])


def probe_media(df: DataFrame) -> DataFrame:
    """Validate claimed media metadata against the actual payload bytes
    — the corpus-scale "is this column really images/audio/video?"
    report.  Arrow-batched ``mapInPandas``; header parse touches only
    the first few hundred bytes of each payload, so the batch cost is
    bounded by payload I/O, not pixels/samples."""

    def status_of(payload, hdr):
        if payload is None or len(payload) == 0:
            return "empty"
        if hdr is None:
            return "unknown"
        complete = (hdr["width"] is not None
                    or hdr["duration_ms"] is not None)
        return "ok" if complete else "truncated"

    def process(batches: Iterator["pandas.DataFrame"]) -> Iterator["pandas.DataFrame"]:
        import pandas as pd
        for pdf in batches:
            hdrs = pdf["payload"].map(parse_media_header)

            def facet(name):
                return hdrs.map(lambda h: h[name] if h else None)

            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "mime": pdf["mime"],
                "detected_mime": facet("mime"),
                "detected_width": facet("width"),
                "detected_height": facet("height"),
                "bit_depth": facet("depth"),
                "detected_duration_ms": facet("duration_ms"),
                "sample_rate": facet("sample_rate"),
                "channels": facet("channels"),
                "n_bytes": pdf["payload"].map(
                    lambda p: len(p) if p is not None else 0),
                "header_ok": [status_of(p, h) for p, h in
                              zip(pdf["payload"], hdrs)],
            })

    return df.mapInPandas(process, PROBE_SCHEMA)


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
    callable (bytes, w, h) -> bytes.  Pixel resampling is the one
    remaining injectable (it genuinely needs Pillow/ffmpeg, absent in
    this container) — header decode is real, see ``probe_media``.  The
    default raises NotImplementedError so a missing resizer fails loud,
    not with silently-unresized payloads."""
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
    return local_df(spark, rows, MEDIA_SCHEMA)
