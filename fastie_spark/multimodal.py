"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

No counterpart in the reference (FastIE is text-only); this is the
training-data-pipeline surface the task brief mandates. The Spark-side
plumbing — schemas, Arrow batch shapes, explode semantics, partitioning —
is real and tested; the actual codec step is STUBBED: real decoders (PIL /
libav) are not in this container, so ``decode_image``/``decode_audio``
parse a deterministic FAKE container format (header + seeded payload) and
raise ``NotImplementedError`` for real formats. Swapping in a real codec
changes only the marked inner functions; every dataframe contract stays.

Fake container layout (big-endian):
  b"FMM0" | kind:1 (i/a/v) | width:u16 | height:u16 | sample_rate:u32 |
  n_frames:u16 | payload bytes (seeded)
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

MAGIC = b"FMM0"

MEDIA_DDL = "media_id long, kind string, payload binary"
META_DDL = (
    "media_id long, kind string, width int, height int, sample_rate int, "
    "n_frames int, payload_len long"
)


def pack_media(media_id: int, kind: str, width: int, height: int,
               sample_rate: int, n_frames: int, seed: int = 42) -> bytes:
    rng = np.random.default_rng((seed, media_id))
    body_len = {
        "image": width * height,
        "audio": sample_rate,  # one second
        "video": width * height * max(n_frames, 1) // 16,
    }[kind]
    body = rng.integers(0, 256, size=body_len, dtype=np.uint8).tobytes()
    header = (
        MAGIC
        + kind[0].encode()
        + struct.pack(">HHIH", width, height, sample_rate, n_frames)
    )
    return header + body


def build_media_rows(n: int = 60, seed: int = 42) -> list[dict]:
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        w, h = 32 + (i % 4) * 16, 24 + (i % 3) * 16
        sr = 8000 + (i % 2) * 8000
        nf = 8 + (i % 5) * 4 if kind == "video" else 0
        rows.append(
            {"media_id": i, "kind": kind,
             "payload": pack_media(i, kind, w, h, sr, nf, seed)}
        )
    return rows


def _parse_header(payload: bytes):
    if payload[:4] != MAGIC:
        # Real containers (JPEG/WAV/MP4...) need real codecs — STUB:
        raise NotImplementedError(
            "real media decoding is stubbed in this environment; "
            "only the FMM0 fake container is supported"
        )
    kind = {b"i": "image", b"a": "audio", b"v": "video"}[payload[4:5]]
    w, h, sr, nf = struct.unpack(">HHIH", payload[5:15])
    return kind, w, h, sr, nf, payload[15:]


def parse_meta(media: DataFrame) -> DataFrame:
    """binary -> typed metadata columns (header parse; real plumbing)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                kind, w, h, sr, nf, body = _parse_header(bytes(payload))
                rows.append((int(mid), kind, w, h, sr, nf, len(body)))
            yield pd.DataFrame(
                rows, columns=["media_id", "kind", "width", "height",
                               "sample_rate", "n_frames", "payload_len"],
            )

    return media.mapInPandas(fn, schema=META_DDL)


def image_features(media: DataFrame) -> DataFrame:
    """Decode (stub) + feature-extract: per-image brightness stats.
    The inner pixel decode is the ONLY stubbed piece."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                kind, w, h, sr, nf, body = _parse_header(bytes(payload))
                if kind != "image":
                    continue
                # STUB decode: bytes -> (h, w) uint8 "pixels"
                px = np.frombuffer(body, dtype=np.uint8)[: w * h].reshape(h, w)
                rows.append(
                    (int(mid), float(px.mean()), float(px.std()),
                     int(px.size))
                )
            yield pd.DataFrame(
                rows, columns=["media_id", "mean_brightness", "std_brightness",
                               "n_pixels"],
            )

    return media.mapInPandas(
        fn, schema="media_id long, mean_brightness double, "
                   "std_brightness double, n_pixels long"
    )


def resize_image(media: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Nearest-neighbor resize on the (stub-)decoded pixels; re-packs the
    fake container so downstream stages see the same binary contract."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                kind, w, h, sr, nf, body = _parse_header(bytes(payload))
                if kind != "image":
                    continue
                px = np.frombuffer(body, dtype=np.uint8)[: w * h].reshape(h, w)
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                small = px[np.ix_(yi, xi)]
                header = (MAGIC + b"i"
                          + struct.pack(">HHIH", out_w, out_h, sr, nf))
                rows.append((int(mid), header + small.tobytes()))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    return media.mapInPandas(fn, schema="media_id long, payload binary")


def frame_sample(media: DataFrame, every_k: int = 4) -> DataFrame:
    """Video frame sampling: slice the payload into n_frames segments and
    keep every k-th -> exploded (media_id, frame_idx, frame) rows."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                kind, w, h, sr, nf, body = _parse_header(bytes(payload))
                if kind != "video" or nf == 0:
                    continue
                flen = max(len(body) // nf, 1)
                for fi in range(0, nf, every_k):
                    rows.append(
                        (int(mid), fi, body[fi * flen : (fi + 1) * flen])
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return media.mapInPandas(
        fn, schema="media_id long, frame_idx int, frame binary"
    )


def audio_features(media: DataFrame, frame_len: int = 400) -> DataFrame:
    """Framed RMS energy over the (stub-)decoded sample stream -> one
    array<float> feature vector per clip."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                kind, w, h, sr, nf, body = _parse_header(bytes(payload))
                if kind != "audio":
                    continue
                x = np.frombuffer(body, dtype=np.uint8).astype(np.float64)
                x = (x - 128.0) / 128.0
                n = len(x) // frame_len
                rms = [
                    float(np.sqrt(np.mean(x[i * frame_len:(i + 1) * frame_len] ** 2)))
                    for i in range(n)
                ]
                rows.append((int(mid), rms))
            yield pd.DataFrame(rows, columns=["media_id", "rms"])

    return media.mapInPandas(fn, schema="media_id long, rms array<double>")


def media_df(spark: SparkSession, n: int = 60, seed: int = 42) -> DataFrame:
    from .session import local_df

    return local_df(spark, build_media_rows(n, seed), MEDIA_DDL)
