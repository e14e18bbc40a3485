"""Multimodal (binary) column plumbing.

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched pandas iterators (mapInPandas) — the
modern descendant of the reference's Python-worker batching
(reference: python/ExtractPythonUDFs.scala, ArrowEvalPythonExec.scala:69;
pre-Arrow in 2.4 for mapPartitions).

Decode tiers: PPM (P6) payloads are REALLY decoded — `encode_ppm` builds
valid binary images (header + RGB planes) and `decode_ppm` parses the
actual header bytes, no image library needed. Formats that genuinely need
external codecs (JPEG/PNG/video) remain STUBBED: `fake_dims` computes
deterministic stand-in dimensions and `decode_image_real` raises
NotImplementedError where PIL/libav would be called. Everything around
both tiers — schema contract, Arrow batch iteration, partition sizing —
is real and tested.

Scale notes: binary payloads dominate row width, so (a) never groupBy a
binary column, (b) repartition by a key column BEFORE mapInPandas so batch
memory is bounded by maxRecordsPerBatch × payload, (c) push metadata-only
predicates (width/height/bytes) down to parquet before touching payloads.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ops_spark._pickle import register_self

# module-level fns ship to Python workers -> pickle by value
register_self(__name__)

IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, sha256 string, width int, height int"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: derive an opaque binary column from text (the
    fixtures carry no real media). Downstream operators treat it as bytes."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def with_ppm_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Fixture adapter, real-image tier: pack each row's text bytes into a
    VALID binary PPM image (encode_ppm) via Arrow-batched mapInPandas, so
    downstream decode is a genuine parse of image bytes rather than a
    restatement of a formula."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [
                        encode_ppm(t.encode("utf-8")) for t in pdf[text_col]
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        batches, "doc_id bigint, payload binary"
    )


PPM_META_SCHEMA = "doc_id bigint, width int, height int, maxval int, n_bytes bigint"


def extract_ppm_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL decode over binary image payloads: parses each PPM header
    (decode_ppm) inside Arrow batches — the un-stubbed twin of
    extract_image_meta for the one format that needs no codec library."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            dims = [decode_ppm(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "maxval": [d[2] for d in dims],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, PPM_META_SCHEMA)


def fake_dims(n_bytes: int) -> tuple[int, int]:
    """Deterministic stand-in for a decoded image's (width, height)."""
    return (n_bytes % 640 + 1, n_bytes % 480 + 1)


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real decoder hook for compressed formats — requires an image
    library not in this container (PPM needs none: see decode_ppm)."""
    raise NotImplementedError(
        "JPEG/PNG decode requires PIL/opencv; wire it here and flip use_stub=False"
    )


def encode_ppm(data: bytes) -> bytes:
    """Pack arbitrary bytes into a REAL binary PPM (P6) image: near-square
    RGB raster, zero-padded to w·h·3. Pure integer math (isqrt) so every
    engine derives identical dimensions from the byte count."""
    import math

    pixels = max(1, (len(data) + 2) // 3)
    w = math.isqrt(pixels)
    if w * w < pixels:
        w += 1
    h = (pixels + w - 1) // w
    raster = data + b"\x00" * (w * h * 3 - len(data))
    return b"P6\n%d %d\n255\n" % (w, h) + raster


def decode_ppm(payload: bytes) -> tuple[int, int, int]:
    """ACTUAL image decode (no external lib — PPM is why it's the fixture
    format): parse the P6 header byte-for-byte, validate the raster
    length, return (width, height, maxval)."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    if len(parts) < 4:
        raise ValueError("truncated PPM header")
    w, h = (int(x) for x in parts[1].split())
    maxval = int(parts[2])
    if len(parts[3]) != w * h * 3:
        raise ValueError("raster length mismatch")
    return w, h, maxval


def extract_image_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload",
    use_stub: bool = True,
) -> DataFrame:
    """Decode metadata from binary payloads via Arrow-batched mapInPandas.

    Batch shape: pandas DataFrame per Arrow batch; payload column holds
    Python bytes. Output schema is the IMAGE_META_SCHEMA contract.
    """
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            n_bytes = payloads.map(len)
            dims = [
                fake_dims(n) if use_stub else decode_image_real(p)
                for n, p in zip(n_bytes, payloads)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": n_bytes.astype("int64"),
                    "sha256": payloads.map(lambda b: hashlib.sha256(b).hexdigest()),
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, IMAGE_META_SCHEMA)


def encode_wav(data: bytes, sample_rate: int = 8000) -> bytes:
    """Pack bytes into a REAL RIFF/WAVE file: 16-bit PCM mono — each input
    byte pair becomes one little-endian sample (zero-padded to even).
    Standard 44-byte canonical header; any audio tool can open it."""
    import struct

    pcm = data + (b"\x00" if len(data) % 2 else b"")
    n_samples = len(pcm) // 2
    byte_rate = sample_rate * 2
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(pcm))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, byte_rate, 2, 16)
        + b"data"
        + struct.pack("<I", len(pcm))
        + pcm
    )


def decode_wav(payload: bytes) -> tuple[int, int, int]:
    """ACTUAL audio decode (header parse, no codec lib): validate the
    RIFF/WAVE/fmt/data chunk structure, return (sample_rate, n_samples,
    duration_ms floor)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    if payload[12:16] != b"fmt " or payload[36:40] != b"data":
        raise ValueError("unsupported chunk layout (expected canonical fmt+data)")
    _, fmt, channels, rate, _, block, bits = struct.unpack("<IHHIIHH", payload[16:36])
    if fmt != 1 or channels != 1 or bits != 16:
        raise ValueError("only 16-bit PCM mono supported")
    (data_len,) = struct.unpack("<I", payload[40:44])
    if len(payload) - 44 != data_len:
        raise ValueError("data chunk length mismatch")
    n_samples = data_len // block
    return rate, n_samples, n_samples * 1000 // rate


AUDIO_META_SCHEMA = (
    "doc_id bigint, sample_rate int, n_samples bigint, duration_ms bigint"
)


def with_wav_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    sample_rate: int = 8000,
) -> DataFrame:
    """Fixture adapter, real-audio tier: pack text bytes into valid WAV."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [
                        encode_wav(t.encode("utf-8"), sample_rate)
                        for t in pdf[text_col]
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        batches, "doc_id bigint, payload binary"
    )


def extract_wav_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL decode over audio payloads: parses each WAV header inside
    Arrow batches (decode_wav)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode_wav(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "sample_rate": [m[0] for m in metas],
                    "n_samples": [m[1] for m in metas],
                    "duration_ms": [m[2] for m in metas],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, AUDIO_META_SCHEMA)


RESIZED_SCHEMA = "doc_id bigint, payload binary, width int, height int"

FRAME_SCHEMA = "doc_id bigint, frame_idx int, frame binary, pts_ms bigint"

FEATURE_DIM = 16

FEATURE_SCHEMA = f"doc_id bigint, feature array<float>"


def resize_images(
    df: DataFrame,
    target: tuple[int, int] = (64, 64),
    id_col: str = "doc_id",
    payload_col: str = "payload",
    use_stub: bool = True,
) -> DataFrame:
    """1→1 payload transform (the resize shape): binary in, binary out.

    Stub semantics: output payload is the input truncated/cycled to
    target_w·target_h bytes — deterministic, size-correct, no image lib.
    The real decoder slots into the same per-row position (PIL resize →
    bytes). Partitioning contract: payload width dominates row size, so
    the Arrow batch memory bound is maxRecordsPerBatch × payload; callers
    repartition by a key column first if payloads are skewed.
    """
    w, h = target

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = w * h
        for pdf in it:
            if use_stub:
                out = pdf[payload_col].map(
                    lambda b: bytes(b[i % len(b)] for i in range(n)) if b else b"\x00" * n
                )
            else:
                raise NotImplementedError("wire PIL: decode → resize → encode")
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": out,
                    "width": w,
                    "height": h,
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, RESIZED_SCHEMA)


def sample_frames(
    df: DataFrame,
    every_n_bytes: int = 256,
    max_frames: int = 8,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """1→N explode shape (video frame sampling): each payload row yields up
    to max_frames (frame_idx, frame, pts_ms) rows.

    Stub semantics: 'frames' are fixed-stride byte slices with synthetic
    33 ms timestamps; a real demuxer (pyav) yields decoded frames at the
    same contract. Output cardinality is data-dependent — exactly the
    shape Spark's mapInPandas handles that a scalar pandas_udf cannot.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames, pts = [], [], [], []
            for doc_id, b in zip(pdf[id_col], pdf[payload_col]):
                n_frames = min(max_frames, max(len(b) // every_n_bytes, 1))
                for i in range(n_frames):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(b[i * every_n_bytes : (i + 1) * every_n_bytes])
                    pts.append(i * 33)
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames, "pts_ms": pts}
            )

    return df.select(id_col, payload_col).mapInPandas(batches, FRAME_SCHEMA)


def extract_features(
    df: DataFrame,
    id_col: str = "doc_id",
    payload_col: str = "payload",
) -> DataFrame:
    """Payload → fixed-dim float feature vector (the embedding shape).

    Stub semantics: FEATURE_DIM byte-histogram buckets, L1-normalized —
    deterministic and engine-reproducible, so downstream similarity
    operators (cosine_topk, embedding_dedup) compose with it in tests.
    A real model inference (ONNX/torch) replaces the histogram with a
    forward pass over the same Arrow batches.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = []
            for b in pdf[payload_col]:
                hist = np.zeros(FEATURE_DIM, dtype=np.float64)
                arr = np.frombuffer(b, dtype=np.uint8)
                if len(arr):
                    np.add.at(hist, arr % FEATURE_DIM, 1.0)
                    hist /= hist.sum()
                feats.append(hist.astype(np.float32))
            yield pd.DataFrame({"doc_id": pdf[id_col], "feature": feats})

    return df.select(id_col, payload_col).mapInPandas(batches, FEATURE_SCHEMA)
