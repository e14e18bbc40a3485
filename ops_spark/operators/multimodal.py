"""Multimodal (binary) column plumbing.

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched pandas iterators (mapInPandas) — the
modern descendant of the reference's Python-worker batching
(reference: python/ExtractPythonUDFs.scala, ArrowEvalPythonExec.scala:69;
pre-Arrow in 2.4 for mapPartitions).

Decode tiers: PPM (P6) and PNG payloads are REALLY decoded — `encode_ppm`
/`decode_ppm` handle the uncompressed raster format, and `encode_png`/
`decode_png` implement a stdlib-only PNG codec (zlib inflate + all five
scanline filter reconstructions, 8-bit truecolor RGB/RGBA,
non-interlaced) with `resize_png` as the real decode→resample→re-encode
path. Formats that genuinely need external codecs (JPEG/video) remain
STUBBED: `fake_dims` computes deterministic stand-in dimensions and
`decode_image_real` raises NotImplementedError where PIL/libav would be
called. Everything around every tier — schema contract, Arrow batch
iteration, partition sizing — is real and tested.

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
    """Real decoder hook for compressed formats. PNG is decoded in-repo
    (stdlib zlib + filter reconstruction — decode_png); JPEG genuinely
    needs a codec library not in this container."""
    if payload[:8] == _PNG_SIG:
        w, h, _, _ = decode_png(payload)
        return w, h
    raise NotImplementedError(
        "JPEG decode requires PIL/opencv; wire it here and flip use_stub=False"
    )


# --------------------------------------------------------------------------
# PNG codec — pure stdlib (zlib + struct + numpy), no PIL.
# Scope: 8-bit truecolor RGB/RGBA (color types 2/6), non-interlaced —
# the overwhelmingly common web/training-data case. All five scanline
# filters (None/Sub/Up/Average/Paeth) are implemented on both sides, so
# any conforming encoder's output of that profile decodes here.
# --------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data))
    )


def _paeth(a, b, c):
    """Paeth predictor (PNG spec §9.4), vectorized over int arrays."""
    import numpy as np

    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def encode_png(pixels, filter_type: int = 0) -> bytes:
    """REAL PNG encoder: (h, w, 3|4) uint8 array → valid non-interlaced
    8-bit truecolor PNG. filter_type picks the per-scanline filter
    (0..4) — exposed so tests can exercise every decoder reconstruction
    path; production callers keep the default."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim != 3 or px.shape[2] not in (3, 4):
        raise ValueError("expected (h, w, 3|4) uint8 pixels")
    h, w, c = px.shape
    if not 0 <= filter_type <= 4:
        raise ValueError("filter_type must be 0..4")
    rows = px.astype(np.int16)
    zero = np.zeros((1, w, c), np.int16)
    left = np.concatenate([np.zeros((h, 1, c), np.int16), rows[:, :-1]], axis=1)
    up = np.concatenate([zero, rows[:-1]], axis=0)
    upleft = np.concatenate([np.zeros((h, 1, c), np.int16), up[:, :-1]], axis=1)
    if filter_type == 0:
        filt = rows
    elif filter_type == 1:
        filt = rows - left
    elif filter_type == 2:
        filt = rows - up
    elif filter_type == 3:
        filt = rows - (left + up) // 2
    else:
        filt = rows - _paeth(left, up, upleft)
    filt = (filt & 0xFF).astype(np.uint8)
    raw = b"".join(
        bytes([filter_type]) + filt[y].tobytes() for y in range(h)
    )
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if c == 3 else 6, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes):
    """REAL PNG decode, no codec library: chunk walk with CRC checks,
    zlib inflate, full scanline filter reconstruction (all 5 filters).
    Returns (width, height, channels, pixels[h, w, c] uint8).
    Supported profile: 8-bit truecolor RGB/RGBA, non-interlaced."""
    import struct
    import zlib

    import numpy as np

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat = 8, bytearray()
    w = h = bit = color = interlace = None
    while pos + 12 <= len(payload):
        (ln,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + ln]
        (crc,) = struct.unpack(">I", payload[pos + 8 + ln : pos + 12 + ln])
        if crc != zlib.crc32(tag + data):
            raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            w, h, bit, color, _, _, interlace = struct.unpack(">IIBBBBB", data)
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            break
        pos += 12 + ln
    if w is None:
        raise ValueError("missing IHDR")
    if bit != 8 or color not in (2, 6):
        raise ValueError("only 8-bit truecolor RGB/RGBA supported")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    c = 3 if color == 2 else 4
    raw = zlib.decompress(bytes(idat))
    stride = w * c + 1
    if len(raw) != stride * h:
        raise ValueError("decompressed scanline length mismatch")
    out = np.empty((h, w * c), np.int32)
    prev = np.zeros(w * c, np.int32)
    for y in range(h):
        ft = raw[y * stride]
        line = np.frombuffer(raw, np.uint8, w * c, y * stride + 1).astype(np.int32)
        if ft == 0:
            rec = line
        elif ft == 2:
            rec = (line + prev) & 0xFF
        elif ft in (1, 3, 4):
            # left-dependent filters are a sequential recurrence over
            # pixels; loop per pixel, vectorized across the c channels
            rec = np.zeros(w * c, np.int32)
            zc = np.zeros(c, np.int32)
            for x in range(w):
                sl = slice(x * c, (x + 1) * c)
                pl = slice((x - 1) * c, x * c)
                a = rec[pl] if x else zc
                if ft == 1:
                    rec[sl] = (line[sl] + a) & 0xFF
                elif ft == 3:
                    rec[sl] = (line[sl] + (a + prev[sl]) // 2) & 0xFF
                else:
                    cc = prev[pl] if x else zc
                    rec[sl] = (line[sl] + _paeth(a, prev[sl], cc)) & 0xFF
        else:
            raise ValueError(f"bad scanline filter {ft}")
        out[y] = rec
        prev = rec
    return w, h, c, out.reshape(h, w, c).astype(np.uint8)


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


def text_to_png_pixels(data: bytes):
    """Pack arbitrary bytes into a near-square RGB raster (same isqrt
    sizing as encode_ppm) — the fixture bridge from text to real PNGs."""
    import math

    import numpy as np

    pixels = max(1, (len(data) + 2) // 3)
    w = math.isqrt(pixels)
    if w * w < pixels:
        w += 1
    h = (pixels + w - 1) // w
    raster = data + b"\x00" * (w * h * 3 - len(data))
    return np.frombuffer(raster, np.uint8).reshape(h, w, 3)


def with_png_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
    filter_type: int = 0,
) -> DataFrame:
    """Fixture adapter, real-PNG tier: each row's text bytes become a
    VALID compressed PNG (encode_png) — downstream decode is a genuine
    inflate + filter reconstruction, not a header peek."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": [
                        encode_png(
                            text_to_png_pixels(t.encode("utf-8")), filter_type
                        )
                        for t in pdf[text_col]
                    ],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        batches, "doc_id bigint, payload binary"
    )


PNG_META_SCHEMA = (
    "doc_id bigint, width int, height int, channels int, n_bytes bigint,"
    " raster_sha256 string"
)


def extract_png_meta(
    df: DataFrame, id_col: str = "doc_id", payload_col: str = "payload"
) -> DataFrame:
    """REAL decode over compressed image payloads: full PNG decode
    (decode_png) inside Arrow batches. raster_sha256 hashes the
    RECONSTRUCTED pixels, proving the filter/inflate path ran — a
    header-only parse could not produce it."""
    import hashlib

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            metas = [decode_png(b) for b in pdf[payload_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "channels": [m[2] for m in metas],
                    "n_bytes": pdf[payload_col].map(len).astype("int64"),
                    "raster_sha256": [
                        hashlib.sha256(m[3].tobytes()).hexdigest() for m in metas
                    ],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(batches, PNG_META_SCHEMA)


def resize_png(payload: bytes, target: tuple[int, int]) -> bytes:
    """REAL decode → nearest-neighbor resample → re-encode, stdlib only.
    The un-stubbed per-row resize for the one compressed format the repo
    can decode without PIL."""
    import numpy as np

    w, h, _, px = decode_png(payload)
    tw, th = target
    xs = (np.arange(tw) * w) // tw
    ys = (np.arange(th) * h) // th
    return encode_png(px[ys][:, xs])


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
    use_stub=False runs the REAL per-row position for PNG payloads
    (resize_png: decode → nearest-neighbor → re-encode, stdlib only);
    JPEG would slot PIL into the same spot. Partitioning contract:
    payload width dominates row size, so the Arrow batch memory bound is
    maxRecordsPerBatch × payload; callers repartition by a key column
    first if payloads are skewed.
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
                out = pdf[payload_col].map(lambda b: resize_png(b, (w, h)))
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
