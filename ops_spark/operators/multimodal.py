"""Multimodal (binary) column plumbing.

Treats image/audio/video payloads as opaque ``binary`` columns with typed
metadata, processed by Arrow-batched pandas iterators (mapInPandas) — the
modern descendant of the reference's Python-worker batching
(reference: python/ExtractPythonUDFs.scala, ArrowEvalPythonExec.scala:69;
pre-Arrow in 2.4 for mapPartitions).

The actual media decode is STUBBED (image/audio libs are not in this
container): `decode_image_meta` computes deterministic fake dimensions from
the byte content, and `decode_image_real` raises NotImplementedError where
PIL/libav would be called. Everything around the stub — schema contract,
Arrow batch iteration, partition sizing — is real and tested.

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

IMAGE_META_SCHEMA = (
    "doc_id bigint, n_bytes bigint, sha256 string, width int, height int"
)


def with_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Fixture adapter: derive an opaque binary column from text (the
    fixtures carry no real media). Downstream operators treat it as bytes."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def fake_dims(n_bytes: int) -> tuple[int, int]:
    """Deterministic stand-in for a decoded image's (width, height)."""
    return (n_bytes % 640 + 1, n_bytes % 480 + 1)


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real decoder hook — requires an image library not in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv; wire it here and flip use_stub=False"
    )


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
