"""Streaming MinHash-LSH near-duplicate detection.

Batch near-dedup (operators/dedup.py) sees the whole corpus at once; a
training-data INGEST pipeline wants the duplicate verdict as documents
ARRIVE. The per-document work is row-local (a MinHash signature is a
pure function of the text), so the streaming plan shuffles only the
banded bucket keys:

  docs stream
    -> JVM fold: k-element MinHash signature per row         (no shuffle)
       exploded to `bands` (band, bucket_md5) rows per doc
    -> applyInPandasWithState keyed by (band, bucket):       (one shuffle)
         state = (ids, signatures) of every doc seen in this bucket
         an arriving doc emits (id_a, id_b, agreement) for each stored
         doc whose full-signature agreement fraction >= sim_threshold

Signature agreement estimates Jaccard (P[sig_i(A)=sig_i(B)] = J(A,B)),
so thresholding agreement is the streaming stand-in for the batch
tier's exact shingle verification, which needs both texts side by side
— callers wanting exactness join the emitted pairs back to a doc store
and re-verify (operators/dedup.jaccard_shingles).

The emitted PAIR SET is arrival-order independent: whichever of a
co-bucketed pair arrives first is in state (or earlier in the same
micro-batch — rows are processed in id order) when the second arrives,
and state here never expires. That makes streaming-vs-batch equality
assertable, and tests/test_streaming_extra.py pins:
streaming pairs == batch `minhash_lsh_candidates` filtered by the same
signature-agreement threshold, on the same corpus. That equality holds
for the UNBOUNDED default; production ingest must bound state via the
`state_ttl_ms` (processing-time TTL) and/or `max_bucket_state` (FIFO
retention cap — the streaming mirror of the batch tier's `max_bucket`)
knobs, accepting the documented recall window, and should enable the
RocksDB state store provider when bucket state exceeds executor heap.

The hash family is IDENTICAL to operators/dedup.py — in fact it IS the
batch code: the fold-based `minhash_signature` Column and the same
md5-of-band-slice bucket ids. `_signature` below re-implements it in
pure numpy/hashlib as an independent test oracle (pinned bit-identical
by tests/test_streaming_extra.py); Java's `\\s` in F.split is
ASCII-only, so that oracle spells the class out instead of using
Python's unicode-aware `\\s`.
"""

from __future__ import annotations

import hashlib
import re
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ops_spark._pickle import register_self
from ops_spark.operators.dedup import _MERSENNE31, permutation_params

register_self(__name__)

# Java regex \s = [ \t\n\x0B\f\r] (no UNICODE_CHARACTER_CLASS); Python's
# \s is unicode-aware — match Spark's F.split(text, r"\s+") exactly.
_JAVA_WS = re.compile(r"[ \t\n\x0b\f\r]+")

PAIR_SCHEMA = "id_a bigint, id_b bigint, agreement double"
_STATE_SCHEMA = "ids array<bigint>, sigs array<array<bigint>>"


def _signature(
    text: str | None, params: list[tuple[int, int]], n: int
) -> list[int] | None:
    """k-element MinHash signature of one document; None if the doc has
    fewer than n tokens (absent from the batch path too)."""
    toks = [t for t in _JAVA_WS.split(text or "") if t]
    if len(toks) < n:
        return None
    sh = {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    hs = np.array(
        [int(hashlib.md5(s.encode("utf-8")).hexdigest()[:8], 16) for s in sh],
        dtype=np.int64,
    )
    return [int(((a * hs + b) % _MERSENNE31).min()) for a, b in params]


def banded_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    seed: int = 42,
) -> DataFrame:
    """(id, band, bucket, sig): `bands` rows per doc, all row-local.

    Work splits by which engine is fastest at it: shingling + md5 run
    as JVM expressions (a pure-Python md5 loop cost 4.3 s of a 6.5 s
    query); the k affine minima run as ONE Arrow-batched numpy UDF over
    the hash arrays — the fold-based minhash_signature Column computes
    identical values but its nested zip_with allocates k structs per
    shingle (measured ~2 s slower per 5k docs); the band bucket ids are
    JVM md5 again. Identical on batch and streaming frames; docs with
    < n tokens have no shingles and are dropped (batch-path absence
    semantics)."""
    from ops_spark.operators.dedup import shingles
    from ops_spark.operators.text import token_hash64, tokens

    rows = k // bands
    params = permutation_params(k, seed)
    A = np.array([a for a, _ in params], dtype=np.int64)[:, None]
    B = np.array([b for _, b in params], dtype=np.int64)[:, None]

    def _minima(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdfs:
            ids, sigs = [], []
            for i, h in zip(pdf[id_col], pdf["__h"]):
                H = np.asarray(h, dtype=np.int64)
                if H.size:
                    ids.append(i)
                    sigs.append(((A * H[None, :] + B) % _MERSENNE31).min(axis=1))
            yield pd.DataFrame({id_col: ids, "sig": sigs})

    hashes = F.transform(
        shingles(tokens(text_col), n), lambda s: token_hash64(s, hex_chars=8)
    )
    base = docs.select(
        F.col(id_col).cast("long").alias(id_col), hashes.alias("__h")
    ).mapInPandas(
        # mapInPandas, not a pandas_udf: CollapseProject would rebuild
        # udf(<higher-order expression>), which ArrowEvalPython refuses
        # to take as input ("Cannot evaluate expression") — the map
        # barrier keeps the JVM hash projection on the JVM side
        _minima,
        f"{id_col} bigint, sig array<bigint>",
    )
    bucket_arr = F.array(
        *[
            F.md5(
                F.array_join(
                    F.slice(F.col("sig"), b * rows + 1, rows).cast(
                        "array<string>"
                    ),
                    ",",
                )
            )
            for b in range(bands)
        ]
    )
    return base.select(
        id_col, F.posexplode(bucket_arr).alias("band", "bucket"), "sig"
    )


def _make_bucket_dedup(
    sim_threshold: float,
    state_ttl_ms: int | None = None,
    max_bucket_state: int | None = None,
):
    def bucket_dedup(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state_ttl_ms is not None and state.hasTimedOut:
            # idle bucket past its TTL: drop the whole bucket's state —
            # the invocation carries no data rows by contract
            state.remove()
            return
        if state.exists:
            prev_ids, prev_sigs = state.get
            ids = [int(x) for x in prev_ids]
            mat = [list(map(int, s)) for s in prev_sigs]
        else:
            ids, mat = [], []
        incoming: list[tuple[int, list[int]]] = []
        for pdf in pdfs:
            for i, sig in zip(pdf.iloc[:, 0], pdf["sig"]):
                incoming.append((int(i), list(map(int, sig))))
        # id order makes the within-batch "who was first" deterministic
        incoming.sort(key=lambda t: t[0])
        out_a: list[int] = []
        out_b: list[int] = []
        out_ag: list[float] = []
        S = np.array(mat, dtype=np.int64) if mat else None
        for i, sig in incoming:
            v = np.asarray(sig, dtype=np.int64)
            if S is not None and len(S):
                agree = (S == v).mean(axis=1)
                for j in np.nonzero(agree >= sim_threshold)[0]:
                    out_a.append(min(ids[j], i))
                    out_b.append(max(ids[j], i))
                    out_ag.append(float(agree[j]))
            ids.append(i)
            mat.append(sig)
            S = v[None, :] if S is None or not len(S) else np.vstack([S, v])
        if max_bucket_state is not None and len(ids) > max_bucket_state:
            # FIFO retention: ids/mat are in arrival order (restored state
            # first, then this batch's rows), so the tail is the most
            # recent max_bucket_state documents. Evicted docs can no
            # longer match future arrivals — the documented recall trade
            # of bounding state (mirrors the batch tier's max_bucket cap).
            ids = ids[-max_bucket_state:]
            mat = mat[-max_bucket_state:]
        state.update((ids, mat))
        if state_ttl_ms is not None:
            # sliding TTL: every batch that touches the bucket renews it,
            # so only buckets idle for a full TTL window are evicted
            state.setTimeoutDuration(state_ttl_ms)
        if out_a:  # most buckets match nothing — skip the frame entirely
            yield pd.DataFrame(
                {
                    "id_a": pd.Series(out_a, dtype="int64"),
                    "id_b": pd.Series(out_b, dtype="int64"),
                    "agreement": pd.Series(out_ag, dtype="float64"),
                }
            )

    return bucket_dedup


def streaming_lsh_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 32,
    bands: int = 8,
    n: int = 3,
    seed: int = 42,
    sim_threshold: float = 0.8,
    state_ttl_ms: int | None = None,
    max_bucket_state: int | None = None,
) -> DataFrame:
    """Candidate near-duplicate pairs from a STREAM of documents.

    Emits (id_a < id_b, agreement) whenever an arriving document's full
    signature agrees with a previously-seen co-bucketed document on
    >= sim_threshold of the k MinHash components. A pair co-bucketed in
    several bands is emitted once per band with the identical agreement
    — downstream consumers distinct() the bounded output.

    State bounding — REQUIRED for unbounded 100 TB ingest, where default
    settings would retain every signature ever seen per bucket:

    - ``state_ttl_ms``: sliding processing-time TTL per bucket. A bucket
      untouched for a full TTL window is evicted wholesale (pairs are
      only detected within the window — the usual streaming-dedup
      contract). Uses GroupStateTimeout.ProcessingTimeTimeout.
    - ``max_bucket_state``: FIFO cap on documents retained per bucket —
      the streaming mirror of the batch tier's ``max_bucket``
      degenerate-bucket cap. An arriving doc still compares against the
      retained window, then the oldest entries beyond the cap are
      evicted. Bounds per-bucket state at cap * (k+1) longs regardless
      of how hot a boilerplate bucket gets.

    Both default to None (unbounded) so the batch-equality pin in
    tests/test_streaming_extra.py stays exact; production deployments
    should set at least one, plus the RocksDB state store provider when
    aggregate state exceeds executor heap.
    """
    banded = banded_signatures(
        docs, id_col=id_col, text_col=text_col, k=k, bands=bands, n=n, seed=seed
    )
    return banded.groupBy("band", "bucket").applyInPandasWithState(
        _make_bucket_dedup(sim_threshold, state_ttl_ms, max_bucket_state),
        outputStructType=PAIR_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if state_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
