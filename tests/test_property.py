"""Property-based tests (SURVEY §5.5: randomized-data methodology).

The engine-independence claim behind the DuckDB oracles is that every hash
pipeline (token hash → MinHash → SimHash) is reproducible from the spec
alone. These tests implement that spec a THIRD time in pure Python from
md5 + arithmetic and check Spark agrees on hypothesis-generated documents —
one batched DataFrame per test (Spark roundtrips per-example are too slow).
"""

from __future__ import annotations

import hashlib
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from ops_spark.operators.dedup import _MERSENNE31, permutation_params

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta", "k", "42"]
docs_strategy = st.lists(
    st.lists(st.sampled_from(WORDS), min_size=0, max_size=30).map(" ".join),
    min_size=1,
    max_size=8,
)


def py_token_hash(tok: str, hex_chars: int = 15) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:hex_chars], 16)


def py_tokens(text: str) -> list[str]:
    return [t for t in text.split() if t]


def py_shingles(text: str, n: int = 3) -> list[str]:
    toks = py_tokens(text)
    if len(toks) < n:
        return []
    seen, out = set(), []
    for i in range(len(toks) - n + 1):
        s = " ".join(toks[i : i + n])
        if s not in seen:
            seen.add(s)
            out.append(s)
    return out


def py_minhash(text: str, k: int = 32, seed: int = 42) -> list[int] | None:
    hs = [py_token_hash(s, 8) for s in py_shingles(text)]
    if not hs:
        return None
    return [
        min((a * x + b) % _MERSENNE31 for x in hs)
        for a, b in permutation_params(k, seed)
    ]


def py_simhash(text: str) -> int:
    toks = py_tokens(text)
    fp = 0
    for i in range(32):
        s = sum(((py_token_hash(t) >> i) & 1) * 2 - 1 for t in toks)
        if s > 0:
            fp |= 1 << i
    return fp


@settings(max_examples=10, deadline=None)
@given(docs_strategy)
def test_minhash_matches_python_spec(spark, docs):
    from ops_spark.operators.dedup import minhash_signatures

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {
        r["__id"]: list(r["__sig"])
        for r in minhash_signatures(df).collect()
    }
    for i, t in enumerate(docs):
        expected = py_minhash(t)
        if expected is None:
            assert i not in got  # <3 tokens → no signature row
        else:
            assert got[i] == expected


@settings(max_examples=10, deadline=None)
@given(docs_strategy)
def test_simhash_matches_python_spec(spark, docs):
    from ops_spark.operators.dedup import simhash_fingerprints

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    got = {r["__id"]: r["__fp"] for r in simhash_fingerprints(df).collect()}
    for i, t in enumerate(docs):
        assert got[i] == py_simhash(t), f"doc {i}: {t!r}"


@settings(max_examples=10, deadline=None)
@given(st.lists(st.floats(-10, 10, allow_nan=False), min_size=4, max_size=4))
def test_cosine_bounds_and_self_similarity(spark, vec):
    from pyspark.sql import functions as F

    from ops_spark.operators.similarity import cosine

    df = spark.createDataFrame([(vec,)], "v array<double>")
    sim = df.select(cosine(F.col("v"), F.col("v")).alias("s")).head().s
    # Condition on the double-precision norm, not the exact values: tiny
    # components (e.g. 1e-279) square-underflow to 0 in BOTH engines, and
    # cosine of an underflowed-zero norm is undefined → null.
    if sum(x * x for x in vec) > 0:
        assert abs(sim - 1.0) < 1e-9
    else:
        assert sim is None  # 0/0 — undefined, surfaced as null not garbage


def test_minhash_estimator_error_bound(spark):
    # statistical property on random pairs: |estimate - true J| small for
    # k=128 (stderr = sqrt(J(1-J)/k) ≈ 0.044)
    rng = random.Random(7)
    rows = []
    for i in range(20):
        base = [rng.choice(WORDS) for _ in range(40)]
        mutated = list(base)
        for _ in range(rng.randrange(0, 12)):
            mutated[rng.randrange(len(mutated))] = rng.choice(WORDS)
        rows.append((2 * i, " ".join(base)))
        rows.append((2 * i + 1, " ".join(mutated)))
    sigs = {i: py_minhash(t, k=128) for i, t in rows}
    texts = dict(rows)
    for i in range(0, 40, 2):
        a, b = sigs[i], sigs[i + 1]
        sa, sb = set(py_shingles(texts[i])), set(py_shingles(texts[i + 1]))
        true_j = len(sa & sb) / len(sa | sb)
        est = sum(x == y for x, y in zip(a, b)) / 128
        assert abs(est - true_j) < 0.2


@given(
    st.text(alphabet="ab ", min_size=0, max_size=60),
    st.text(alphabet="ab ", min_size=0, max_size=60),
    st.text(alphabet="cd ", min_size=12, max_size=40),
)
@settings(max_examples=12, deadline=None)
def test_winnowing_shared_substring_guarantee(spark, prefix_a, prefix_b, shared):
    """Winnowing's selection guarantee: documents sharing a substring of
    length >= k + w - 1 share at least one fingerprint (k=8, w=4 → 11)."""
    from ops_spark.operators.text import winnow_fingerprints

    doc_a, doc_b = prefix_a + shared, prefix_b + shared
    df = spark.createDataFrame([(0, doc_a), (1, doc_b)], "id int, text string")
    rows = df.select("id", winnow_fingerprints("text", k=8, w=4).alias("fp")).collect()
    fps = {r.id: set(r.fp) for r in rows}
    assert fps[0] & fps[1], "shared >=11-char substring must share a fingerprint"


@given(
    st.lists(
        st.tuples(
            st.floats(-59.9, 59.9, allow_nan=False),
            st.floats(-179.9, 179.9, allow_nan=False),
        ),
        min_size=2,
        max_size=25,
    ),
    st.sampled_from([50.0, 200.0, 800.0]),
)
@settings(max_examples=12, deadline=None)
def test_spatial_blocking_recall_property(spark, pts, radius_km):
    """The banded grid's lossless-blocking guarantee, property-tested:
    spatial_self_pairs must equal the brute-force all-pairs filter for
    ANY point set within the |lat| <= 60 contract and any radius — this
    directly guards the band-width derivation (per-band Taylor-cos width,
    edges extended half a band for the probe point's pull on the mean
    latitude, min_cos_lat clamp)."""
    from pyspark.sql import functions as F

    from ops_spark.operators.geo import equirect_km, spatial_self_pairs

    rows = [(i, la, lo) for i, (la, lo) in enumerate(pts)]
    df = spark.createDataFrame(rows, "id long, lat double, lon double")
    got = {
        (r.id_a, r.id_b)
        for r in spatial_self_pairs(df, "id", "lat", "lon", radius_km).collect()
    }
    b = df.selectExpr("id AS id_b", "lat AS lat_b", "lon AS lon_b")
    brute = {
        (r.id_a, r.id_b)
        for r in df.toDF("id_a", "lat_a", "lon_a")
        .crossJoin(b)
        .filter("id_a < id_b")
        .withColumn(
            "d",
            equirect_km(
                F.col("lat_a"), F.col("lon_a"), F.col("lat_b"), F.col("lon_b")
            ),
        )
        .filter(F.col("d") <= radius_km)
        .collect()
    }
    assert got == brute
