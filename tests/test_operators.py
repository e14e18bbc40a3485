"""Behavioral tests for the LLM-pipeline operators (semantics, not parity)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # exact dup of 1
        (3, "the quick brown fox jumps over the lazy dog tonight"),  # near dup of 1
        (4, "completely different content about spark shuffles and joins here"),
        (5, "der hund und die katze und das haus und der baum ist gross"),
        (6, "el perro y el gato y la casa es grande los dos"),
        (7, "short doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_keeps_lowest_id(docs):
    from ops_spark.operators.dedup import exact_dedup

    kept = sorted(r.doc_id for r in exact_dedup(docs, ["text"], "doc_id").collect())
    assert kept == [1, 3, 4, 5, 6, 7]  # doc 2 (exact dup of 1) dropped


def test_minhash_lsh_dedup_drops_exact_and_near(docs):
    from ops_spark.operators.dedup import minhash_lsh_dedup

    kept = sorted(
        r.doc_id
        for r in minhash_lsh_dedup(docs, threshold=0.6, k=32, bands=8).collect()
    )
    assert 1 in kept and 2 not in kept  # exact dup caught
    assert 4 in kept and 5 in kept and 6 in kept  # distinct docs survive


def test_minhash_estimates_jaccard(spark, docs):
    from ops_spark.operators.dedup import jaccard_shingles, minhash_signature

    sig = docs.select(
        "doc_id", minhash_signature("text", k=128).alias("sig")
    ).collect()
    sigs = {r.doc_id: r.sig for r in sig}
    agree_13 = sum(a == b for a, b in zip(sigs[1], sigs[3])) / 128
    agree_14 = sum(a == b for a, b in zip(sigs[1], sigs[4])) / 128
    true_j = docs.filter(F.col("doc_id") == 1).crossJoin(
        docs.filter(F.col("doc_id") == 3).select(F.col("text").alias("t2"))
    ).select(jaccard_shingles(F.col("text"), F.col("t2")).alias("j")).head().j
    assert sigs[1] == sigs[2]  # identical text → identical signature
    assert abs(agree_13 - true_j) < 0.25  # estimator tracks true jaccard
    assert agree_14 < 0.2  # unrelated docs don't collide


def test_simhash_hamming_orders_similarity(docs):
    from ops_spark.operators.dedup import simhash32

    fps = {
        r.doc_id: r.fp
        for r in docs.select("doc_id", simhash32("text").alias("fp")).collect()
    }
    ham = lambda a, b: bin(a ^ b).count("1")
    assert fps[1] == fps[2]  # identical text
    assert ham(fps[1], fps[3]) < ham(fps[1], fps[4])  # near-dup closer than unrelated


def test_simhash_candidates_find_near_dups(docs):
    from ops_spark.operators.dedup import simhash_candidates

    pairs = {
        (r.id_a, r.id_b) for r in simhash_candidates(docs, max_hamming=3).collect()
    }
    assert (1, 2) in pairs


def test_ngram_jaccard_pairs_exact(docs):
    from ops_spark.operators.dedup import ngram_jaccard_pairs

    pairs = ngram_jaccard_pairs(docs, threshold=0.5).collect()
    ids = {(r.id_a, r.id_b): r.jaccard for r in pairs}
    assert ids[(1, 2)] == 1.0
    assert 0.5 <= ids[(1, 3)] < 1.0


def test_ngram_jaccard_prefix_filter_matches_bruteforce(spark):
    """The PPJoin-style prefix filter must be exactness-preserving: the
    operator's pair set equals a brute-force all-pairs Jaccard computed in
    plain Python, on a randomized corpus built to stress the filter —
    docs at size ratios straddling the length filter, near-threshold
    overlaps, shared hot boilerplate shingles (high-df, sorted OUT of
    prefixes), and singleton rare shingles."""
    import itertools
    import random

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(30)]
    boiler = ["the", "quick", "brown", "fox"]  # hot grams in most docs
    docs = []
    for i in range(40):
        n_tok = rng.randint(3, 24)
        toks = boiler + [rng.choice(vocab) for _ in range(n_tok)]
        docs.append((i, " ".join(toks)))
    # planted near-dup family: same base, one token appended/changed
    base = [rng.choice(vocab) for _ in range(18)]
    docs.append((100, " ".join(base)))
    docs.append((101, " ".join(base + ["extra"])))
    docs.append((102, " ".join(base[:-1] + ["swap"])))

    def sh(text):
        t = text.split()
        return {" ".join(t[i : i + 3]) for i in range(len(t) - 2)}

    t = 0.6
    expect = {}
    for (ia, ta), (ib, tb) in itertools.combinations(docs, 2):
        a, b = sh(ta), sh(tb)
        if not a or not b:
            continue
        j = len(a & b) / len(a | b)
        if j >= t:
            expect[(min(ia, ib), max(ia, ib))] = round(j, 6)

    from ops_spark.operators.dedup import ngram_jaccard_pairs

    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in ngram_jaccard_pairs(df, threshold=t).collect()
    }
    assert got == expect
    assert (100, 101) in got and (100, 102) in got  # planted family found


def test_cosine_topk_self_is_rank1(spark, sf_dir):
    from ops_spark.io import load_table
    from ops_spark.operators.similarity import cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    top = cosine_topk(emb, q, k=5).filter(F.col("rank") == 1).collect()
    for r in top:
        assert r.vec_id == r.query_id and r.sim == pytest.approx(1.0, abs=1e-5)


def test_ann_recall_vs_bruteforce(spark, sf_dir):
    from ops_spark.io import load_table
    from ops_spark.operators.similarity import ann_topk, cosine_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, q, k=5).collect()
    approx = ann_topk(emb, q, k=5, nbits=4, dim=64).collect()
    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[qid] & approx_sets.get(qid, set())) / len(exact_sets[qid])
        for qid in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5  # 16 buckets over 500 vecs
    for qid, found in approx_sets.items():
        assert qid in found  # self always lands in its own bucket


def test_multimodal_meta_schema_and_stub(spark, docs):
    from ops_spark.operators.multimodal import (
        decode_image_real,
        extract_image_meta,
        with_binary_payload,
    )

    meta = extract_image_meta(with_binary_payload(docs)).collect()
    assert len(meta) == docs.count()
    row = {r.doc_id: r for r in meta}[1]
    n = len("the quick brown fox jumps over the lazy dog today".encode())
    assert row.n_bytes == n
    assert row.width == n % 640 + 1 and row.height == n % 480 + 1
    assert len(row.sha256) == 64
    with pytest.raises(NotImplementedError):
        decode_image_real(b"\x89PNG")


def test_text_stats_formulas(spark):
    from ops_spark.operators.text import with_text_stats

    df = spark.createDataFrame([(1, "the cat, and a dog! 42")], "id long, text string")
    r = with_text_stats(df).head()
    assert r.n_tokens_ws == 6
    # BPE-ish: the|cat|,|and|a|dog|!|42
    assert r.n_tokens_bpe == 8
    assert r.stopword_ratio == pytest.approx(3 / 6, abs=1e-4)  # the, and, a
    assert r.digit_ratio == pytest.approx(2 / 22, abs=1e-4)


def test_language_id_markers(spark):
    from ops_spark.operators.text import language_id

    df = spark.createDataFrame(
        [
            (1, "the dog is a friend of the house"),
            (2, "der hund ist und das haus"),
            (3, "xyzzy qwerty asdf"),
        ],
        "id long, text string",
    )
    got = {r.id: r.lang for r in df.select("id", language_id("text").alias("lang")).collect()}
    assert got == {1: "en", 2: "de", 3: "und"}


def test_connected_components(spark):
    from ops_spark.operators.graph import connected_components

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (7, 8), (8, 9), (9, 1)],
        "id_a long, id_b long",
    )
    comp = {r.id: r.comp for r in connected_components(edges).collect()}
    # chain 1-2-3-9-8-7 is one component; 4-5 another
    assert comp[1] == comp[2] == comp[3] == comp[7] == comp[8] == comp[9] == 1
    assert comp[4] == comp[5] == 4


def test_dedup_by_components_transitive(spark, docs):
    from ops_spark.operators.dedup import minhash_lsh_candidates
    from ops_spark.operators.graph import dedup_by_components

    pairs = minhash_lsh_candidates(docs).select("id_a", "id_b")
    kept = dedup_by_components(docs, pairs)
    ids = sorted(r.doc_id for r in kept.collect())
    assert 1 in ids and 2 not in ids  # exact dup collapsed transitively


def test_embedding_dedup_lsh_recall(spark, sf_dir):
    from ops_spark.io import load_table
    from ops_spark.operators.dedup import embedding_dedup
    from ops_spark.queries.llm import _with_planted_dups

    emb = _with_planted_dups(
        load_table(spark, sf_dir, "embeddings"), n_planted=100
    )
    n = emb.count()
    lsh_df = embedding_dedup(
        emb, threshold=0.98, exact=False, nbits=8, dim=64, n_tables=4
    )
    # The LSH path must stay equi-join-only: no all-pairs stage at any scale.
    plan = lsh_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    lsh = {r.vec_id for r in lsh_df.collect()}
    exact = {
        r.vec_id for r in embedding_dedup(emb, threshold=0.98, exact=True).collect()
    }
    # Exact removes exactly the 100 planted copies (originals have lower ids;
    # no natural pair in the fixture reaches 0.98).
    assert len(exact) == n - 100
    assert lsh >= exact  # blocking can only miss dups, never invent them
    dups_found = n - len(lsh)
    # sim ≈ 0.9999 → per-plane agreement ~0.997; miss^4 ≈ 1e-14: every
    # planted dup must be caught.
    assert dups_found == 100


def test_semantic_dedup_drops_planted_duplicates(spark, sf_dir):
    """SemDeDup's structural guarantee: (near-)identical vectors share a
    nearest centroid, so planted duplicates are ALWAYS co-clustered and
    dropped; the survivor is the lower id; no non-duplicate Gaussian
    vector is dropped at threshold 0.98."""
    from ops_spark.io import load_table
    from ops_spark.operators.dedup import semantic_dedup
    from ops_spark.queries.llm import _with_planted_dups

    emb = _with_planted_dups(load_table(spark, sf_dir, "embeddings"), n_planted=50)
    n = emb.count()
    out = semantic_dedup(emb, threshold=0.98, n_clusters=8, kmeans_iters=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    kept = {r.vec_id for r in out.select("vec_id").collect()}
    assert len(kept) == n - 50  # exactly the planted copies dropped
    assert all(v < 1_000_000 for v in kept)  # survivors are the originals
    # deterministic: same centroids sample + same assignment
    again = {
        r.vec_id
        for r in semantic_dedup(emb, threshold=0.98, n_clusters=8, kmeans_iters=1)
        .select("vec_id")
        .collect()
    }
    assert again == kept


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    from ops_spark.io import load_table
    from ops_spark.operators.similarity import cosine_topk, ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, q, k=5).collect()
    ivf_df = ivf_topk(emb, q, k=5, n_centroids=16, nprobe=4, refine_iters=1)
    plan = ivf_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan  # equi-join on cell id only
    approx = ivf_df.collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[qid] & approx_sets.get(qid, set())) / len(exact_sets[qid])
        for qid in exact_sets
    ]
    # probing 4/16 data-adaptive cells: mean recall well above the 25%
    # random-probe floor
    assert sum(recalls) / len(recalls) >= 0.5


def test_ivfpq_recall_vs_bruteforce(spark, sf_dir):
    from ops_spark.io import load_table
    from ops_spark.operators.similarity import cosine_topk, ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    exact = cosine_topk(emb, q, k=5).collect()
    pq_df = ivfpq_topk(emb, q, k=5, m=8, nbits=6, n_centroids=16, nprobe=4)
    plan = pq_df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan  # equi-joins only (cell, ids)
    assert "BroadcastNestedLoopJoin" not in plan
    approx = pq_df.collect()
    exact_sets, approx_sets = {}, {}
    for r in exact:
        exact_sets.setdefault(r.query_id, set()).add(r.vec_id)
    for r in approx:
        approx_sets.setdefault(r.query_id, set()).add(r.vec_id)
    recalls = [
        len(exact_sets[qid] & approx_sets.get(qid, set())) / len(exact_sets[qid])
        for qid in exact_sets
    ]
    # same 4/16-cell probe budget as IVF-Flat; the exact re-rank of the
    # 4k ADC shortlist must keep recall at the IVF-Flat bar even though
    # the scan tier only ever saw 8-byte codes
    assert sum(recalls) / len(recalls) >= 0.5
    # determinism: same sample, same codebooks, same lexsort cut
    again = {
        (r.query_id, r.vec_id, r.rank)
        for r in ivfpq_topk(
            emb, q, k=5, m=8, nbits=6, n_centroids=16, nprobe=4
        ).collect()
    }
    assert again == {(r.query_id, r.vec_id, r.rank) for r in approx}


def test_multimodal_resize_and_frames(spark, sf_dir):
    from ops_spark.io import load_table
    from ops_spark.operators import multimodal as M

    docs = M.with_binary_payload(load_table(spark, sf_dir, "documents")).limit(50)
    resized = M.resize_images(docs, target=(8, 4)).collect()
    assert all(len(r.payload) == 32 for r in resized)  # exact target size
    assert all(r.width == 8 and r.height == 4 for r in resized)

    frames = M.sample_frames(docs, every_n_bytes=100, max_frames=3)
    agg = frames.groupBy("doc_id").count().collect()
    assert all(1 <= r["count"] <= 3 for r in agg)
    one = frames.filter(F.col("frame_idx") == 0).head()
    assert one.pts_ms == 0 and len(one.frame) > 0


def test_multimodal_features_compose_with_similarity(spark, sf_dir):
    from ops_spark.io import load_table
    from ops_spark.operators import multimodal as M
    from ops_spark.operators.similarity import cosine_topk

    docs = M.with_binary_payload(load_table(spark, sf_dir, "documents")).limit(100)
    feats = M.extract_features(docs)
    row = feats.head()
    assert len(row.feature) == M.FEATURE_DIM
    assert abs(sum(row.feature) - 1.0) < 1e-5  # L1-normalized histogram
    # The feature column plugs straight into the vector operators: the
    # nearest neighbor of any vector must be itself at sim 1.
    corpus = feats.select(F.col("doc_id").alias("vec_id"), F.col("feature").alias("embedding"))
    q = corpus.limit(3).select(F.col("vec_id").alias("query_id"), "embedding")
    top1 = {r.query_id: r.vec_id for r in cosine_topk(corpus, q, k=1).collect()}
    assert all(qid == vid for qid, vid in top1.items())


def test_ppm_encode_decode_roundtrip():
    # Real-decode tier: the PPM bytes must be a self-consistent image —
    # header geometry matches the raster, decode recovers exactly what
    # encode derived, and non-image bytes are rejected loudly.
    import math

    import pytest

    from ops_spark.operators.multimodal import decode_ppm, encode_ppm

    for n in (1, 2, 3, 4, 47, 48, 49, 157, 4096):
        data = bytes(i % 251 for i in range(n))
        img = encode_ppm(data)
        w, h, maxval = decode_ppm(img)
        pixels = max(1, (n + 2) // 3)
        assert maxval == 255
        assert w * h >= pixels and (w - 1) * h < pixels or w == 1
        assert w == math.isqrt(pixels) + (0 if math.isqrt(pixels) ** 2 == pixels else 1)
        # payload embeds the original bytes at the start of the raster
        assert img.split(b"\n", 3)[3][:n] == data
    with pytest.raises(ValueError, match="P6"):
        decode_ppm(b"GIF89a....")


def test_png_encode_decode_roundtrip_all_filters():
    # The stdlib PNG codec: encode under EVERY scanline filter
    # (None/Sub/Up/Average/Paeth), decode must reconstruct identical
    # pixels — this exercises all five decoder filter paths, not just
    # the one our encoder defaults to. RGB and RGBA, including the
    # degenerate 1-wide / 1-tall shapes where left/up predictors are
    # all-zero.
    import numpy as np
    import pytest

    from ops_spark.operators.multimodal import decode_png, encode_png

    rng = np.random.default_rng(7)
    shapes = [(5, 7, 3), (4, 4, 4), (1, 9, 3), (6, 1, 4), (13, 11, 3)]
    for shape in shapes:
        px = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for ft in range(5):
            w, h, c, back = decode_png(encode_png(px, filter_type=ft))
            assert (w, h, c) == (shape[1], shape[0], shape[2])
            assert np.array_equal(back, px), f"filter {ft} shape {shape}"
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"\xff\xd8\xff\xe0 jpeg soi")
    # corrupt a raster byte inside IDAT: the chunk CRC must catch it
    good = encode_png(rng.integers(0, 256, (8, 8, 3), dtype=np.uint8))
    bad = bytearray(good)
    bad[good.index(b"IDAT") + 10] ^= 0xFF
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(bad))


def test_png_spark_meta_and_real_resize(spark, docs):
    # End-to-end on the Spark side: fixture text → real compressed PNGs
    # (Paeth-filtered, so decode does actual reconstruction work) →
    # full-decode metadata, then the REAL resize path
    # (resize_images use_stub=False): output payloads are valid PNGs of
    # the target geometry whose pixels equal a nearest-neighbor
    # resample of the originals.
    import hashlib

    import numpy as np

    from ops_spark.operators import multimodal as M

    small = docs.limit(12)
    pngs = M.with_png_payload(small, filter_type=4)
    meta = M.extract_png_meta(pngs)
    rows = {r.doc_id: r for r in meta.collect()}
    texts = {r.doc_id: r.text for r in small.select("doc_id", "text").collect()}
    assert rows.keys() == texts.keys()
    for i, t in texts.items():
        px = M.text_to_png_pixels(t.encode("utf-8"))
        r = rows[i]
        assert (r.width, r.height, r.channels) == (px.shape[1], px.shape[0], 3)
        # raster hash proves the inflate+unfilter path reproduced the
        # exact source pixels through the compressed payload
        assert r.raster_sha256 == hashlib.sha256(px.tobytes()).hexdigest()

    resized = M.resize_images(pngs, target=(6, 5), use_stub=False)
    for r in resized.collect():
        w, h, c, back = M.decode_png(r.payload)
        assert (w, h, c) == (6, 5, 3) and (r.width, r.height) == (6, 5)
        src = M.text_to_png_pixels(texts[r.doc_id].encode("utf-8"))
        xs = (np.arange(6) * src.shape[1]) // 6
        ys = (np.arange(5) * src.shape[0]) // 5
        assert np.array_equal(back, src[ys][:, xs])


def test_wav_encode_decode_roundtrip():
    import pytest

    from ops_spark.operators.multimodal import decode_wav, encode_wav

    for n in (0, 1, 2, 3, 157, 4096):
        data = bytes(i % 251 for i in range(n))
        wav = encode_wav(data)
        rate, n_samples, dur_ms = decode_wav(wav)
        assert rate == 8000
        assert n_samples == (n + (n % 2)) // 2
        assert dur_ms == n_samples * 1000 // 8000
        assert wav[44 : 44 + n] == data  # samples embed the original bytes
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"ID3....not audio")


def test_mix_sample_partition_invariant(spark):
    # The mixing claim that matters at 100 TB: the kept set is a pure
    # function of (key, salt, fraction) — identical across partitionings
    # (seeded df.sample is not), so a resampled corpus is reproducible.
    from pyspark.sql import functions as F

    from ops_spark.operators.mixing import mix_sample

    df = spark.range(0, 5000).select(F.col("id").alias("doc_id"))
    frac = F.lit(0.3)
    one = {r.doc_id for r in mix_sample(df.repartition(1), frac).collect()}
    many = {r.doc_id for r in mix_sample(df.repartition(16), frac).collect()}
    assert one == many
    assert 0.25 * 5000 < len(one) < 0.35 * 5000  # draw is roughly uniform


def test_triangle_count_known_graph(spark):
    # K4 on {1,2,3,4}: C(4,3)=4 triangles, every vertex in exactly 3.
    # Pendant edge 4-5 joins no triangle; vertex 5 must not appear.
    from pyspark.sql import functions as F

    from ops_spark.operators.graph import triangle_count

    k4 = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    # Duplicate + reversed + self-loop edges must not change counts.
    edges = spark.createDataFrame(
        k4 + [(2, 1), (3, 3), (1, 2)], "a bigint, b bigint"
    )
    got = {r.id: r.triangles for r in triangle_count(edges).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_pregel_sssp_path_graph(spark):
    # Path 1-2-3-4-5: distances from 1 are 0,1,2,3,4; max_iter=4 reaches all.
    from pyspark.sql import functions as F

    from ops_spark.operators.pregel import MSG, pregel

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5)], "src bigint, dst bigint"
    )
    verts = spark.range(1, 6).select(
        F.col("id"), F.when(F.col("id") == 1, F.lit(0)).alias("dist")
    )
    out = pregel(
        verts,
        edges,
        update={"dist": F.least(F.col("dist"), F.col(MSG))},
        agg=F.min(F.col(MSG)),
        msg_to_dst=F.col("src_dist") + 1,
        msg_to_src=F.col("dst_dist") + 1,
        max_iter=4,
    )
    assert {r.id: r.dist for r in out.collect()} == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_pregel_matches_specialized_connected_components(spark):
    # Min-label propagation via the GENERIC pregel must agree with the
    # specialized pointer-jumping operator on the same graph. The probe
    # (check_every) must stop early once labels stabilize.
    from pyspark.sql import functions as F

    from ops_spark.operators.graph import connected_components
    from ops_spark.operators.pregel import MSG, pregel

    pairs = [(1, 2), (2, 3), (10, 11), (12, 11), (20, 21), (3, 4), (4, 1)]
    edges = spark.createDataFrame(pairs, "a bigint, b bigint")
    want = {
        r.id: r.comp for r in connected_components(edges, "a", "b").collect()
    }

    verts = (
        edges.selectExpr("a AS id")
        .union(edges.selectExpr("b"))
        .distinct()
        .withColumn("comp", F.col("id"))
    )
    got_df = pregel(
        verts,
        edges.selectExpr("a AS src", "b AS dst"),
        update={"comp": F.least(F.col("comp"), F.col(MSG))},
        agg=F.min(F.col(MSG)),
        msg_to_dst=F.col("src_comp"),
        msg_to_src=F.col("dst_comp"),
        max_iter=20,
        check_every=2,
    )
    assert {r.id: r.comp for r in got_df.collect()} == want


def test_pregel_validates_inputs(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ops_spark.operators.pregel import MSG, pregel

    verts = spark.range(3).withColumn("v", F.lit(0))
    edges = spark.createDataFrame([(0, 1)], "src bigint, dst bigint")
    with _pytest.raises(ValueError, match="msg_to_dst"):
        pregel(verts, edges, update={"v": F.col("v")}, agg=F.min(F.col(MSG)))
    with _pytest.raises(ValueError, match="unknown state"):
        pregel(
            verts,
            edges,
            update={"nope": F.col("v")},
            agg=F.min(F.col(MSG)),
            msg_to_dst=F.col("src_v"),
        )


def test_user_defined_type_roundtrip(spark, tmp_path):
    """UserDefinedType parity (UserDefinedType.scala:42): a typed Embedding
    column serializes to array<float> in Catalyst, survives a parquet
    roundtrip with its UDT identity, and deserializes back to real objects
    — including inside an executor-side UDF (the worker import path)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    from ops_spark.operators.udt import Embedding, EmbeddingUDT

    rows = [(i, Embedding([float(i), float(i * 2), 1.0])) for i in range(20)]
    schema = StructType(
        [StructField("id", spark.range(1).schema[0].dataType),
         StructField("emb", EmbeddingUDT())]
    )
    df = spark.createDataFrame(rows, schema)
    assert isinstance(df.schema["emb"].dataType, EmbeddingUDT)

    # Driver-side deserialize: collect returns value objects.
    got = {r.id: r.emb for r in df.collect()}
    assert got[3] == Embedding([3.0, 6.0, 1.0])

    # Executor-side deserialize: a UDF receives the OBJECT, not the array.
    norm = F.udf(lambda e: e.norm(), "double")
    norms = {r.id: r.n for r in df.select("id", norm("emb").alias("n")).collect()}
    assert abs(norms[3] - (9 + 36 + 1) ** 0.5) < 1e-9

    # Parquet roundtrip preserves the UDT (metadata rides the file schema).
    path = str(tmp_path / "udt_parquet")
    df.write.mode("overwrite").parquet(path)
    back = spark.read.parquet(path)
    assert isinstance(back.schema["emb"].dataType, EmbeddingUDT)
    assert {r.id: r.emb for r in back.collect()} == got


def test_time_rollup_single_scan_two_shuffles(spark, sf_dir):
    # The hierarchical rollup must NOT rescan raw data per resolution: one
    # parquet scan + two exchanges total (fine agg, merged level agg) —
    # exchange reuse does not fire across union branches, so the operator
    # explodes resolution memberships instead of unioning levels.
    import re

    from ops_spark.io import load_table
    from ops_spark.operators.timeseries import time_rollup

    ev = load_table(spark, sf_dir, "events")
    out = time_rollup(ev, "ts", "value", ["hour", "day", "week"], ["event_type"])
    txt = out._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Scan parquet", txt)) == 1
    assert len(re.findall(r"Exchange (hash|range)", txt)) == 2

    # Hierarchy consistency: every day row equals the merge of its hours.
    from pyspark.sql import functions as F

    rows = out.filter("resolution IN ('hour','day')").collect()
    hours = [r for r in rows if r.resolution == "hour"]
    days = {(r.bucket, r.event_type): r for r in rows if r.resolution == "day"}
    from collections import defaultdict

    merged = defaultdict(lambda: [0, 0.0, float("inf"), float("-inf")])
    for r in hours:
        key = (r.bucket.replace(hour=0), r.event_type)
        m = merged[key]
        m[0] += r.cnt
        m[1] += r.total
        m[2] = min(m[2], r.vmin)
        m[3] = max(m[3], r.vmax)
    assert set(merged) == set(days)
    for key, (cnt, total, vmin, vmax) in merged.items():
        d = days[key]
        assert d.cnt == cnt
        assert abs(d.total - total) < 1e-6 * max(1.0, abs(total))
        assert d.vmin == vmin and d.vmax == vmax


def test_quantize_int8_error_bound(spark, sf_dir):
    # Dequantized vectors must sit within scale/2 per component (the
    # symmetric-quantization guarantee), and the int range must hold.
    from pyspark.sql import functions as F

    from ops_spark.io import load_table
    from ops_spark.operators.similarity import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_int8(emb, "embedding", prefix="q")
    checked = q.select(
        F.aggregate(
            F.zip_with(
                "embedding",
                "q_vec",
                lambda v, qi: F.abs(
                    v.cast("double") - qi.cast("double") * F.col("q_scale")
                ),
            ),
            F.lit(0.0),
            lambda acc, x: F.greatest(acc, x),
        ).alias("max_err"),
        (F.col("q_scale") / 2 + F.lit(1e-9)).alias("bound"),
        F.array_max("q_vec").alias("hi"),
        F.array_min("q_vec").alias("lo"),
    )
    bad = checked.filter(
        (F.col("max_err") > F.col("bound"))
        | (F.col("hi") > 127)
        | (F.col("lo") < -127)
    ).count()
    assert bad == 0


def test_contamination_flags_eval_overlap(spark, docs):
    from ops_spark.operators.dedup import contamination

    # Eval set = doc 1's sentence; doc 2 (identical) and doc 3 (shares
    # 7 of its 3-grams) are contaminated; doc 4 is clean; doc 7 is too
    # short to have any 3-gram.
    eval_df = docs.filter(F.col("doc_id") == 1)
    train = docs.filter(F.col("doc_id").isin(2, 3, 4, 7))
    got = {r.doc_id: (r.n_shared, r.contaminated) for r in contamination(train, eval_df).collect()}
    assert got[2][1] and got[2][0] == 8  # 10 tokens -> 8 shingles, all shared
    assert got[3][1] and 0 < got[3][0] < 8
    assert got[4] == (0, False)
    assert got[7] == (0, False)


def test_duplicate_span_coverage_counts_positions(spark):
    from ops_spark.operators.dedup import duplicate_span_coverage

    rows = [
        (1, "a b c d e"),  # "a b c" repeated in doc 2 -> positions 1..3 covered
        (2, "a b c x y"),
        (3, "p q r s t"),  # all grams unique -> 0 coverage
        (4, "z z z z z z"),  # within-doc repeats count: every gram dup
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.covered_tokens, r.dup_fraction)
           for r in duplicate_span_coverage(df).collect()}
    assert got[1] == (5, 3, 0.6)
    assert got[2] == (5, 3, 0.6)
    assert got[3] == (5, 0, 0.0)
    assert got[4] == (6, 6, 1.0)


def test_standardize_embeddings_zero_mean_unit_std(spark):
    import numpy as np

    from ops_spark.operators.similarity import standardize_embeddings

    rng = np.random.RandomState(7)
    # dim0 high variance, dim1 shifted, dim2 CONSTANT (sd=0 guard)
    X = np.stack(
        [rng.normal(0, 5, 400), rng.normal(3, 0.1, 400), np.full(400, 0.25)],
        axis=1,
    )
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    )
    Z = np.array([r.z4 for r in standardize_embeddings(df).orderBy("vec_id").collect()],
                 dtype=np.float64) / 1e4
    # per-dim: mean ~0, std ~1 (quantization noise ≤ 1e-3)
    assert np.abs(Z[:, :2].mean(axis=0)).max() < 1e-3
    assert np.abs(Z[:, :2].std(axis=0) - 1.0).max() < 1e-2
    # constant dimension maps to exactly 0, not NaN/inf
    assert (Z[:, 2] == 0.0).all()


def test_html_to_text_extraction(spark):
    from ops_spark.operators.text import html_to_text

    cases = [
        # script content (with decoy markup) and comments must NOT leak;
        # title and block closers become line breaks; entities decode
        ('<html><head><title>T</title><script>var a="<p>no</p>";</script>'
         "</head><body><!-- c --><h1>H</h1><p>a &amp; b</p>"
         "<div>x &lt;y&gt;</div></body></html>",
         "T\nH\na & b\nx <y>"),
        # <br/> variants, nbsp, whitespace collapse across lines
        ("line1<br>line2<BR />line3  \t  end&nbsp;.", "line1\nline2\nline3 end ."),
        # nested style dropped case-insensitively, multiline (dotall)
        ("<STYLE>\n p { }\n</STYLE>keep", "keep"),
        # plain text untouched
        ("no markup here", "no markup here"),
    ]
    df = spark.createDataFrame([(h,) for h, _ in cases], "h string")
    got = [r.t for r in df.select(html_to_text("h").alias("t")).collect()]
    assert got == [w for _, w in cases]


def test_canonicalize_url_edge_cases(spark):
    from ops_spark.operators.text import canonicalize_url

    cases = [
        # scheme+host fold, www/default-port/fragment strip, param sort
        ("HTTPS://WWW.Ex.COM:443/A/b/?z=1&utm_source=x&a=2#frag",
         "https://ex.com/A/b?a=2&z=1"),
        # http default port; path case PRESERVED; gclid/fbclid dropped
        ("http://Ex.com:80/Path?gclid=g&fbclid=f&b=1",
         "http://ex.com/Path?b=1"),
        # NON-default port kept; bare host -> "/"; no params
        ("https://ex.com:8443", "https://ex.com:8443/"),
        # trailing slashes collapse; all params tracking -> no "?"
        ("https://ex.com/a///?utm_campaign=c", "https://ex.com/a"),
        # utm must match as PREFIX only: "autumn=1" survives
        ("https://ex.com/?autumn=1&utm_x=2", "https://ex.com/?autumn=1"),
        # :443 is only default for https; http keeps it
        ("http://ex.com:443/x", "http://ex.com:443/x"),
        # '?' first appearing INSIDE the fragment (SPA hash routing) is
        # NOT a query — drop it with the fragment, don't resurrect params
        ("https://ex.com/a#sec?x=1", "https://ex.com/a"),
        # real query before the fragment still survives
        ("https://ex.com/a?x=1#sec?y=2", "https://ex.com/a?x=1"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r.c for r in df.select(canonicalize_url("url").alias("c")).collect()]
    assert got == [want for _, want in cases]


def test_label_propagation_finds_planted_communities(spark):
    from ops_spark.operators.graph import label_propagation

    # two 4-cliques joined by one bridge edge: LPA must converge each
    # clique to its min label and keep the cliques separate
    c1 = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
    c2 = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    bridge = [(4, 10)]
    df = spark.createDataFrame(c1 + c2 + bridge, "id_a long, id_b long")
    lab = {r.id: r.label
           for r in label_propagation(df, iterations=4).collect()}
    assert len(lab) == 8
    comm1 = {lab[i] for i in range(1, 5)}
    comm2 = {lab[i] for i in range(10, 14)}
    assert len(comm1) == 1 and len(comm2) == 1
    assert comm1 != comm2
    # isolated vertex keeps its own label
    df2 = spark.createDataFrame(c1 + [(99, 99)], "id_a long, id_b long")
    lab2 = {r.id: r.label for r in label_propagation(df2, iterations=2).collect()}
    assert lab2[99] == 99


def test_doremi_mixture_upweights_hard_domains(spark):
    from ops_spark.operators.mixing import doremi_mixture

    rows = []
    # three domains with planted loss levels: hard > medium > easy
    for i in range(300):
        rows.append((i, "hard", 30000 + (i % 7)))
        rows.append((i + 1000, "medium", 20000 + (i % 7)))
        rows.append((i + 2000, "easy", 10000 + (i % 7)))
    df = spark.createDataFrame(rows, "doc_id long, source string, loss_e4 long")
    out = {r.domain: r for r in doremi_mixture(df, "source", "loss_e4").collect()}
    assert set(out) == {"hard", "medium", "easy"}
    # Group-DRO: higher excess loss -> higher mixture weight
    assert out["hard"].weight_e6 > out["medium"].weight_e6 > out["easy"].weight_e6
    # weights form a distribution (e6 units, rounding slack)
    assert abs(sum(r.weight_e6 for r in out.values()) - 1_000_000) <= 3
    # smoothing floor: even the easiest domain keeps > smoothing/k mass
    assert out["easy"].weight_e6 > 1e-3 / 3 * 1e6 * 0.9
    # exact integer per-domain means
    assert out["hard"].avg_loss_e4 == 30000 + round(sum(i % 7 for i in range(300)) / 300)
    # determinism
    again = {r.domain: r.weight_e6
             for r in doremi_mixture(df, "source", "loss_e4").collect()}
    assert again == {d: r.weight_e6 for d, r in out.items()}


def test_canonicalize_url_idempotent(spark):
    # canonical form must be a fixed point: canonicalize(canonicalize(u))
    # == canonicalize(u) — otherwise two passes of the pipeline dedup
    # differently than one
    from pyspark.sql import functions as F

    from ops_spark.operators.text import canonicalize_url

    urls = [
        "HTTPS://WWW.Ex.COM:443/A/b/?z=1&utm_source=x&a=2#frag",
        "http://Ex.com:80/Path?gclid=g&b=1&a=3",
        "https://ex.com:8443",
        "https://ex.com/a///?utm_campaign=c",
        "http://ex.com:443/x?b=2&a=1",
        "https://www.w.example.org/p/q?x=1&x=0",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    out = df.select(
        canonicalize_url("url").alias("c1"),
        canonicalize_url(canonicalize_url("url")).alias("c2"),
    )
    assert out.filter(F.col("c1") != F.col("c2")).count() == 0


def test_dsir_importance_prefers_target_like_docs(spark):
    from ops_spark.operators.retrieval import dsir_importance

    raw = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta alpha"),  # pure target language
            (2, "gamma delta gamma delta gamma"),  # pure off-target
            (3, "alpha beta gamma delta"),  # mixed
        ],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(10, "alpha beta alpha beta"), (11, "beta alpha beta")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_features, r.weight_e4)
           for r in dsir_importance(raw, target).collect()}
    # n_features = unigrams + bigrams = tokens + (tokens-1)
    assert got[1][0] == 5 + 4
    assert got[2][0] == 5 + 4
    assert got[3][0] == 4 + 3
    # target-like doc must out-score the off-target one, mixed in between
    assert got[1][1] > got[3][1] > got[2][1]
    # determinism: integer micro-unit sums are identical run to run
    again = {r.doc_id: r.weight_e4 for r in dsir_importance(raw, target).collect()}
    assert again == {k: v[1] for k, v in got.items()}


def test_rrf_fuse_exact_and_deterministic(spark):
    from ops_spark.operators.retrieval import rrf_fuse

    # three lists so the sum has >2 terms (the float-order trap the
    # e12 integer units exist to avoid)
    l1 = spark.createDataFrame(
        [(1, 10, 5.0), (1, 11, 4.0), (1, 12, 3.0)],
        "query_id int, doc_id int, score double",
    )
    l2 = spark.createDataFrame(
        [(1, 11, 9.0), (1, 10, 8.0)], "query_id int, doc_id int, score double"
    )
    l3 = spark.createDataFrame(
        [(1, 12, 1.0), (1, 13, 2.0)], "query_id int, doc_id int, score double"
    )
    got = {r.doc_id: (r.rrf_e12, r.rank)
           for r in rrf_fuse([l1, l2, l3], rrf_k=60, topk=4).collect()}
    # exact integer contributions: floor(1e12/(60+rank))
    c = lambda rank: int(1e12) // (60 + rank)
    assert got[10][0] == c(1) + c(2)   # rank1 in l1, rank2 in l2
    assert got[11][0] == c(2) + c(1)
    assert got[12][0] == c(3) + c(2)   # rank3 in l1, rank2 in l3
    assert got[13][0] == c(1)          # only l3
    # 10 and 11 tie exactly in integer units -> doc_id tie-break
    assert got[10][1] == 1 and got[11][1] == 2
    # per_list_k cuts each list BEFORE fusion
    cut = {r.doc_id: r.rrf_e12
           for r in rrf_fuse([l1, l2, l3], rrf_k=60, topk=4,
                             per_list_k=1).collect()}
    assert set(cut) == {10, 11, 13} and cut[10] == c(1)


def test_exact_substring_remove_keeps_canonical(spark):
    from ops_spark.operators.dedup import exact_substring_remove

    rows = [
        (1, "a b c d e"),   # canonical "a b c" (lowest (doc,pos)) survives
        (2, "a b c x y"),   # its copy is excised -> "x y"
        (3, "p q r s t"),   # all grams unique -> untouched
        (4, "z z z z z z"), # within-doc repeats: canonical span is [1..3],
                            # but positions 2..6 are inside NON-canonical
                            # occurrences too and removal wins -> only the
                            # first token survives
        (5, "m n"),         # shorter than n: no grams, untouched
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.n_tokens, r.n_removed, r.clean_text)
           for r in exact_substring_remove(df).collect()}
    assert got[1] == (5, 0, "a b c d e")
    assert got[2] == (5, 3, "x y")
    assert got[3] == (5, 0, "p q r s t")
    assert got[4] == (6, 5, "z")
    assert got[5] == (2, 0, "m n")
    # overlap merge: "a b c" dup (canon doc 6) and "c d q" dup (canon doc 6)
    # overlap at doc 7's position 3; removal wins once, positions merge
    rows2 = [(6, "a b c d q"), (7, "a b c d q w")]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    got2 = {r.doc_id: (r.n_removed, r.clean_text)
            for r in exact_substring_remove(df2).collect()}
    assert got2[6] == (0, "a b c d q")
    assert got2[7] == (5, "w")


def test_normalize_unicode_composes_and_folds(spark):
    from ops_spark.operators.text import normalize_unicode

    df = spark.createDataFrame(
        [("café",), ("Ｈｉ",)], "s string"  # decomposed é, fullwidth "Hi"
    )
    out = df.select(
        normalize_unicode("s", "NFC").alias("nfc"),
        normalize_unicode("s", "NFKC").alias("nfkc"),
    ).collect()
    assert out[0].nfc == "café" and out[0].nfkc == "café"
    assert out[1].nfc == "Ｈｉ"  # NFC keeps compatibility chars
    assert out[1].nfkc == "Hi"  # NFKC folds them
    with pytest.raises(ValueError):
        normalize_unicode("s", "NFX")


def test_quality_logit_keep_matches_sign(spark, docs):
    from ops_spark.operators.text import quality_logit

    rows = quality_logit(docs).select("doc_id", "quality_logit_e4", "keep").collect()
    assert len(rows) == 7
    for r in rows:
        # e4 encoding only nudges at the 4th decimal; sign must agree except
        # exactly at 0 (floor(0.5) == 0 keeps them consistent there too).
        assert r.keep == (r.quality_logit_e4 > 0)


def test_gap_fill_locf_and_linear(spark):
    from datetime import datetime
    from ops_spark.operators.timeseries import gap_fill

    rows = [
        (1, datetime(2024, 1, 1, 5), 10.0),
        (1, datetime(2024, 1, 4, 9), 40.0),  # 2-day interior gap
        (2, datetime(2024, 1, 2, 0), 7.0),  # single point -> no gaps
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {
        (r.user_id, r.bucket.day): (r.v, r.locf, r.linear_e4)
        for r in gap_fill(df).collect()
    }
    assert len(got) == 5  # 4 grid days for user 1, 1 for user 2
    assert got[(1, 1)] == (10.0, 10.0, 100000)
    assert got[(1, 2)] == (None, 10.0, 200000)  # locf holds, linear 20.0
    assert got[(1, 3)] == (None, 10.0, 300000)  # linear 30.0
    assert got[(1, 4)] == (40.0, 40.0, 400000)
    assert got[(2, 2)] == (7.0, 7.0, 70000)


def test_scd2_merge_semantics(spark):
    from ops_spark.operators.analytics import scd2_merge

    cur = spark.createDataFrame(
        [
            (1, "gold", "2020-01-01", None),  # open, will change
            (2, "silver", "2020-01-01", None),  # open, unchanged update
            (3, "bronze", "2020-01-01", None),  # open, no update at all
            (1, "silver", "2019-01-01", "2020-01-01"),  # already closed
        ],
        "k long, tier string, valid_from string, valid_to string",
    )
    upd = spark.createDataFrame(
        [(1, "platinum", "2024-06-01"), (2, "silver", "2024-06-01"),
         (9, "new", "2024-06-01")],
        "k long, tier string, update_ts string",
    )
    got = {
        (r.k, r.tier, r.valid_from): r.valid_to
        for r in scd2_merge(cur, upd, ["k"], ["tier"], "update_ts").collect()
    }
    assert len(got) == 6
    assert got[(1, "gold", "2020-01-01")] == "2024-06-01"  # closed
    assert got[(1, "platinum", "2024-06-01")] is None  # new version
    assert got[(2, "silver", "2020-01-01")] is None  # unchanged
    assert got[(3, "bronze", "2020-01-01")] is None  # untouched
    assert got[(9, "new", "2024-06-01")] is None  # brand-new key
    assert got[(1, "silver", "2019-01-01")] == "2020-01-01"  # history kept


def test_funnel_requires_order(spark):
    from datetime import datetime
    from ops_spark.operators.analytics import funnel_steps

    rows = [
        (1, datetime(2024, 1, 1), "view"),
        (1, datetime(2024, 1, 2), "click"),  # in order -> completes
        (2, datetime(2024, 1, 2), "click"),
        (2, datetime(2024, 1, 3), "view"),  # click BEFORE view -> step 2 null
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r.user_id: r.t_2 for r in funnel_steps(df, ["view", "click"]).collect()}
    assert got[1] is not None and got[2] is None


def test_zorder_key_interleaves_bits(spark):
    from ops_spark.operators.analytics import zorder_key

    df = spark.createDataFrame([(3, 1), (0, 0), (1023, 1023)], "x int, y int")
    got = [
        r.z
        for r in df.select(
            zorder_key(F.col("x"), F.col("y")).alias("z")
        ).collect()
    ]
    # x=0b11 even positions -> 0b0101=5; y=0b01 odd -> 0b0010=2; total 7.
    assert got[0] == 7
    assert got[1] == 0
    assert got[2] == (1 << 20) - 1  # all 20 bits set


def _bpe_reference(word_freqs: dict[str, int], n_merges: int):
    """Pure-Python Sennrich BPE for cross-checking the Spark loop."""
    words = {tuple(w): f for w, f in word_freqs.items()}
    merges = []
    for rank in range(1, n_merges + 1):
        pairs: dict[tuple[str, str], int] = {}
        for sym, f in words.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + f
        if not pairs:
            break
        (l, r), freq = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, l, r, l + r, freq))
        out = {}
        for sym, f in words.items():
            res, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and sym[i] == l and sym[i + 1] == r:
                    res.append(l + r)
                    i += 2
                else:
                    res.append(sym[i])
                    i += 1
            out[tuple(res)] = out.get(tuple(res), 0) + f
        words = out
    return merges


def test_bpe_merges_match_reference(spark):
    from ops_spark.operators.text import bpe_merges

    corpus = ["low low low lower lowest", "new newer newest low", "wide wider new"]
    df = spark.createDataFrame([(t,) for t in corpus], "text string")
    got = bpe_merges(df, n_merges=6)

    freqs: dict[str, int] = {}
    for t in corpus:
        for w in t.split():
            freqs[w] = freqs.get(w, 0) + 1
    want = _bpe_reference(freqs, 6)
    assert [tuple(r) for r in got.itertuples(index=False)] == want
    assert got.iloc[0]["merged"] == "lo"  # 'l','o' dominates this corpus


def test_paragraph_dedup_keeps_first_occurrence(spark):
    from ops_spark.operators.dedup import paragraph_dedup

    rows = [
        (1, "alpha beta\n\nshared boilerplate"),
        (2, "shared boilerplate\n\ngamma delta"),  # first para already seen
        (3, "shared boilerplate"),  # whole doc duplicated -> disappears
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: (r.text, r.n_paras) for r in paragraph_dedup(df).collect()}
    assert got[1] == ("alpha beta\n\nshared boilerplate", 2)
    assert got[2] == ("gamma delta", 1)
    assert 3 not in got


def test_bm25_ranks_term_density(spark):
    from ops_spark.operators.retrieval import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "cat cat cat dog"),  # dense in 'cat'
            (2, "cat bird fish lizard"),
            (3, "bird fish lizard snake"),  # no hit
        ],
        "doc_id long, text string",
    )
    q = spark.createDataFrame([(1, "cat")], "query_id int, term string")
    got = {r.doc_id: r.score for r in bm25_scores(docs, q).collect()}
    assert set(got) == {1, 2}  # doc 3 never scored
    assert got[1] > got[2] > 0  # higher tf -> higher score


def test_zorder_layout_tightens_file_stats(spark, sf_dir, tmp_path):
    """The point of zorder_key: range-partitioning by the Morton key before
    a write co-locates rows close in BOTH dimensions, so every file's
    parquet min/max stats span a small box — predicate pushdown on EITHER
    column then skips most files. Asserted directly on footer statistics
    against a hash-partitioned baseline."""
    import glob

    import pyarrow.parquet as pq

    from ops_spark.operators.analytics import zorder_key

    # dense 256x256 grid — layout behavior independent of fixture SF
    o = spark.range(256 * 256).select(
        (F.col("id") % 256).cast("int").alias("x"),
        (F.col("id") / 256).cast("int").alias("y"),
    )
    o = o.withColumn("z", zorder_key(F.col("x"), F.col("y"), bits=8))
    zdir, ndir = str(tmp_path / "zsort"), str(tmp_path / "nat")
    o.repartitionByRange(16, "z").write.mode("overwrite").parquet(zdir)
    o.repartition(16).write.mode("overwrite").parquet(ndir)

    def mean_span(d: str, col: str) -> float:
        spans = []
        for f in glob.glob(d + "/*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(g).column(idx).statistics.min
                     for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max
                     for g in range(md.num_row_groups))
            spans.append(hi - lo)
        return sum(spans) / len(spans)

    for col in ("x", "y"):
        z_span, n_span = mean_span(zdir, col), mean_span(ndir, col)
        # hash layout spans ~the full domain per file; a 16-way z-range
        # cut confines each file to ~a quadrant per dimension.
        assert z_span < 0.6 * n_span, (col, z_span, n_span)


def test_span_corruption_reconstructs(spark):
    """Lossless property: substituting each sentinel in the input with its
    span from the target reproduces the original text exactly."""
    import re

    from ops_spark.operators.text import span_corruption

    rows = [(i, " ".join(f"w{i}t{j}" for j in range(40))) for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in span_corruption(df).collect()}
    originals = dict(rows)
    saw_masked = 0
    for doc_id, r in got.items():
        spans = {}
        # parse target: "<extra_id_0> a b <extra_id_1> c" -> {0: "a b", 1: "c"}
        pieces = re.split(r"<extra_id_(\d+)>\s*", r.target_text)[1:]
        for k, content in zip(pieces[0::2], pieces[1::2]):
            spans[int(k)] = content.strip()
        rebuilt = r.input_text
        for k, content in spans.items():
            rebuilt = rebuilt.replace(f"<extra_id_{k}>", content)
        assert rebuilt == originals[doc_id]
        assert r.n_spans == len(spans)
        saw_masked += len(spans)
    assert saw_masked > 0  # the 15% draw masked something across 800 tokens


def test_chunk_documents_overlap_and_tail(spark):
    from ops_spark.operators.text import chunk_documents

    df = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(12)))], "doc_id long, text string"
    )
    got = {
        r.chunk_id: (r.chunk_text.split(), r.n_chunk_tokens)
        for r in chunk_documents(df, chunk_tokens=5, stride=4).collect()
    }
    assert got[0] == (["t0", "t1", "t2", "t3", "t4"], 5)
    assert got[1] == (["t4", "t5", "t6", "t7", "t8"], 5)  # 1-token overlap
    assert got[2] == (["t8", "t9", "t10", "t11"], 4)  # ragged tail
    assert len(got) == 3


def test_split_assign_stable_and_ratioed(spark):
    from ops_spark.operators.text import split_assign

    df = spark.range(2000).withColumnRenamed("id", "doc_id")
    out = split_assign(df).groupBy("split").count().collect()
    counts = {r.split: r["count"] for r in out}
    assert 0.7 < counts["train"] / 2000 < 0.9
    assert 0.05 < counts["val"] / 2000 < 0.15
    # growth stability: the same doc keeps its split in a bigger corpus
    bigger = split_assign(spark.range(4000).withColumnRenamed("id", "doc_id"))
    a = {r.doc_id: r.split for r in split_assign(df).collect()}
    b = {r.doc_id: r.split for r in bigger.filter(F.col("doc_id") < 2000).collect()}
    assert a == b


def test_incremental_dedup_survivors_and_index(spark):
    from ops_spark.operators.dedup import incremental_exact_dedup

    hist_docs = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], "doc_id long, text string"
    )
    index = hist_docs.select(F.md5("text").alias("digest")).distinct()
    batch = spark.createDataFrame(
        [
            (10, "seen before"),  # historical dup -> dropped
            (11, "brand new"),
            (12, "brand new"),  # within-batch dup -> dropped
            (13, "another new"),
        ],
        "doc_id long, text string",
    )
    survivors, updated = incremental_exact_dedup(batch, index, ["text"], "doc_id")
    assert sorted(r.doc_id for r in survivors.collect()) == [11, 13]
    assert updated.distinct().count() == 4  # 2 historical + 2 new digests


def test_quality_checks_catch_planted_violations(spark):
    from ops_spark.operators import quality as Qc

    df = spark.createDataFrame(
        [
            (1, 10.0, "A", 100),
            (2, -5.0, "B", 100),  # range violation
            (2, 20.0, "Z", None),  # dup key + bad domain + null fk
            (4, None, "A", 999),  # null value + orphan fk
        ],
        "id long, amount double, status string, cust long",
    )
    dim = spark.createDataFrame([(100,)], "k long")
    rep = {
        r.rule: (r.violations, r.passed)
        for r in Qc.check_constraints(
            df,
            row_rules=[
                Qc.not_null("amount"),
                Qc.in_range("amount", 0, 100),
                Qc.one_of("status", ["A", "B"]),
            ],
            unique=[["id"]],
            foreign_keys=[("cust", dim, "k")],
        ).collect()
    }
    assert rep["not_null(amount)"] == (1, False)
    assert rep["in_range(amount,0,100)"] == (2, False)  # -5 and NULL
    assert rep["one_of(status)"] == (1, False)
    assert rep["unique(id)"] == (1, False)  # one extra occurrence of id=2
    assert rep["foreign_key(cust)"] == (1, False)  # 999 orphan; NULL exempt


def test_merge_rollups_equals_full_recompute(spark, sf_dir):
    """Incremental maintenance: rollup(old) ⊕ rollup(new increment) must
    equal rollup(everything) — the merge-safe-partials contract that lets
    a 100 TB continuous aggregate update from one day's data."""
    from ops_spark.io import load_table
    from ops_spark.operators.timeseries import merge_rollups, time_rollup

    ev = load_table(spark, sf_dir, "events")
    old = ev.filter(F.dayofmonth("ts") <= 20)
    inc = ev.filter(F.dayofmonth("ts") > 20)
    merged = merge_rollups(
        time_rollup(old, "ts", "value", ["hour", "day"], dims=["event_type"]),
        time_rollup(inc, "ts", "value", ["hour", "day"], dims=["event_type"]),
        dims=["event_type"],
    )
    full = time_rollup(ev, "ts", "value", ["hour", "day"], dims=["event_type"])

    def canon(df):
        return {
            (r.resolution, r.bucket, r.event_type): (
                r.cnt,
                round(r.total, 4),
                round(r.vmin, 4),
                round(r.vmax, 4),
            )
            for r in df.collect()
        }

    assert canon(merged) == canon(full)


def test_ewma_matches_pandas(spark):
    import pandas as pd

    from ops_spark.operators.timeseries import ewma
    from datetime import datetime

    rows = [
        (1, datetime(2024, 1, d), float(v))
        for d, v in [(1, 10.0), (2, 20.0), (3, 5.0), (4, 40.0)]
    ] + [(2, datetime(2024, 1, 1), 7.0)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, v double")
    got = {
        (r.k, r.ts.day): r.ewma for r in ewma(df, "k", "ts", "v", alpha=0.3).collect()
    }
    ref = pd.Series([10.0, 20.0, 5.0, 40.0]).ewm(alpha=0.3, adjust=False).mean()
    for day, want in zip([1, 2, 3, 4], ref):
        assert got[(1, day)] == pytest.approx(want, rel=1e-12)
    assert got[(2, 1)] == 7.0


def test_ewma_auto_dispatches_to_chunked_above_max_series_len(spark):
    """A series longer than max_series_len must transparently take the
    segment-then-carry path (bounded per-task memory) AND produce the
    same values as the forced collect-fold path."""
    from ops_spark.operators import timeseries as TS

    n = 50
    df = spark.range(n).selectExpr(
        "1 AS k", "CAST(id AS double) AS t", "CAST(id % 7 AS double) AS v"
    )
    dispatched = {}
    orig = TS.ewma_chunked

    def spy(*args, **kwargs):
        dispatched["segment_len"] = kwargs.get("segment_len")
        return orig(*args, **kwargs)

    TS.ewma_chunked = spy
    try:
        auto = TS.ewma(df, "k", "t", "v", alpha=0.4, max_series_len=10)
        got = {(r.k, r.t): r.ewma for r in auto.collect()}
    finally:
        TS.ewma_chunked = orig
    # dispatch happened, with the documented sqrt-sized segments
    assert dispatched["segment_len"] == max(4096, int(n**0.5) + 1)
    plain = {
        (r.k, r.t): r.ewma
        for r in TS.ewma(df, "k", "t", "v", alpha=0.4, max_series_len=None).collect()
    }
    assert got.keys() == plain.keys()
    for key in plain:
        assert got[key] == pytest.approx(plain[key], rel=1e-9)
    # short series below the bound must NOT dispatch to the chunked path
    dispatched.clear()
    TS.ewma_chunked = spy
    try:
        short = TS.ewma(df.limit(5), "k", "t", "v", alpha=0.4, max_series_len=10)
        assert short.count() == 5
    finally:
        TS.ewma_chunked = orig
    assert dispatched == {}


def test_spatial_pairs_high_latitude_recall(spark):
    """The cos(lat) trap: at lat 59, 200 km spans ~2x more longitude
    degrees than at the equator. Points 3.4 lon-degrees apart at lat 59
    are within 200 km and MUST pair (a latitude-scaled cell edge would
    put them 2 cells apart and lose them)."""
    from ops_spark.operators.geo import equirect_km, spatial_self_pairs

    pts = [
        (1, 59.0, 10.0),
        (2, 59.0, 13.3),  # ~190 km away at this latitude
        (3, 59.0, 30.0),  # far
        (4, 0.0, 10.0),  # equator, far from all
    ]
    df = spark.createDataFrame(pts, "id long, lat double, lon double")
    got = {(r.id_a, r.id_b) for r in
           spatial_self_pairs(df, "id", "lat", "lon", 200.0).collect()}
    assert got == {(1, 2)}
    d = df.filter("id = 1").crossJoin(
        df.filter("id = 2").selectExpr("lat AS lat2", "lon AS lon2")
    ).select(equirect_km(F.col("lat"), F.col("lon"),
                         F.col("lat2"), F.col("lon2")).alias("d")).head().d
    assert 150 < d < 200


def test_knn_graph_recall_and_cluster_invariants(spark):
    """kNN graph over planted clusters: every member's top-k must be
    exactly its cluster-mates (within-cluster cos ~0.9999 vs ~|0.3|
    across random centers, and the seeded LSH tables' miss probability
    at that similarity is ~1e-14 — the test is deterministic); ranks
    contiguous, sims descending, no self edges. embedding_clusters must
    then give each planted cluster one label (= min member id) with the
    right size, and keep distinct clusters apart."""
    import numpy as np

    from ops_spark.operators.similarity import embedding_clusters, knn_graph

    rng = np.random.RandomState(7)
    centers = rng.randn(6, 64)
    rows, members = [], {}
    vid = 0
    for c in range(6):
        for _ in range(4):
            v = centers[c] + 0.01 * rng.randn(64)
            rows.append((vid, [float(x) for x in v]))
            members.setdefault(c, []).append(vid)
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    g = knn_graph(df, k=3, nbits=8, n_tables=4, dim=64).collect()
    per: dict = {}
    for r in g:
        per.setdefault(r.vec_id, []).append(r)
    for i, rs in per.items():
        assert sorted(x.rank for x in rs) == list(range(1, len(rs) + 1))
        assert all(x.neighbor != i for x in rs)
        sims = [x.sim for x in sorted(rs, key=lambda x: x.rank)]
        assert sims == sorted(sims, reverse=True)
    for _, ids in members.items():
        for i in ids:
            assert {x.neighbor for x in per[i]} == set(ids) - {i}
    cl = embedding_clusters(df, threshold=0.99, k=3, nbits=8, n_tables=4).collect()
    lab = {r.vec_id: r.cluster_id for r in cl}
    size = {r.vec_id: r.cluster_size for r in cl}
    assert len(lab) == vid
    for _, ids in members.items():
        assert {lab[i] for i in ids} == {min(ids)}
        assert all(size[i] == 4 for i in ids)
    assert len({lab[ids[0]] for ids in members.values()}) == 6


def test_spatial_nearest_join_bipartite(spark):
    """Bipartite kNN: per-left-point k nearest RIGHT points within the
    radius, a right row sharing the left row's id excluded as itself,
    ties broken by (dist, neighbor) — and with a small right side the
    candidate join must BROADCAST (the geo-enrichment contract: no
    shuffle proportional to the big side)."""
    from ops_spark.operators.geo import spatial_nearest_join

    pts = spark.createDataFrame(
        [(1, 0.0, 0.0), (2, 0.0, 5.0), (3, 50.0, 50.0)],
        "id long, lat double, lon double",
    )
    hubs = spark.createDataFrame(
        [(1, 0.0, 0.0), (10, 0.0, 1.0), (11, 0.0, 2.0), (12, 0.0, 40.0)],
        "id long, lat double, lon double",
    )
    out = spatial_nearest_join(pts, hubs, "id", "lat", "lon", 1000.0, k=2)
    got = {(r.id, r.rank): r.neighbor for r in out.collect()}
    # point 1: hub 1 is itself (excluded); 10 at ~111 km, 11 at ~223 km
    # point 2: 11 at ~334 km beats 10 at ~445 km beats 1 at ~557 km
    # point 3: nothing within 1000 km -> no rows
    assert got == {(1, 1): 10, (1, 2): 11, (2, 1): 11, (2, 2): 10}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_iterative_loops_free_superseded_checkpoint_blocks(spark):
    """DataFrame.unpersist() does NOT free localCheckpoint RDD blocks (it
    only uncaches CacheManager entries), so the iterative loops release
    superseded rounds at the RDD level via blocks.free_checkpoint. A long
    chain graph forces many rounds; afterwards only the RETURNED round's
    checkpoint may remain pinned."""
    from ops_spark.operators.blocks import _persistent_ids, free_checkpoint
    from ops_spark.operators.graph import connected_components

    base = _persistent_ids(spark)
    # chain 0-1-2-...-19: needs several pointer-jump rounds to converge
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "id_a long, id_b long"
    )
    cc = connected_components(edges, max_iterations=12)
    assert {r.comp for r in cc.collect()} == {0}
    leaked = _persistent_ids(spark) - base
    # one round's checkpoint = one RDD; allow the returned round only
    assert len(leaked) <= 1, f"superseded checkpoint RDDs leaked: {leaked}"
    free_checkpoint(cc)
    assert len(_persistent_ids(spark) - base) == 0


def test_embedding_cosine_pairs_handles_negative_ids(spark):
    """pmod(xxhash64(id)) chunking: negative bigint ids must produce the
    same pair set as a brute-force scan (a bare `id % P` sends them to
    negative chunks where the block explodes emit nothing — silent recall
    loss, not an error)."""
    import numpy as np

    from ops_spark.operators.dedup import embedding_cosine_pairs

    rng = np.random.default_rng(7)
    vecs = {i: rng.normal(size=8) for i in range(-6, 7)}
    vecs[-5] = vecs[4] + 0.001 * rng.normal(size=8)  # planted near-dup
    vecs[-2] = vecs[-6] + 0.001 * rng.normal(size=8)  # both ids negative
    df = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in vecs.items()],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r.id_a, r.id_b)
        for r in embedding_cosine_pairs(df, threshold=0.95, n_chunks=4).collect()
    }
    want = set()
    ids = sorted(vecs)
    for a in ids:
        for b in ids:
            if a < b:
                va, vb = vecs[a], vecs[b]
                cos = va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb))
                if cos >= 0.95:
                    want.add((a, b))
    assert (-6, -2) in want and (-5, 4) in want  # the planted pairs
    assert got == want


def test_numeric_histogram_clamps_fp_edge_into_top_bucket(spark):
    """width = (hi-lo)/nbins can round DOWN in fp; then a value just below
    hi floors to nbins and (without the least() clamp) lands in the
    overflow bucket nbins+1 despite being in-range."""
    import math

    from ops_spark.operators.analytics import numeric_histogram

    hi, nbins = 485.97910379315636, 13
    v = math.nextafter(hi, -math.inf)
    assert v < hi and math.floor(v / (hi / nbins)) + 1 == nbins + 1  # the trap
    df = spark.createDataFrame([(v,), (hi,), (-1.0,)], "value double")
    got = {r.bucket: r.n for r in
           numeric_histogram(df, "value", 0.0, hi, nbins).collect()}
    assert got == {nbins: 1, nbins + 1: 1, 0: 1}


def test_ewma_chunked_matches_plain_ewma(spark):
    """Segment-then-carry EWMA (bounded per-task memory) must reproduce
    the single-array fold: the recursion is affine in the incoming state,
    so re-associating it over segments is exact up to fp round-off."""
    import random

    from ops_spark.operators.timeseries import ewma, ewma_chunked

    random.seed(11)
    rows = [
        (k, i, random.uniform(-50, 50))
        for k in ["a", "b"]
        for i in range(103)  # not a multiple of segment_len: ragged tail
    ]
    # duplicate timestamps straddling a segment boundary: both variants
    # must fold ties in the SAME (t, v) order (chunked orders its
    # row_number window by (ts, value) to match array_sort(struct(t,v)))
    rows += [("a", 6, 9.0), ("a", 6, 1.0), ("a", 7, 4.0), ("a", 7, 2.0)]
    df = spark.createDataFrame(rows, "k string, t long, v double")
    plain = {
        (r.k, r.t, r.v): r.ewma
        for r in ewma(df, "k", "t", "v", alpha=0.42).collect()
    }
    chunked = {
        (r.k, r.t, r.v): r.ewma
        for r in ewma_chunked(df, "k", "t", "v", alpha=0.42, segment_len=7).collect()
    }
    assert plain.keys() == chunked.keys()
    for key, v in plain.items():
        assert abs(v - chunked[key]) < 1e-9, (key, v, chunked[key])


def test_quality_unique_formula_matches_groupby_with_nulls(spark):
    """The single-pass uniqueness formula (count(*) -
    count_distinct(struct(keys))) must equal the groupBy definition
    sum(c-1) — including NULL keys: struct() makes all-null tuples a
    countable group, which is exactly how groupBy treats them."""
    import random

    from pyspark.sql import functions as F

    from ops_spark.operators import quality as Qc

    random.seed(3)
    rows = [
        (random.choice([None, 1, 2, 3]), random.choice([None, "x", "y"]))
        for _ in range(300)
    ]
    df = spark.createDataFrame(rows, "a int, b string")
    rep = {
        r.rule: r.violations
        for r in Qc.check_constraints(df, unique=[["a"], ["a", "b"]]).collect()
    }
    for cols in (["a"], ["a", "b"]):
        brute = (
            df.groupBy(*cols)
            .agg(F.count("*").alias("c"))
            .filter(F.col("c") > 1)
            .agg(F.sum(F.col("c") - 1))
            .collect()[0][0]
        ) or 0
        assert rep[f"unique({','.join(cols)})"] == brute, cols


def test_gopher_rules_signals_and_verdict(spark):
    from ops_spark.operators.text import gopher_rules

    rows = [
        (1, "the cat and the dog have been to one of those houses with red"),
        (2, "### ... ### ... ###"),  # symbol soup: fails alpha + stopwords
        (3, ""),  # empty: all ratios 0, fails word count
        (4, "aa bb cc dd ee ff gg hh ii jj"),  # 10 words, no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in gopher_rules(df, min_words=5).collect()}
    assert out[1].passes_gopher and out[1].n_stopwords >= 2
    assert not out[2].passes_gopher
    assert out[2].symbol_ratio > 0.1 and out[2].alpha_frac == 0.0
    assert not out[3].passes_gopher
    assert out[3].n_words == 0 and out[3].mean_word_len == 0.0
    assert not out[4].passes_gopher  # stopword floor
    assert out[4].n_words == 10 and out[4].mean_word_len == 2.0


def test_global_order_index_is_permutation_and_stable(spark):
    from ops_spark.operators.mixing import global_order_index

    n = 257  # not a multiple of shard count, crosses bucket boundaries
    df = spark.range(n).withColumnRenamed("id", "doc_id")
    out = global_order_index(df, "doc_id", seed="7", n_shards=4, prefix_len=2)
    rows = out.collect()
    positions = sorted(r.pos for r in rows)
    assert positions == list(range(n))  # exact permutation, no gaps/dupes
    shard_sizes = sorted(
        out.groupBy("shard").count().rdd.map(lambda r: r["count"]).collect()
    )
    assert shard_sizes[-1] - shard_sizes[0] <= 1  # round-robin balance
    # Positions are a pure function of (data, seed): a different bucket
    # fan-out must yield the identical order.
    again = {
        r.doc_id: r.pos
        for r in global_order_index(
            df, "doc_id", seed="7", n_shards=4, prefix_len=3
        ).collect()
    }
    assert {r.doc_id: r.pos for r in rows} == again
    # And it equals the naive single-window global rank.
    import hashlib

    naive = sorted(
        range(n), key=lambda i: (hashlib.md5(f"7:{i}".encode()).hexdigest(), i)
    )
    assert [again[doc] for doc in naive] == list(range(n))


def test_char_bigram_lm_scores_tiny_corpus_by_hand(spark):
    import math

    from ops_spark.operators.text import char_bigram_lm_scores

    df = spark.createDataFrame(
        [(1, "abab"), (2, "ba"), (3, "x"), (4, "")], "doc_id long, text string"
    )
    out = {r.doc_id: r for r in char_bigram_lm_scores(df).collect()}
    # Corpus bigrams: ab,ba,ab (doc1) + ba (doc2) -> ab:2, ba:2.
    # Contexts: a->2, b->2. Charset {a,b,x} -> V=3.
    # Every bigram scores ln((2+1)/(2+3)) = ln(0.6).
    assert set(out) == {1, 2}  # len<2 docs produce no bigrams, no row
    assert out[1].n_bigrams == 3 and out[2].n_bigrams == 1
    expected = round(math.log(0.6), 4)
    assert out[1].avg_logp == expected == out[2].avg_logp


def test_tfidf_topk_by_hand(spark):
    import math

    from ops_spark.operators.retrieval import tfidf_topk

    df = spark.createDataFrame(
        [
            (1, "apple apple banana"),
            (2, "banana cherry"),
            (3, "cherry cherry cherry"),
        ],
        "doc_id long, text string",
    )
    out = tfidf_topk(df, k=2).collect()
    got = {(r.doc_id, r.term): r.tfidf for r in out}

    def idf(df_t):
        return math.log(4.0 / (df_t + 1)) + 1.0

    assert got[(1, "apple")] == round(2 * idf(1), 4)
    assert got[(1, "banana")] == round(1 * idf(2), 4)
    assert got[(3, "cherry")] == round(3 * idf(2), 4)
    # k=2 cap: doc 1 has exactly its 2 distinct terms, doc 2 both, doc 3 one.
    assert sorted(r.doc_id for r in out) == [1, 1, 2, 2, 3]


# ---------------------------------------------------------------------------
# round 7: hashed-BoW classifier, fluency buckets, inverted index, blocklist
# ---------------------------------------------------------------------------


def test_hashed_bow_score_matches_manual_hash(spark):
    """The Spark fold must equal a hand-computed md5 weight sum (pins the
    hashing-trick pipeline end-to-end: tokenize → bigram → bucket → weight)."""
    import hashlib

    from ops_spark.operators.text import hashed_bow_score

    text = "The quick FOX"
    toks = ["the", "quick", "fox"]
    feats = toks + ["the quick", "quick fox"]

    def h64(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    want = sum((h64(f"w#{h64(f) % (1 << 18)}") % 2001) - 1000 for f in feats)
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    row = hashed_bow_score(df).collect()[0]
    assert row.n_feats == 5
    assert row.w_sum_units == want
    assert row.keep == (want > 0)


def test_hashed_bow_score_empty_and_single_token(spark):
    from ops_spark.operators.text import hashed_bow_score

    df = spark.createDataFrame(
        [(1, ""), (2, "   "), (3, "solo")], "doc_id long, text string"
    )
    rows = {r.doc_id: r for r in hashed_bow_score(df).collect()}
    assert rows[1].n_feats == 0 and rows[1].w_sum_units == 0 and not rows[1].keep
    assert rows[2].n_feats == 0  # whitespace-only → no tokens
    assert rows[3].n_feats == 1  # one unigram, no bigram


def test_hashed_bow_score_is_zero_shuffle(spark):
    """The classifier must stay a pure map — no Exchange in the plan
    (the whole point of the hashing trick at 100 TB)."""
    from ops_spark.operators.text import hashed_bow_score

    df = spark.range(10).select(
        F.col("id").alias("doc_id"), F.lit("a b c").alias("text")
    )
    plan = hashed_bow_score(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_fluency_score_e6_exact_integer(spark):
    """fluency_e6 = floor(1e6 * sum(corpus-count of each bigram) / n_bigrams),
    hand-checked on a 2-doc corpus; docs with <2 chars are dropped."""
    from ops_spark.operators.text import fluency_score_e6

    df = spark.createDataFrame(
        [(1, "aaa"), (2, "ab"), (3, "x")], "doc_id long, text string"
    )
    # corpus bigrams: doc1 → aa, aa; doc2 → ab. counts: aa=2, ab=1
    rows = {r.doc_id: r for r in fluency_score_e6(df).collect()}
    assert set(rows) == {1, 2}  # doc 3 has no bigram
    assert rows[1].n_bigrams == 2 and rows[1].fluency_e6 == 2_000_000  # (2+2)/2
    assert rows[2].n_bigrams == 1 and rows[2].fluency_e6 == 1_000_000  # 1/1


def test_tertile_buckets_exact_thirds_and_tie_cohesion(spark):
    from ops_spark.operators.text import tertile_buckets

    # group g: 9 distinct scores → exact 3/3/3 head/middle/tail
    rows = [("g", 90 - i) for i in range(9)]
    # group t: 6 rows, ALL the same score → one histogram row; 3*cum(6) > 2*tot
    # → every tie lands together in 'tail'
    rows += [("t", 5)] * 6
    df = spark.createDataFrame(rows, "lang string, score long")
    out = tertile_buckets(df, "score", "lang").collect()
    g = sorted((r.score, r.bucket) for r in out if r.lang == "g")
    assert [b for _, b in g] == ["tail"] * 3 + ["middle"] * 3 + ["head"] * 3
    t = {r.bucket for r in out if r.lang == "t"}
    assert t == {"tail"}


def test_inverted_index_caps_postings_keeps_exact_df(spark):
    from ops_spark.operators.retrieval import inverted_index

    docs = spark.createDataFrame(
        [(i, "hot " + ("rare" if i == 3 else "x")) for i in range(10)],
        "doc_id long, text string",
    )
    idx = {r.term: r for r in inverted_index(docs, max_postings=4).collect()}
    assert idx["hot"].df == 10  # exact df, beyond the cap
    assert idx["hot"].postings == "0,1,2,3"  # first 4 ascending doc ids
    assert idx["rare"].df == 1 and idx["rare"].postings == "3"


def test_host_suffixes_and_blocklist_longest_match(spark):
    from ops_spark.operators.text import blocklist_categories, host_suffixes

    sfx = (
        spark.range(1)
        .select(host_suffixes(F.lit("a.b.example.com")).alias("s"))
        .collect()[0]
        .s
    )
    assert sfx == ["com", "example.com", "b.example.com", "a.b.example.com"]

    hosts = spark.createDataFrame(
        [
            (1, "src1.example.net"),  # matches example.net AND src1.example.net
            (2, "src9.example.net"),  # parent-domain match only
            (3, "clean.example.com"),  # no match
        ],
        "doc_id long, host string",
    )
    bl = spark.createDataFrame(
        [("example.net", "geo"), ("src1.example.net", "ads-specific")],
        "domain string, category string",
    )
    out = {r.doc_id: r.category for r in blocklist_categories(hosts, bl).collect()}
    assert out[1] == "ads-specific"  # longest domain wins over parent
    assert out[2] == "geo"
    assert out[3] is None


def test_interval_overlap_join_matches_brute_force(spark):
    """Property pin: bucketed overlap join == brute-force theta join,
    with tiny buckets so intervals span MANY buckets (the dedup-free
    canonical-bucket emission is what's under test) plus exact boundary
    touches (closed intervals: touch counts, gap of 1 us does not)."""
    import random

    from ops_spark.operators.timeseries import interval_overlap_join

    rnd = random.Random(7)
    rows = [
        (i % 5, rnd.randrange(0, 2000), rnd.randrange(0, 600))
        for i in range(120)
    ]
    mk = lambda tag: spark.createDataFrame(  # noqa: E731
        [(k, s, s + d, f"{tag}{i}") for i, (k, s, d) in enumerate(rows)],
        "k int, start_us long, end_us long, rid string",
    )
    left, right = mk("L"), mk("R")
    # boundary probes: exact touch (overlap 0) and 1-us gap (no match)
    left = left.union(
        spark.createDataFrame(
            [(9, 100, 200, "Ltouch"), (9, 400, 500, "Lgap")],
            "k int, start_us long, end_us long, rid string",
        )
    )
    right = right.union(
        spark.createDataFrame(
            [(9, 200, 300, "Rtouch"), (9, 501, 600, "Rgap")],
            "k int, start_us long, end_us long, rid string",
        )
    )
    got = sorted(
        (r.k, r.l_rid, r.r_rid, r.overlap_us)
        for r in interval_overlap_join(
            left, right, "k", bucket_us=100
        ).collect()
    )
    want = sorted(
        (lk, lr, rr, min(le, re) - max(ls, rs))
        for (lk, ls, le, lr) in left.collect()
        for (rk, rs, re, rr) in right.collect()
        if lk == rk and ls <= re and rs <= le
    )
    assert got == want and len(got) > 50
    assert ((9, "Ltouch", "Rtouch", 0) in got) and not any(
        r == "Rgap" for (_, l, r, _) in got if l == "Lgap"
    )


def test_k_core_converges_to_true_core(spark):
    """Peel-to-convergence must equal reference Python peeling: a 6-clique
    (5-core) survives k=3, a chain fringe peels away entirely, a 4-cycle
    is exactly a 2-core, and random noise resolves identically."""
    import random
    from collections import defaultdict

    from ops_spark.operators.graph import k_core

    rnd = random.Random(11)
    edges = set()
    for i in range(6):  # clique: every vertex degree 5
        for j in range(i + 1, 6):
            edges.add((i, j))
    edges |= {(5, 10), (10, 11), (11, 12)}  # chain fringe
    edges |= {(20, 21), (21, 22), (22, 23), (23, 20)}  # 2-core cycle
    for _ in range(40):  # noise
        a, b = rnd.randrange(30, 60), rnd.randrange(30, 60)
        if a != b:
            edges.add((a, b))
    df = spark.createDataFrame(sorted(edges), "id_a int, id_b int")

    def reference_core(k):
        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        while True:
            weak = [v for v, ns in adj.items() if len(ns) < k]
            if not weak:
                return {(v, len(ns)) for v, ns in adj.items()}
            for v in weak:
                for u in adj.pop(v, set()):
                    adj[u].discard(v)

    for k in (2, 3):
        got = {
            (r.id, r.core_degree)
            for r in k_core(df, k=k, rounds=None).collect()
        }
        assert got == reference_core(k), f"k={k}"
    assert {v for v, _ in reference_core(2)} >= {20, 21, 22, 23}

def test_k_core_convergence_costs_one_query_per_round(spark):
    """VERDICT r7 #6: peel-to-convergence detects the fixed point via an
    observed metric collected by the peel's OWN checkpoint query — no
    separate count() query per round. A 6-path with k=2 peels empty in 3
    rounds; the whole call must fit in rounds+3 SQL executions (the old
    shape ran 2 executions per round and blows this bound). Executions,
    not jobs: AQE legitimately splits one query into several jobs."""
    from ops_spark.operators.graph import k_core

    edges = [(i, i + 1) for i in range(5)]  # path 0-1-2-3-4-5
    df = spark.createDataFrame(edges, "id_a int, id_b int")
    store = spark._jsparkSession.sharedState().statusStore()
    before = store.executionsCount()
    out = k_core(df, k=2, rounds=None).collect()
    n_exec = store.executionsCount() - before
    assert out == []  # a path has no 2-core
    # 1 symmetrize-checkpoint + 3 peel checkpoints (fixpoint detected by
    # the 3rd's observed metric) + the empty-result collect = 5; the old
    # count-per-round shape needed >= 8
    assert n_exec <= 6, f"k-core ran {n_exec} queries - convergence is not folded"


def test_spatial_topk_density_gate_both_branches(spark):
    """spatial_topk_neighbors' density gate (r11 optimization) must be
    result-invariant: a SPARSE corpus (gate skips the r0 prefilter) and
    a DENSE corpus (gate keeps the two-phase plan) both match the
    brute-force ranking exactly."""
    import itertools
    import math

    from ops_spark.operators.geo import equirect_km, spatial_topk_neighbors

    def brute(pts, radius, k):
        out = set()
        for (i, la1, lo1) in pts:
            cand = []
            for (j, la2, lo2) in pts:
                if i == j:
                    continue
                mlat = math.radians((la1 + la2) / 2.0)
                cos = 1.0 - mlat * mlat / 2.0 + mlat ** 4 / 24.0
                dx = (lo2 - lo1) * cos * 111.32
                dy = (la2 - la1) * 111.32
                d = math.sqrt(dx * dx + dy * dy)
                if d <= radius:
                    cand.append((d, j))
            cand.sort()
            for rank, (d, j) in enumerate(cand[:k], start=1):
                out.add((i, j, rank))
        return out

    # sparse: 12 points hundreds of km apart -> expected in-r0 density
    # far below k, single-pass branch
    sparse = [(i, 10.0 + 3.0 * i, 5.0 * i) for i in range(12)]
    # dense: a 30-point cluster inside ~40 km -> phase 1 saturates
    dense = [
        (i, 40.0 + 0.06 * (i % 6), 7.0 + 0.08 * (i // 6)) for i in range(30)
    ]
    for pts in (sparse, dense):
        df = spark.createDataFrame(pts, "id long, lat double, lon double")
        got = {
            (r.id, r.neighbor, r.rank)
            for r in spatial_topk_neighbors(
                df, "id", "lat", "lon", radius_km=200.0, k=5
            ).collect()
        }
        assert got == brute(pts, 200.0, 5)


def test_materialize_if_large_gate_thresholds(spark, sf_dir):
    """Size-aware materialization gate (r12): below the threshold the frame
    is returned UNCHANGED (no checkpoint barrier at fixture scale); above
    it the result is an eagerly-materialized tracked checkpoint whose
    blocks free_checkpoint can release."""
    from pyspark.sql import functions as F

    from ops_spark.operators.blocks import (
        _persistent_ids,
        estimated_input_bytes,
        free_checkpoint,
        materialize_if_large,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    est = estimated_input_bytes(docs.select("doc_id", "text"))
    assert est > 0  # file-source leaves are sizable driver-side
    agg = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))

    inline = materialize_if_large(agg, threshold=est + 1)
    assert inline is agg  # below gate: identity, no barrier

    before = _persistent_ids(spark)
    ckpt = materialize_if_large(agg, threshold=est)
    assert ckpt is not agg
    pinned = _persistent_ids(spark) - before
    assert pinned  # eager checkpoint pinned blocks
    assert sorted(ckpt.collect()) == sorted(agg.collect())
    free_checkpoint(ckpt)
    assert not (_persistent_ids(spark) & pinned)


def test_gated_operators_identical_results_both_gate_sides(spark, sf_dir):
    """The three size-gated paths (char-bigram LM, funnel, minhash-LSH
    dedup) must compute identical rows whether the gate fires or not —
    the gate may only change plan shape, never results."""
    from pyspark.sql import functions as F

    from ops_spark.operators.analytics import funnel_steps
    from ops_spark.operators.dedup import minhash_lsh_dedup
    from ops_spark.operators.text import char_bigram_lm_scores

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    conf_key = "spark.ops_spark.materialize.minInputBytes"

    def both(build):
        spark.conf.set(conf_key, str(1 << 50))
        off = sorted(map(tuple, build().collect()))
        spark.conf.set(conf_key, "1")
        try:
            on = sorted(map(tuple, build().collect()))
        finally:
            spark.conf.unset(conf_key)
        return off, on

    off, on = both(lambda: char_bigram_lm_scores(docs))
    assert off == on and off
    off, on = both(
        lambda: funnel_steps(events, ["view", "click", "purchase"])
    )
    assert off == on and off
    off, on = both(
        lambda: minhash_lsh_dedup(docs.limit(300)).select("doc_id")
    )
    assert off == on and off


def test_pregel_check_every_zero_is_pure_fixed_iteration(spark):
    """check_every=0 contract (ADVICE r11): NEVER exit early, even though
    the free observe probe sees a no-change round — the escape hatch for
    non-deterministic vertex programs where the fixed-point argument does
    not hold. Pinned via Spark job counts: the already-converged graph
    below stabilizes in round 1, so auto mode (None) runs 1-2 rounds while
    check_every=0 must run all 5."""
    from pyspark.sql import functions as F

    from ops_spark.operators.pregel import MSG, pregel

    verts = spark.createDataFrame([(1, 0), (2, 0)], "id bigint, v bigint")
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src bigint, dst bigint")

    def run(**kw):
        ss = spark._jsparkSession.sparkContext().statusStore()
        j0 = ss.jobsList(None).size()
        out = pregel(
            verts,
            edges,
            update={"v": F.least(F.col("v"), F.col(MSG))},
            agg=F.min(F.col(MSG)),
            msg_to_dst=F.col("src_v"),
            max_iter=5,
            **kw,
        )
        rows = {r.id: r.v for r in out.collect()}
        return rows, ss.jobsList(None).size() - j0

    rows_auto, jobs_auto = run()
    rows_fixed, jobs_fixed = run(check_every=0)
    assert rows_auto == rows_fixed == {1: 0, 2: 0}
    assert jobs_fixed > jobs_auto  # 5 rounds vs early exit


def test_pregel_schema_dependent_message_falls_back_to_triplets(spark):
    """struct('*') resolves against ANY frame but expands per frame — the
    one-sided probe must detect the signature mismatch and fall back to
    the triplets join (ADVICE r11), else the message would silently
    include __tgt/__nbr/__dir and the doubled side aliases."""
    from pyspark.sql import functions as F

    from ops_spark.operators.pregel import MSG, pregel

    verts = spark.createDataFrame([(1, "a"), (2, "b")], "id bigint, v string")
    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    out = pregel(
        verts,
        edges,
        update={"v": F.coalesce(F.col(MSG), F.col("v"))},
        agg=F.max(F.col(MSG)),
        msg_to_dst=F.to_json(F.struct("*")),
        max_iter=1,
        check_every=0,
    )
    got = {r.id: r.v for r in out.collect()}
    # triplet semantics: all four triplet columns (join-key order),
    # nothing else — no __tgt/__nbr/__dir, no doubled side aliases
    assert got[2] == '{"edge_dst":2,"edge_src":1,"src_v":"a","dst_v":"b"}'
    assert got[1] == "a"


def test_pregel_uncoercible_dual_messages_fall_back(spark):
    """When the two one-sided message types cannot be unified by CaseWhen
    coercion (struct field names differ), the operator must fall back to
    the triplets/union shape instead of raising mid-loop (ADVICE r11)."""
    from pyspark.sql import functions as F

    from ops_spark.operators.pregel import MSG, pregel

    verts = spark.createDataFrame([(1, 5), (2, 7)], "id bigint, v bigint")
    edges = spark.createDataFrame([(1, 2)], "src bigint, dst bigint")
    out = pregel(
        verts,
        edges,
        update={"v": F.coalesce(F.col(MSG).getField("x"), F.col("v"))},
        agg=F.min(F.col(MSG)),
        msg_to_dst=F.struct(F.col("src_v").alias("x")),
        msg_to_src=F.struct(F.col("dst_v").alias("y")),
        max_iter=1,
        check_every=0,
    )
    got = {r.id: r.v for r in out.collect()}
    # set-operation widening unifies the structs positionally (field names
    # from the first branch): dst received {x:5}, src received {y:7}
    # re-labelled x=7 — standard Spark union semantics, and no exception
    assert got == {1: 7, 2: 5}


def test_pregel_state_column_named_prev_no_collision(spark):
    """A user state column literally named __prev_<other col> must survive:
    the old probe projected __prev_* mirrors of every state column into
    the checkpoint (duplicate-name analysis error + 2x pinned width);
    the changed-count now rides the pre-update frame (ADVICE r11)."""
    from pyspark.sql import functions as F

    from ops_spark.operators.pregel import MSG, pregel

    verts = spark.createDataFrame(
        [(1, 1, 9), (2, 2, 8)], "id bigint, comp bigint, __prev_comp bigint"
    )
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src bigint, dst bigint")
    out = pregel(
        verts,
        edges,
        update={"comp": F.least(F.col("comp"), F.col(MSG))},
        agg=F.min(F.col(MSG)),
        msg_to_dst=F.col("src_comp"),
        msg_to_src=F.col("dst_comp"),
        max_iter=4,
    )
    got = {r["id"]: (r["comp"], r["__prev_comp"]) for r in out.collect()}
    assert got == {1: (1, 9), 2: (1, 8)}
