"""Embedding similarity-search operators.

Not in the reference (no vector operations exist in Spark 2.4's SQL
surface). Two tiers:

- cosine_topk            — exact brute force: broadcast the query set,
                           one pass over the corpus, per-query top-k via
                           window. The oracle/baseline path.
- lsh_bucket / ann_topk  — random-hyperplane LSH: corpus is bucketed by
                           sign pattern; queries probe only their bucket
                           (+ optional multi-probe). The 100 TB path: probe
                           cost is corpus_size / 2^nbits per query instead
                           of corpus_size.
- ivf_topk               — IVF-Flat: data-adaptive coarse cells, exact
                           cosine inside the nprobe probed cells.
- ivfpq_topk             — IVF-PQ + exact re-rank: candidates scored on
                           m-byte product-quantized codes via per-query
                           ADC lookup tables, shortlist re-ranked on the
                           originals. The memory path: at 100 TB the raw
                           embeddings cannot live in cluster RAM, the
                           codes can.

Vector math uses zip_with/aggregate Column expressions (JVM, codegen) —
no Python boundary. Deterministic hyperplanes derive from a seeded RNG so
results are reproducible across runs and engines.
"""

from __future__ import annotations

import math
import random

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from ops_spark.plans.shuffle_policy import spread


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array<numeric> columns in double precision.

    Sequential left-fold (F.aggregate) — bit-identical to any engine that
    folds left in double, which is what makes the DuckDB oracle exact.
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_prenorm(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine(a, b) with the per-vector norms precomputed as columns.

    Bit-identical to cosine() (the division sees the same operand values;
    this is just common-subexpression elimination across pairs), but a
    join that scores P candidate pairs over N vectors does N norm folds
    instead of 2·P — the folds are interpreted higher-order functions,
    so on an all-pairs or LSH-candidate join this is the difference
    between 3 folds/pair and 1."""
    return dot(a, b) / (na * nb)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: broadcast queries × scan corpus.

    Cost model at scale: one corpus scan per batch of Q queries (not per
    query); the only shuffle is the per-query top-k window over Q×N/bucket
    rows. Keep Q bounded (≤ ~10k) per invocation; larger query sets should
    go through ann_topk.
    """
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    scored = spread(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__cv"),
        norm(F.col(vec_col)).alias("__cn"),
    ).crossJoin(F.broadcast(q))
    scored = scored.withColumn(
        "sim",
        F.round(
            cosine_prenorm(
                F.col("__cv"), F.col("__qv"), F.col("__cn"), F.col("__qn")
            ),
            6,
        ),
    )
    return _topk_window(scored, k)


def hyperplanes(dim: int, nbits: int, seed: int = 42) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes for sign-LSH."""
    rng = random.Random(seed)
    return [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(nbits)]


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id: bit j = 1 iff vec · plane_j > 0."""
    bucket = F.lit(0)
    for j, plane in enumerate(planes):
        arr = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(vec, arr) > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return bucket


def _topk_window(scored: DataFrame, k: int) -> DataFrame:
    """Shared tail: rank candidates per query, keep k, stable tie-break."""
    w = W.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "vec_id", "sim", F.col("rank").cast("int").alias("rank"))
    )


def ivf_centroids(
    corpus: DataFrame,
    n_centroids: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic uniform centroid sample: the n_centroids corpus
    vectors with the smallest md5(id). Driver-side payload is only
    n_centroids·dim floats (the index metadata every IVF system keeps
    centrally); the corpus itself is never collected.
    """
    rows = (
        corpus.select(
            F.col(vec_col).alias("c"),
            F.md5(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(n_centroids)
        .collect()
    )
    return [[float(x) for x in r.c] for r in rows]


def ivf_assign(centroids: list[list[float]], nprobe: int = 1):
    """Arrow-batched coarse quantizer: vector → array<int> of the nprobe
    nearest centroid ids by cosine. One BLAS matmul per batch against the
    unit-normalized centroid matrix (row norms cancel in argmax).
    """
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    C = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-300)
    p = min(nprobe, len(centroids))

    @pandas_udf("array<int>")
    def _assign(v: pd.Series) -> pd.Series:
        V = np.vstack(v.to_numpy()).astype(np.float64)
        sims = V @ C.T  # (n, n_centroids)
        top = np.argsort(-sims, axis=1, kind="stable")[:, :p].astype(np.int32)
        return pd.Series(list(top))

    return _assign


def kmeans_refine(
    corpus: DataFrame,
    centroids: list[list[float]],
    iters: int = 1,
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Lloyd iterations over the corpus: assign → per-cell mean → new
    centroids. The mean is a grouped applyInPandas (one shuffle on cell id
    per iteration, mapper-side Arrow batches); only the k×dim centroid
    matrix ever reaches the driver. Empty cells keep their old centroid.
    """
    dim = len(centroids[0])
    for _ in range(iters):
        assign = ivf_assign(centroids, nprobe=1)
        assigned = corpus.select(
            assign(F.col(vec_col))[0].alias("cell"), F.col(vec_col).alias("v")
        )

        def _mean(pdf: pd.DataFrame) -> pd.DataFrame:
            V = np.vstack(pdf["v"].to_numpy()).astype(np.float64)
            return pd.DataFrame(
                {"cell": [int(pdf["cell"].iloc[0])], "c": [V.mean(axis=0)]}
            )

        rows = (
            assigned.groupBy("cell")
            .applyInPandas(_mean, "cell int, c array<double>")
            .collect()
        )
        new = {r.cell: list(r.c) for r in rows}
        centroids = [new.get(i, c) for i, c in enumerate(centroids)]
        assert all(len(c) == dim for c in centroids)
    return centroids


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    refine_iters: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-Flat approximate top-k: coarse-quantize the corpus into
    n_centroids cells (sampled centroids, optional Lloyd refinement),
    probe the nprobe nearest cells per query, exact cosine inside.

    The complement of sign-LSH (ann_topk): data-adaptive cells follow the
    corpus distribution, so clustered corpora get balanced cells where
    fixed hyperplanes would hot-spot. Probe cost ≈ nprobe/n_centroids of
    the corpus per query via one equi-join on cell id — broadcastable
    query side, AQE-balanced corpus side, no all-pairs stage. At 100 TB:
    n_centroids scales with corpus size (√N rule), centroid matrix stays
    driver/broadcast-sized, and the per-cell scan is the same partition-
    pruned pattern as a bucketed join.
    """
    cents = ivf_centroids(corpus, n_centroids, id_col, vec_col)
    if refine_iters:
        cents = kmeans_refine(corpus, cents, refine_iters, vec_col)
    c = spread(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__cv"),
        norm(F.col(vec_col)).alias("__cn"),
        ivf_assign(cents, 1)(F.col(vec_col))[0].alias("cell"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__qn"),
        F.explode(ivf_assign(cents, nprobe)(F.col(vec_col))).alias("cell"),
    )
    scored = c.join(F.broadcast(q), "cell").withColumn(
        "sim",
        F.round(
            cosine_prenorm(
                F.col("__cv"), F.col("__qv"), F.col("__cn"), F.col("__qn")
            ),
            6,
        ),
    )
    return _topk_window(scored, k)


def pq_train(
    corpus: DataFrame,
    m: int = 8,
    nbits: int = 6,
    sample_n: int = 2048,
    iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Train product-quantization codebooks on a bounded, deterministic
    corpus sample (the sample_n vectors with the smallest md5(id) — the
    same hash-order device as ivf_centroids, so training is reproducible
    and only sample_n·dim floats ever reach the driver; FAISS trains its
    codebooks on a bounded sample the same way).

    Vectors are L2-normalized before training so asymmetric-distance
    lookups approximate COSINE directly (dot of unit vectors). Each of
    the m subspaces gets an independent k=2^nbits-centroid Lloyd
    k-means with deterministic init (first k sample rows in hash order);
    ties in argmin resolve to the lowest centroid id. Returns an
    (m, k_eff, dim/m) float64 array — k_eff < 2^nbits only when the
    corpus itself is smaller than the codebook.
    """
    rows = (
        corpus.select(
            F.col(vec_col).alias("c"),
            F.md5(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(sample_n)
        .collect()
    )
    return pq_train_rows([r.c for r in rows], m, nbits, iters)


def pq_train_rows(
    vecs: list, m: int = 8, nbits: int = 6, iters: int = 5
) -> np.ndarray:
    """pq_train's math over an already-collected hash-ordered sample —
    lets ivfpq_topk fetch ONE ordered sample serving both the centroid
    prefix and PQ training (the n_centroids smallest-md5 vectors are by
    definition a prefix of the sample_n smallest)."""
    X = np.asarray([[float(x) for x in c] for c in vecs], dtype=np.float64)
    nrm = np.linalg.norm(X, axis=1, keepdims=True)
    nrm[nrm == 0.0] = 1.0
    X = X / nrm
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    k = min(1 << nbits, len(X))
    books = np.empty((m, k, dsub), dtype=np.float64)
    for j in range(m):
        S = np.ascontiguousarray(X[:, j * dsub : (j + 1) * dsub])
        C = S[:k].copy()
        for _ in range(iters):
            # argmin ||s-c||^2 == argmin (-2 s.c + ||c||^2); np.argmin
            # takes the FIRST minimum, so ties are deterministic
            d = -2.0 * (S @ C.T) + (C * C).sum(axis=1)[None, :]
            a = d.argmin(axis=1)
            for ci in range(k):
                mask = a == ci
                if mask.any():
                    C[ci] = S[mask].mean(axis=0)
        books[j] = C
    return books


def pq_encode(codebooks: np.ndarray):
    """Arrow-batched PQ encoder: vector → array<smallint> of m codebook
    ids (the nearest sub-centroid per subspace, on the L2-normalized
    vector). One BLAS matmul per subspace per batch; the codebook
    (m·k·dsub floats) ships once inside the serialized UDF, never per
    row. At 768-dim/float32 a vector is 3 KB; its code is m bytes-ish —
    the ~100-400x compression that lets a 100 TB corpus's ANN index fit
    in cluster memory.
    """
    from pyspark.sql.functions import pandas_udf

    B = np.ascontiguousarray(codebooks, dtype=np.float64)
    m, _, dsub = B.shape

    @pandas_udf("array<smallint>")
    def _enc(v: pd.Series) -> pd.Series:
        V = np.asarray([np.asarray(x, dtype=np.float64) for x in v])
        nrm = np.linalg.norm(V, axis=1, keepdims=True)
        nrm[nrm == 0.0] = 1.0
        V = V / nrm
        out = np.empty((len(V), m), dtype=np.int16)
        for j in range(m):
            S = V[:, j * dsub : (j + 1) * dsub]
            d = -2.0 * (S @ B[j].T) + (B[j] * B[j]).sum(axis=1)[None, :]
            out[:, j] = d.argmin(axis=1).astype(np.int16)
        return pd.Series([row.tolist() for row in out])

    return _enc


def ivfpq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    m: int = 8,
    nbits: int = 6,
    n_centroids: int = 16,
    nprobe: int = 4,
    shortlist_factor: int = 4,
    sample_n: int = 2048,
    train_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-PQ approximate top-k with exact re-rank — the configuration
    real 100 TB vector search runs (FAISS IVFADC + refine):

    1. coarse IVF cells (sampled centroids) bound the probe set to
       ~nprobe/n_centroids of the corpus per query, via one equi-join;
    2. inside probed cells, candidates are scored by ASYMMETRIC DISTANCE:
       per query, an (m × k) lookup table of sub-centroid dots is built
       once, and each candidate costs m table gathers instead of a dim-
       wide dot — on m-byte codes, not the 3 KB raw vector, so the scan
       tier never touches the original embeddings;
    3. the top shortlist_factor·k by ADC score (ties broken by vec_id,
       order-independent) are re-ranked by EXACT cosine against the
       original vectors — a broadcast-sized join back by id — restoring
       recall the 32x-compressed codes alone would lose.

    Recall vs brute force is pinned in
    tests/test_operators.py::test_ivfpq_recall_vs_bruteforce; only
    centroid + codebook metadata (n_centroids·dim + m·2^nbits·dim/m
    floats) ever reaches the driver.
    """
    # ONE hash-ordered sample collect serves both metadata fits: the
    # n_centroids smallest-md5 vectors (ivf_centroids' definition) are a
    # prefix of the sample_n smallest (pq_train's), so slicing one
    # TakeOrdered result is bit-identical to the former two corpus passes
    # (guide §1.2 step 1).
    take = max(sample_n, n_centroids)
    rows = (
        corpus.select(
            F.col(vec_col).alias("c"),
            F.md5(F.col(id_col).cast("string")).alias("h"),
        )
        .orderBy("h")
        .limit(take)
        .collect()
    )
    cents = [[float(x) for x in r.c] for r in rows[:n_centroids]]
    books = pq_train_rows([r.c for r in rows[:sample_n]], m, nbits, train_iters)
    enc = pq_encode(books)
    mm, kk, dsub = books.shape
    short_n = max(k * shortlist_factor, k)

    c = spread(corpus).select(
        F.col(id_col).alias("vec_id"),
        ivf_assign(cents, 1)(F.col(vec_col))[0].alias("cell"),
        enc(F.col(vec_col)).alias("codes"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(ivf_assign(cents, nprobe)(F.col(vec_col))).alias("cell"),
    )
    # candidates shuffle as (query_id, vec_id, codes) ONLY — m smallints,
    # not the dim-double query vector; shipping __qv per candidate row
    # would largely cancel the m-byte-codes bandwidth win the ADC tier
    # exists to deliver. The explicit repartition puts the one hash
    # exchange BEFORE the broadcast join below, and BroadcastHashJoin
    # preserves the streamed side's partitioning, so the groupBy's
    # ClusteredDistribution(query_id) is already satisfied — the query
    # vector rides in map-side from a |queries|-row broadcast, never
    # through the shuffle (plan-pinned in
    # test_ivfpq_candidate_shuffle_excludes_query_vector).
    cand = (
        c.join(F.broadcast(q), "cell")
        .select("query_id", "vec_id", "codes")
        .repartition("query_id")
        .join(
            F.broadcast(
                queries.select(
                    F.col(query_id_col).alias("query_id"),
                    F.col(vec_col).alias("__qv"),
                )
            ),
            "query_id",
        )
    )

    B = np.ascontiguousarray(books, dtype=np.float64)

    def _adc(pdf: pd.DataFrame) -> pd.DataFrame:
        qv = np.asarray(pdf["__qv"].iloc[0], dtype=np.float64)
        qn = np.linalg.norm(qv)
        qv = qv / (qn if qn else 1.0)
        lut = np.empty((mm, kk), dtype=np.float64)
        for j in range(mm):
            lut[j] = B[j] @ qv[j * dsub : (j + 1) * dsub]
        codes = np.asarray(
            [np.asarray(cd, dtype=np.int64) for cd in pdf["codes"]]
        )
        scores = lut[np.arange(mm)[None, :], codes].sum(axis=1)
        ids = pdf["vec_id"].to_numpy()
        # lexsort: primary = score desc, secondary = vec_id asc — the cut
        # is identical whatever order candidate rows arrived in
        order = np.lexsort((ids, -scores))[:short_n]
        return pd.DataFrame(
            {
                "query_id": pdf["query_id"].iloc[0],
                "vec_id": ids[order],
                "approx": scores[order],
            }
        )

    short = cand.groupBy("query_id").applyInPandas(
        _adc, "query_id long, vec_id long, approx double"
    )
    orig = spread(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__cv"),
        norm(F.col(vec_col)).alias("__cn"),
    )
    qx = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv2"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    scored = (
        orig.join(F.broadcast(short), "vec_id")
        .join(F.broadcast(qx), "query_id")
        .withColumn(
            "sim",
            F.round(
                cosine_prenorm(
                    F.col("__cv"), F.col("__qv2"), F.col("__cn"), F.col("__qn")
                ),
                6,
            ),
        )
    )
    return _topk_window(scored, k)


def lsh_buckets_batch(planes_tables: list[list[list[float]]]):
    """Arrow-batched sign-LSH bucketing for MANY projections at once.

    Returns a pandas_udf: array<float> vector → array<int> of per-table
    bucket ids. The Column-expression lsh_bucket() is right for a handful
    of planes; past ~32 projections/row the codegen expression (one
    zip_with+aggregate fold per plane, all-literal plane arrays) dominates
    both compile and run time. Here all T·B plane dots collapse into ONE
    BLAS matmul per Arrow batch — (batch × dim) @ (dim × T·B) — which is
    the fastest shape for this work at any scale, and the plan stays one
    ArrowEvalPython node instead of thousands of expression nodes.
    """
    from pyspark.sql.functions import pandas_udf

    P = np.asarray(planes_tables, dtype=np.float64)  # (T, B, dim)
    n_tables, nbits, _ = P.shape
    M = P.reshape(n_tables * nbits, -1).T  # (dim, T·B)
    weights = 1 << np.arange(nbits)

    @pandas_udf("array<int>")
    def _buckets(v: pd.Series) -> pd.Series:
        V = np.vstack(v.to_numpy()).astype(np.float64)  # (n, dim)
        bits = (V @ M) > 0  # (n, T·B)
        b = (bits.reshape(len(V), n_tables, nbits) * weights).sum(axis=2)
        return pd.Series(list(b.astype(np.int32)))

    return _buckets


def ann_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nbits: int = 4,
    dim: int = 64,
    seed: int = 42,
    multiprobe: bool = True,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: equi-join on LSH bucket, exact cosine inside.

    2^nbits buckets. With multiprobe, each query also probes the nbits
    buckets at Hamming distance 1 (sign flips are where near-neighbors
    leak), trading probe cost (nbits+1)/2^nbits of the corpus for recall.
    The join stays a plain equi join on the bucket id: broadcastable query
    side, AQE-balanced corpus side — no all-pairs stage at any scale.
    """
    planes = hyperplanes(dim, nbits, seed)
    c = spread(corpus).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("__cv"),
        norm(F.col(vec_col)).alias("__cn"),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
    )
    base = lsh_bucket(F.col(vec_col), planes)
    probe_buckets = (
        F.array(base, *[base.bitwiseXOR(F.lit(1 << j)) for j in range(nbits)])
        if multiprobe
        else F.array(base)
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__qn"),
        F.explode(probe_buckets).alias("bucket"),
    )
    # no candidate dedup needed: the nbits+1 probe buckets per query are
    # distinct and a corpus vector lives in exactly one bucket, so each
    # (query, vector) pair joins at most once.
    scored = c.join(F.broadcast(q), "bucket").withColumn(
        "sim",
        F.round(
            cosine_prenorm(
                F.col("__cv"), F.col("__qv"), F.col("__cn"), F.col("__qn")
            ),
            6,
        ),
    )
    return _topk_window(scored, k)


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", prefix: str = "q"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|v| / 127,
    q_i = floor(v_i / scale + 0.5) clamped to [-127, 127] — the 4×
    storage/bandwidth cut an ANN serving tier takes before distance
    rescoring (error bound ≤ scale/2 per component).

    Engine-reproducible by construction: float32 inputs widen to exact
    doubles, and floor(x + 0.5) is deterministic IEEE arithmetic (unlike
    round(), whose half-way rule differs across engines). The scale is
    exported as integer micro-units for the same reason. Pure codegen,
    zero shuffle.
    """
    v = F.col(vec_col)
    scale = F.aggregate(
        v, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double")))
    ) / F.lit(127.0)
    q = F.transform(
        v,
        lambda x: F.greatest(
            F.lit(-127),
            F.least(
                F.lit(127),
                F.floor(x.cast("double") / F.col(f"{prefix}_scale") + 0.5).cast("int"),
            ),
        ),
    )
    return df.withColumn(f"{prefix}_scale", scale).withColumn(
        f"{prefix}_scale_micro", F.floor(F.col(f"{prefix}_scale") * 1e6).cast("bigint")
    ).withColumn(f"{prefix}_vec", q)


def knn_graph(
    df: DataFrame,
    k: int = 5,
    nbits: int = 8,
    n_tables: int = 4,
    dim: int = 64,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate k-nearest-neighbor GRAPH: (id, neighbor, sim, rank)
    with each vector's k highest-cosine neighbors among its sign-LSH
    candidates — the curation primitive downstream clustering/SemDeDup
    passes consume. Ids must be (castable to) bigint.

    Same multi-table OR-amplified blocking as embedding_dedup's scale
    tier: n_tables independent plane sets, Hamming-1 multiprobe on the
    probe side, all tables riding one cogrouped join keyed on
    (table << nbits) | bucket. Per bucket, one numpy GEMM scores the
    probe x build block and keeps each probe row's local top-k; the
    GLOBAL top-k per vector is then a window over the per-bucket
    winners. That containment is exact, not heuristic: a vector in the
    global top-k of candidate set C has < k better candidates in ALL of
    C, hence < k better in any single bucket, hence survives that
    bucket's local cut — where "better" is the full (sim desc, neighbor
    asc) key, applied identically in the local cut and the global
    window, so equal-sim ties resolve partition-order independently. Shuffle volume is the exploded key rows
    (|df| x n_tables x (nbits+2) x vec bytes), never candidate pairs.
    """
    from pyspark.sql import types as T_

    id_type = df.schema[id_col].dataType
    if not isinstance(
        id_type, (T_.ByteType, T_.ShortType, T_.IntegerType, T_.LongType)
    ):
        raise TypeError(
            f"knn_graph requires an integral id column; "
            f"{id_col!r} is {id_type.simpleString()}"
        )
    buckets = lsh_buckets_batch(
        [hyperplanes(dim, nbits, seed + t) for t in range(n_tables)]
    )
    src = (
        spread(df)
        .select(
            F.col(id_col).cast("long").alias("id"),
            F.col(vec_col).cast("array<double>").alias("__v"),
            norm(F.col(vec_col)).alias("__n"),
        )
        .withColumn("__bk", buckets(F.col("__v")))
    )
    build_keys, probe_keys = [], []
    for t in range(n_tables):
        base = F.col("__bk")[t]
        tag = F.lit(t << nbits)
        build_keys.append(tag.bitwiseOR(base))
        probe_keys.append(tag.bitwiseOR(base))
        probe_keys.extend(
            tag.bitwiseOR(base.bitwiseXOR(F.lit(1 << j))) for j in range(nbits)
        )
    a = src.select(
        F.col("id").alias("id_a"),
        F.col("__v").alias("__va"),
        F.col("__n").alias("__na"),
        F.explode(F.array(*probe_keys)).alias("__key"),
    )
    b = src.select(
        F.col("id").alias("id_b"),
        F.col("__v").alias("__vb"),
        F.col("__n").alias("__nb"),
        F.explode(F.array(*build_keys)).alias("__key"),
    )
    kk = int(k)

    def _bucket_topk(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
        if left.empty or right.empty:
            return pd.DataFrame(
                {
                    "id": pd.Series([], dtype="int64"),
                    "neighbor": pd.Series([], dtype="int64"),
                    "sim": pd.Series([], dtype="float64"),
                }
            )
        A = np.vstack(left["__va"].to_numpy()).astype(np.float64)
        B = np.vstack(right["__vb"].to_numpy()).astype(np.float64)
        ia = left["id_a"].to_numpy()
        ib = right["id_b"].to_numpy()
        S = (A @ B.T) / np.outer(left["__na"].to_numpy(), right["__nb"].to_numpy())
        S[ia[:, None] == ib[None, :]] = -np.inf  # a vector is not its own neighbor
        take = min(kk, S.shape[1])
        # local top-k per probe row under the SAME key the global window
        # orders by — (sim desc, neighbor asc) — so the containment
        # argument survives equal-sim ties: an argpartition cut on sim
        # alone could locally drop the tie the global tie-break would
        # keep. lexsort's last key is primary; buckets are capped, so the
        # full per-row sort stays bounded.
        idx = np.lexsort((np.broadcast_to(ib, S.shape), -S), axis=1)[:, :take]
        r = np.repeat(np.arange(len(ia)), take)
        c = idx.ravel()
        keep = np.isfinite(S[r, c])
        return pd.DataFrame(
            {
                "id": ia[r[keep]],
                "neighbor": ib[c[keep]],
                "sim": S[r[keep], c[keep]],
            }
        )

    edges = (
        a.groupBy("__key")
        .cogroup(b.groupBy("__key"))
        .applyInPandas(_bucket_topk, "id long, neighbor long, sim double")
    )
    # the same (id, neighbor) pair surfaces from every shared bucket with
    # the identical sim (same doubles, same GEMM) — collapse before
    # ranking so duplicates cannot occupy top-k slots
    uniq = edges.dropDuplicates(["id", "neighbor"])
    w = W.partitionBy("id").orderBy(F.desc("sim"), "neighbor")
    return (
        uniq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= kk)
        .select(
            F.col("id").alias(id_col),
            "neighbor",
            F.round("sim", 6).alias("sim"),
            F.col("rank").cast("int").alias("rank"),
        )
    )


def embedding_clusters(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **knn_kwargs,
) -> DataFrame:
    """Near-duplicate CLUSTER ids: connected components over the kNN
    graph's edges with cosine >= threshold. GROUPS near-dups instead of
    dropping them (embedding_dedup's complement): downstream curation
    picks per-cluster representatives, caps cluster contribution, or
    audits what would be deduped. Vectors with no qualifying edge are
    singleton clusters of themselves.
    Output: (id, cluster_id = min id in cluster, cluster_size)."""
    from pyspark.sql.window import Window as W

    from ops_spark.operators.graph import connected_components

    edges = knn_graph(df, id_col=id_col, vec_col=vec_col, **knn_kwargs).filter(
        F.col("sim") >= threshold
    )
    cc = connected_components(edges, src=id_col, dst="neighbor")
    labeled = (
        spread(df)
        .select(F.col(id_col).cast("long").alias("id"))
        .join(cc, "id", "left")
        .select(
            "id", F.coalesce("comp", F.col("id")).alias("cluster_id")
        )
    )
    # cluster_size as a window count over the SAME cluster_id key: one
    # exchange, and `labeled` (vector scan + label join) executes once —
    # the former groupBy + join-back re-ran the whole labeled subplan as
    # the aggregate's second input (guide §2.4: two operations keyed the
    # same way share one exchange).
    return labeled.select(
        F.col("id").alias(id_col),
        "cluster_id",
        F.count(F.lit(1)).over(W.partitionBy("cluster_id")).alias("cluster_size"),
    )


def dimension_stats(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension corpus statistics from exact integer sums: components
    are floor-quantized to e6 micro-units so Σx and Σx² are BIGINT-exact
    and order-independent (a float Σ over millions of rows drifts with
    partition order — enough to flip a downstream rounding boundary).
    Returns (dim, n, mu, sd) — one row per dimension, broadcast-sized for
    any corpus. The linear sum quantizes at e6 (Σx_e6 at 1e9 rows/dim is
    x·1e15 — comfortable); the SQUARED sum quantizes at e4, because
    Σ(x_e6²) is x²·1e12 per row and already exceeds int64 for |x| > ~3
    at just 1e6 rows/dim — in non-ANSI Spark the BIGINT sum would wrap
    SILENTLY. At e4 the squared sum is x²·1e8 per row: |x| ≤ ~9 stays
    exact at 1e9 rows/dim (unit-scale embeddings are far inside), and
    the e-8 variance grain is noise relative to any real sd.
    """
    comp = corpus.select(
        F.col(id_col), F.posexplode(F.col(vec_col)).alias("dim", "x")
    )
    q = F.floor(F.col("x") * 1e6 + 0.5).cast("bigint")
    q4 = F.floor(F.col("x") * 1e4 + 0.5).cast("bigint")
    stats = comp.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).alias("s"),
        F.sum(q4 * q4).alias("ss"),
    )
    mu = F.col("s") / 1e6 / F.col("n")
    return stats.select(
        "dim",
        "n",
        mu.alias("mu"),
        F.sqrt(
            F.col("ss") / 1e8 / F.col("n")
            - (F.col("s") / 1e6 / F.col("n")) * (F.col("s") / 1e6 / F.col("n"))
        ).alias("sd"),
    )


def standardize_embeddings(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-dimension standardization (whitening-lite) — the ANN
    preprocessing pass that stops one high-variance dimension from
    dominating every cosine/LSH bucket decision on anisotropic
    embeddings.

    The 64-row stats table folds into TWO 1-row map columns
    (map_from_entries over collect_list — index metadata, the same
    driver-free contract as IVF centroids) that broadcast to the scan;
    standardization is then a single codegen transform per vector — no
    join back, no reassembly shuffle. z-scores are floor-quantized to e4
    BIGINTs (constant dimensions, sd = 0, map to 0), so output is exact,
    order-independent, and engine-reproducible. Returns (id, z4:
    array<bigint>).
    """
    maps = dimension_stats(corpus, id_col, vec_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("dim"), F.col("mu")))
        ).alias("mu_map"),
        F.map_from_entries(
            F.collect_list(F.struct(F.col("dim"), F.col("sd")))
        ).alias("sd_map"),
    )
    xq = lambda x: F.floor(x * 1e6 + 0.5).cast("bigint") / 1e6  # noqa: E731
    return (
        spread(corpus)
        .crossJoin(F.broadcast(maps))
        .select(
            F.col(id_col),
            F.transform(
                F.col(vec_col),
                lambda x, i: F.when(
                    F.element_at(F.col("sd_map"), i) == 0.0, F.lit(0)
                )
                .otherwise(
                    F.floor(
                        (xq(x) - F.element_at(F.col("mu_map"), i))
                        / F.element_at(F.col("sd_map"), i)
                        * 1e4
                        + 0.5
                    )
                )
                .cast("bigint"),
            ).alias("z4"),
        )
    )
