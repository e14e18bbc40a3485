"""LLM-data-pipeline queries over documents/embeddings (SURVEY.md §7 step 9).

These wire ops_spark.operators.{text,dedup,similarity,multimodal} into the
conformance registry. Where the operator's math is engine-reproducible
(md5-based hashing, double left-folds) the DuckDB oracle recomputes the
ENTIRE pipeline — including MinHash signatures and SimHash fingerprints —
bit-for-bit; only sign-LSH ANN is rows-only (hyperplane sign boundaries are
not stable across float parsers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ops_spark.io import load_table
from ops_spark.operators import dedup as D
from ops_spark.operators import multimodal as M
from ops_spark.operators import similarity as S
from ops_spark.operators import text as T
from ops_spark.queries.registry import register

_MERSENNE31 = (1 << 31) - 1

# DuckDB equivalent of ops_spark.operators.text.tokens / dedup.shingles —
# identical tokenization (\s+ split, empties dropped) and 3-gram shingling.
_SQL_TOKS = r"list_filter(string_split_regex(text, '\s+'), x -> x <> '')"
_SQL_SHINGLES = (
    "list_distinct(list_transform(range(1, greatest(len(t) - 2, 0) + 1), "
    "i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))"
)


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _minhash_sig_sql(k: int = 32, seed: int = 42) -> str:
    """The k min-expressions reproducing minhash_signature() in DuckDB."""
    mins = ", ".join(
        f"list_min(list_transform(hs, x -> ({a} * x + {b}) % {_MERSENNE31}))"
        for a, b in D.permutation_params(k, seed)
    )
    return f"[{mins}]"


def _simhash_fp_sql() -> str:
    """The 32-bit SimHash fingerprint expression reproducing simhash32()."""
    terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> ((h >> {i}) & 1) * 2 - 1)) > 0 "
        f"THEN {1 << i} ELSE 0 END)"
        for i in range(32)
    )
    return f"CAST({terms} AS BIGINT)"


@register(
    "llm_exact_dedup",
    oracle="""
    SELECT doc_id, lang, source, n_chars
    FROM documents
    QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    """,
    description="Exact dedup on content digest (hash-groupBy, keep lowest id).",
    tags=("llm", "dedup"),
)
def llm_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return D.exact_dedup(docs, ["text"], "doc_id").select(
        "doc_id", "lang", "source", "n_chars"
    )


@register(
    "llm_fingerprint_dedup",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, lang,
             md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
             )), ' ')) AS fprint
      FROM documents
    )
    SELECT doc_id, lang, fprint
    FROM fp
    QUALIFY row_number() OVER (PARTITION BY fprint ORDER BY doc_id) = 1
    """,
    description="Key-collision fingerprint dedup (sorted distinct tokens → md5).",
    tags=("llm", "dedup", "fingerprint"),
)
def llm_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").withColumn(
        "fprint", T.fingerprint("text")
    )
    return D.exact_dedup(docs, ["fprint"], "doc_id").select("doc_id", "lang", "fprint")


@register(
    "llm_winnow_fingerprints",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             CASE WHEN length(text) >= 8
               THEN list_transform(range(1, length(text) - 8 + 2),
                      i -> ('0x' || substr(md5(substring(text, i, 8)), 1, 15))::BIGINT)
               ELSE []::BIGINT[] END AS hs
      FROM documents
    )
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(
             CASE WHEN len(hs) = 0 THEN []::BIGINT[]
                  WHEN len(hs) < 4 THEN [list_min(hs)]
                  ELSE list_transform(range(1, len(hs) - 4 + 2),
                         j -> list_min(hs[j:j+3]))
             END)), ',') AS fprints
    FROM g
    """,
    description="Winnowing rolling-hash fingerprints (k=8 char-grams, w=4 "
    "windows) — shared substrings of length >= 11 guarantee a shared print. "
    "Fingerprint sets are csv-joined on both sides: the driver canonicalizer "
    "cannot sort raw array cells.",
    tags=("llm", "text", "fingerprint"),
)
def llm_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.array_join(
            F.sort_array(F.array_distinct(T.winnow_fingerprints("text", k=8, w=4))),
            ",",
        ).alias("fprints"),
    )


@register(
    "llm_ngram_jaccard_pairs",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks
    ), ex AS (  -- inverted shingle index: prefilter to pairs sharing >=1
      SELECT doc_id, unnest(list_distinct(s)) AS shingle FROM sh
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    )
    SELECT c.id_a, c.id_b,
           round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6)
             AS jaccard
    FROM cand c JOIN sh a ON a.doc_id = c.id_a JOIN sh b ON b.doc_id = c.id_b
    WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
    """,
    description="Exact n-gram Jaccard near-dup pairs via inverted shingle index.",
    tags=("llm", "dedup", "jaccard"),
)
def llm_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return D.ngram_jaccard_pairs(docs, threshold=0.8)


@register(
    "llm_minhash_lsh_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks
    ), h AS (
      SELECT doc_id, list_transform(s, x -> ('0x' || substr(md5(x), 1, 8))::BIGINT) AS hs
      FROM sh
    ), sig AS (
      SELECT doc_id, {_minhash_sig_sql()} AS sig FROM h WHERE len(hs) > 0
    ), bands AS (
      SELECT doc_id,
             unnest(range(8)) AS band,
             unnest(list_transform(range(8),
               b -> md5(array_to_string(list_slice(sig, b*4 + 1, b*4 + 4), ',')))) AS bucket
      FROM sig
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
                                AND a.doc_id < b.doc_id
    ), verified AS (
      SELECT id_a, id_b
      FROM cand
      JOIN sh sa ON sa.doc_id = id_a
      JOIN sh sb ON sb.doc_id = id_b
      WHERE CASE WHEN len(list_distinct(list_concat(sa.s, sb.s))) > 0
            THEN CAST(len(list_intersect(sa.s, sb.s)) AS DOUBLE)
                 / len(list_distinct(list_concat(sa.s, sb.s)))
            ELSE 0.0 END >= 0.8
    )
    SELECT d.doc_id, d.lang, d.source
    FROM documents d
    LEFT JOIN (SELECT DISTINCT id_b FROM verified) losers ON d.doc_id = losers.id_b
    WHERE losers.id_b IS NULL
    """,
    description="MinHash-LSH near-dedup survivors; oracle recomputes signatures bit-exact.",
    tags=("llm", "dedup", "minhash", "lsh"),
)
def llm_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return D.minhash_lsh_dedup(
        docs, threshold=0.8, k=32, bands=8, n=3, seed=42
    ).select("doc_id", "lang", "source")


@register(
    "llm_simhash",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ), h AS (
      SELECT doc_id,
             list_transform(t, x -> ('0x' || substr(md5(x), 1, 15))::BIGINT) AS hs
      FROM toks
    )
    SELECT doc_id, {_simhash_fp_sql()} AS simhash
    FROM h
    """,
    description="32-bit SimHash fingerprints; oracle recomputes bit-exact.",
    tags=("llm", "dedup", "simhash"),
)
def llm_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return D.simhash_fingerprints(docs).select(
        F.col("__id").alias("doc_id"), F.col("__fp").alias("simhash")
    )


@register(
    "x_llm_simhash_candidates",
    oracle=None,  # banding layout is engine-internal; fingerprints are
    # oracle-verified by llm_simhash, candidates checked rows-only.
    description="SimHash near-dup candidate pairs (Hamming ≤ 3 via byte-banding).",
    tags=("llm", "dedup", "simhash"),
)
def x_llm_simhash_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return D.simhash_candidates(docs, max_hamming=3).select(
        "id_a", "id_b", "hamming"
    )


@register(
    "llm_text_stats",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t,
             length(text) AS nc,
             len(regexp_extract_all(text, '[^\w\s]')) AS punct,
             len(regexp_extract_all(text, '[0-9]')) AS digits
      FROM documents
    ), m AS (
      SELECT doc_id, len(t) AS ntok, nc, punct, digits,
             len(list_filter(t, x -> list_contains(['the','a','of','and','is'],
                                                   lower(x)))) AS nstop
      FROM s
    )
    SELECT doc_id,
           CAST(ntok AS BIGINT) AS n_tokens_ws,
           round(CASE WHEN ntok > 0 THEN CAST(nc AS DOUBLE) / ntok ELSE 0.0 END, 4)
             AS avg_token_len,
           round(CASE WHEN ntok > 0 THEN CAST(nstop AS DOUBLE) / ntok ELSE 0.0 END, 4)
             AS stopword_ratio,
           round(CASE WHEN nc > 0 THEN CAST(punct AS DOUBLE) / nc ELSE 0.0 END, 4)
             AS punct_ratio,
           round(CASE WHEN nc > 0 THEN CAST(digits AS DOUBLE) / nc ELSE 0.0 END, 4)
             AS digit_ratio
    FROM m
    """,
    description="Per-document quality signals: token counts, ratios.",
    tags=("llm", "text"),
)
def llm_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return T.with_text_stats(docs).select(
        "doc_id",
        "n_tokens_ws",
        "avg_token_len",
        "stopword_ratio",
        "punct_ratio",
        "digit_ratio",
    )


@register(
    "llm_language_id",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, lang,
             list_transform(
               list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''),
               x -> x) AS w
      FROM documents
    ), c AS (
      SELECT doc_id, lang,
        len(list_filter(w, x -> list_contains(['der','die','das','und','ist'], x))) AS n_de,
        len(list_filter(w, x -> list_contains(['the','a','of','and','is'], x)))     AS n_en,
        len(list_filter(w, x -> list_contains(['el','la','los','y','es'], x)))      AS n_es,
        len(list_filter(w, x -> list_contains(['le','la','les','et','est'], x)))    AS n_fr
      FROM t
    )
    SELECT doc_id, lang AS lang_label,
           CASE WHEN n_de > 0 AND n_de >= n_en AND n_de >= n_es AND n_de >= n_fr THEN 'de'
                WHEN n_en > 0 AND n_en >= n_es AND n_en >= n_fr THEN 'en'
                WHEN n_es > 0 AND n_es >= n_fr THEN 'es'
                WHEN n_fr > 0 THEN 'fr'
                ELSE 'und' END AS lang_guess
    FROM c
    """,
    description="Stopword-vote language ID (deterministic alphabetical tie-break).",
    tags=("llm", "text", "lang-id"),
)
def llm_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.col("lang").alias("lang_label"),
        T.language_id("text").alias("lang_guess"),
    )


@register(
    "llm_token_count",
    oracle=r"""
    SELECT doc_id,
           CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
                AS BIGINT) AS n_ws,
           CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                AS BIGINT) AS n_bpe
    FROM documents
    """,
    description="Token counting: whitespace + BPE-ish pre-tokenizer regex.",
    tags=("llm", "text", "tokens"),
)
def llm_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(T.tokens("text")).cast("bigint").alias("n_ws"),
        T.token_count_bpe("text").alias("n_bpe"),
    )


@register(
    "llm_pipeline_filter_dedup",
    oracle=r"""
    WITH s AS (
      SELECT doc_id, source, text,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t,
             length(text) AS nc,
             len(regexp_extract_all(text, '[^\w\s]')) AS punct
      FROM documents
    ), m AS (
      SELECT doc_id, source, text, len(t) AS ntok, nc, punct,
             len(list_filter(t, x -> list_contains(['the','a','of','and','is'],
                                                   lower(x)))) AS nstop,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
               AS nbpe
      FROM s
    ), sc AS (
      SELECT *,
        round(
          (CASE WHEN ntok BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.2 END)
          * (CASE WHEN ntok > 0 AND CAST(nc AS DOUBLE)/ntok BETWEEN 2.0 AND 12.0
             THEN 1.0 ELSE 0.5 END)
          * (CASE WHEN ntok > 0 AND CAST(nstop AS DOUBLE)/ntok >= 0.01
             THEN 1.0 ELSE 0.7 END)
          * (1 - LEAST((CASE WHEN nc > 0 THEN CAST(punct AS DOUBLE)/nc
                        ELSE 0.0 END) * 2.0, 0.5)), 4) AS q
      FROM m
    )
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(nbpe) AS BIGINT) AS total_bpe_tokens,
           round(avg(q), 4) AS avg_quality
    FROM (
      SELECT * FROM sc WHERE q >= 0.5 AND ntok >= 10
      QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    )
    GROUP BY source
    """,
    description="End-to-end pretraining-data pipeline: quality filter → "
    "exact dedup → per-source token accounting, one composed plan.",
    tags=("llm", "pipeline", "dedup", "text"),
)
def llm_pipeline_filter_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composition flagship: every stage is a reusable operator
    (with_text_stats → exact_dedup → aggregate) and the whole pipeline
    stays one Catalyst plan — filters reach the scan, the dedup window
    and final aggregate are the only wide stages."""
    docs = _t(spark, sf_dir, "documents")
    stats = T.with_text_stats(docs)
    kept = stats.filter(
        (F.col("quality_score") >= 0.5) & (F.col("n_tokens_ws") >= 10)
    )
    deduped = D.exact_dedup(kept, ["text"], "doc_id")
    return deduped.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens_bpe").cast("bigint").alias("total_bpe_tokens"),
        F.round(F.avg("quality_score"), 4).alias("avg_quality"),
    )


@register(
    "llm_cosine_topk",
    oracle="""
    WITH q AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id < 5
    ), scored AS (
      SELECT q.query_id, e.vec_id,
             round(list_dot_product(e.embedding::DOUBLE[], q.qv)
                   / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                      * sqrt(list_dot_product(q.qv, q.qv))), 6) AS sim
      FROM embeddings e CROSS JOIN q
    )
    SELECT query_id, vec_id, sim, CAST(rank AS INT) AS rank FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, vec_id) AS rank
      FROM scored
    ) WHERE rank <= 10
    """,
    description="Exact brute-force cosine top-10 for 5 query vectors.",
    tags=("llm", "similarity", "ann-baseline"),
)
def llm_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.cosine_topk(emb, queries, k=10)


@register(
    "x_llm_ann_lsh_topk",
    oracle=None,  # hyperplane sign boundaries aren't reproducible across
    # float parsers; recall vs llm_cosine_topk is asserted in tests instead.
    description="Approximate top-k via random-hyperplane LSH bucketing.",
    tags=("llm", "similarity", "ann"),
)
def x_llm_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.ann_topk(emb, queries, k=10, nbits=4, dim=64, seed=42)


@register(
    "llm_embedding_dedup",
    oracle="""
    WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e, label FROM embeddings),
    dup AS (
      SELECT DISTINCT b.vec_id
      FROM v a JOIN v b ON a.vec_id < b.vec_id
      WHERE list_dot_product(a.e, b.e)
            / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e)))
            >= 0.4
    )
    SELECT vec_id, label FROM v
    WHERE vec_id NOT IN (SELECT vec_id FROM dup)
    """,
    description="Embedding-cosine near-dup removal (exact all-pairs form).",
    tags=("llm", "dedup", "similarity"),
)
def llm_embedding_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return D.embedding_dedup(emb, threshold=0.4, exact=True).select("vec_id", "label")


def _with_planted_dups(emb: DataFrame, n_planted: int, id_offset: int = 1_000_000):
    """Corpus + near-duplicate copies of the first n_planted vectors
    (+0.01 on coordinate 0 → cosine ≈ 0.9999 to the original). The fixture
    embeddings are random Gaussians with no natural near-dup pairs, so the
    near-dup regime the LSH path targets has to be planted deterministically.
    """
    base = emb.withColumn("embedding", F.col("embedding").cast("array<double>"))
    planted = base.filter(F.col("vec_id") < n_planted).select(
        (F.col("vec_id") + id_offset).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x + F.when(i == 0, F.lit(0.01)).otherwise(F.lit(0.0)),
        ).alias("embedding"),
        "label",
    )
    return base.unionByName(planted)


@register(
    "x_llm_embedding_dedup_lsh",
    oracle=None,  # sign-LSH bucket boundaries aren't float-parser-stable;
    # recall vs the exact form is asserted in tests instead
    # (test_operators.py::test_embedding_dedup_lsh_recall).
    description="Embedding near-dup removal, OR-amplified LSH candidate path "
    "over a corpus with planted near-duplicates.",
    tags=("llm", "dedup", "similarity", "ann"),
)
def x_llm_embedding_dedup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_planted_dups(_t(spark, sf_dir, "embeddings"), n_planted=100)
    return D.embedding_dedup(
        emb, threshold=0.98, exact=False, nbits=8, dim=64, seed=42, n_tables=4
    ).select("vec_id", "label")


@register(
    "x_llm_semantic_dedup",
    oracle=None,  # k-means cell boundaries depend on float argmax; the
    # planted-duplicate guarantee (identical vectors always co-cluster and
    # dedup) is asserted in tests instead
    # (test_operators.py::test_semantic_dedup_drops_planted_duplicates).
    description="SemDeDup-style semantic dedup (operators/dedup.py:"
    "semantic_dedup, Abbas et al. 2023): k-means blocking over the "
    "embedding space, per-cluster chunked-GEMM cosine scoring, drop every "
    "vector with a lower-id cluster-mate above threshold. Fills the "
    "paraphrase-redundancy gap between sign-LSH near-dedup (needs cos "
    "≥ ~0.8 per-plane agreement) and the quadratic exact tier; probe cost "
    "~N²/k through one shuffle on cluster id.",
    tags=("llm", "dedup", "similarity", "semantic"),
)
def x_llm_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_planted_dups(_t(spark, sf_dir, "embeddings"), n_planted=100)
    return D.semantic_dedup(
        emb, threshold=0.98, n_clusters=16, kmeans_iters=1
    ).select("vec_id", "label")


@register(
    "x_llm_knn_graph",
    oracle=None,  # sign-LSH bucket boundaries aren't reproducible across
    # float parsers; recall vs the brute-force graph is asserted in tests
    # (test_operators.py::test_knn_graph_recall_and_cluster_invariants).
    description="Approximate k-nearest-neighbor GRAPH over the embedding "
    "corpus (operators/similarity.py:knn_graph): multi-table sign-LSH "
    "candidates, per-bucket GEMM local top-k (provably containing the "
    "global top-k), window merge — the curation primitive clustering and "
    "SemDeDup passes consume. Shuffle volume is exploded key rows, never "
    "candidate pairs.",
    tags=("llm", "similarity", "ann", "graph"),
)
def x_llm_knn_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    return S.knn_graph(emb, k=5, nbits=8, n_tables=4, dim=64, seed=42)


@register(
    "x_llm_embedding_clusters",
    oracle=None,  # LSH-recall-dependent edges; planted identical vectors
    # provably co-cluster and the label algebra is asserted in tests
    # (test_operators.py::test_knn_graph_recall_and_cluster_invariants).
    description="Near-duplicate cluster ids over embeddings "
    "(operators/similarity.py:embedding_clusters): connected components "
    "of the kNN graph's cos >= 0.98 edges; GROUPS near-dups instead of "
    "dropping them, so curation can pick representatives or cap cluster "
    "contribution. Singletons keep their own id; output includes "
    "cluster_size.",
    tags=("llm", "similarity", "dedup", "graph"),
)
def x_llm_embedding_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _with_planted_dups(_t(spark, sf_dir, "embeddings"), n_planted=100)
    return S.embedding_clusters(emb, threshold=0.98, k=5, nbits=8, n_tables=4)


@register(
    "x_llm_ivf_topk",
    oracle=None,  # centroid assignment depends on float argmax boundaries;
    # recall vs llm_cosine_topk is asserted in tests instead
    # (test_operators.py::test_ivf_recall_vs_bruteforce).
    description="IVF-Flat approximate top-k: sampled+refined centroids, "
    "nprobe-cell probing, exact cosine inside cells.",
    tags=("llm", "similarity", "ann", "ivf"),
)
def x_llm_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.ivf_topk(
        emb, queries, k=10, n_centroids=16, nprobe=4, refine_iters=1
    )


@register(
    "x_llm_ann_ivfpq",
    oracle=None,  # codebook/centroid assignment rides float argmin
    # boundaries; recall vs brute force is pinned in
    # test_operators.py::test_ivfpq_recall_vs_bruteforce instead
    description="IVF-PQ approximate top-k: product-quantized codes "
    "scored by per-query ADC lookup tables inside probed cells, exact "
    "cosine re-rank of the shortlist (FAISS IVFADC+refine shape).",
    tags=("llm", "similarity", "ann", "ivf", "pq"),
)
def x_llm_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return S.ivfpq_topk(
        emb, queries, k=10, m=8, nbits=6, n_centroids=16, nprobe=4
    )


@register(
    "llm_embedding_standardize",
    oracle="""
    WITH comp AS (
      SELECT vec_id, u.i - 1 AS dim, u.x
      FROM (SELECT vec_id,
                   unnest(list_transform(range(1, len(embedding) + 1),
                     i -> struct_pack(i := i, x := embedding[i]))) AS u
            FROM embeddings)
    ), q AS (
      SELECT vec_id, dim, CAST(floor(x * 1e6 + 0.5) AS BIGINT) AS xq,
             CAST(floor(x * 1e4 + 0.5) AS BIGINT) AS x4
      FROM comp
    ), stats AS (
      SELECT dim, count(*) AS n, sum(xq) AS s, sum(x4 * x4) AS ss
      FROM q GROUP BY 1
    ), m AS (
      SELECT dim,
             s / 1e6 / n AS mu,
             sqrt(ss / 1e8 / n - (s / 1e6 / n) * (s / 1e6 / n)) AS sd
      FROM stats
    ), z AS (
      SELECT vec_id, dim,
             CASE WHEN sd = 0 THEN 0
                  ELSE CAST(floor((xq / 1e6 - mu) / sd * 1e4 + 0.5) AS BIGINT)
             END AS z4
      FROM q JOIN m USING (dim)
    )
    SELECT vec_id,
           array_to_string(list_transform(
             list_sort(list(struct_pack(d := dim, z := z4))),
             s -> CAST(s.z AS VARCHAR)), ',') AS zvec,
           CAST(sum(z4) AS BIGINT) AS z_sum_e4
    FROM z GROUP BY vec_id
    """,
    description="Per-dimension embedding standardization (whitening-lite, "
    "operators/similarity.py:standardize_embeddings) — the preprocessing "
    "that stops one high-variance dimension from dominating cosine/LSH "
    "decisions. Σx and Σx² per dimension are BIGINT-exact from e6-"
    "quantized components; the 64-row stats table folds into two 1-row "
    "broadcast maps and standardization is one codegen transform per "
    "vector (no join-back shuffle). z-scores floor-quantized to e4; "
    "output stringified as integer CSV (engine-identical formatting).",
    tags=("llm", "similarity", "preprocessing"),
)
def llm_embedding_standardize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    z = S.standardize_embeddings(emb)
    return z.select(
        "vec_id",
        F.array_join(
            F.transform(F.col("z4"), lambda v: v.cast("string")), ","
        ).alias("zvec"),
        F.aggregate(
            F.col("z4"), F.lit(0).cast("bigint"), lambda a, b: a + b
        ).alias("z_sum_e4"),
    )


@register(
    "llm_embedding_norms",
    oracle="""
    SELECT label,
           count(*) AS n,
           round(avg(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
             AS avg_norm,
           round(min(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
             AS min_norm,
           round(max(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))), 4)
             AS max_norm
    FROM embeddings
    GROUP BY label
    """,
    description="Vector-column aggregation: L2 norm stats per label.",
    tags=("llm", "similarity", "vector"),
)
def llm_embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    n = S.norm(F.col("embedding"))
    return emb.groupBy("label").agg(
        F.count("*").alias("n"),
        F.round(F.avg(n), 4).alias("avg_norm"),
        F.round(F.min(n), 4).alias("min_norm"),
        F.round(F.max(n), 4).alias("max_norm"),
    )


@register(
    "llm_multimodal_meta",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           sha256(text)               AS sha256,
           CAST(octet_length(encode(text)) % 640 + 1 AS INT) AS width,
           CAST(octet_length(encode(text)) % 480 + 1 AS INT) AS height
    FROM documents
    """,
    description="Binary-column plumbing: Arrow-batched metadata extraction (stub decode).",
    tags=("llm", "multimodal", "pandas-udf"),
)
def llm_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = M.with_binary_payload(_t(spark, sf_dir, "documents"))
    return M.extract_image_meta(docs)


@register(
    "llm_multimodal_frames",
    oracle="""
    SELECT doc_id,
           CAST(LEAST(8, GREATEST(octet_length(encode(text)) // 256, 1)) AS BIGINT)
             AS n_frames,
           CAST(LEAST(LEAST(8, GREATEST(octet_length(encode(text)) // 256, 1)) * 256,
                      octet_length(encode(text))) AS BIGINT) AS total_bytes
    FROM documents
    """,
    description="Video-style frame sampling (1→N mapInPandas explode), "
    "verified via per-doc frame count + byte totals.",
    tags=("llm", "multimodal", "pandas-udf"),
)
def llm_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = M.with_binary_payload(_t(spark, sf_dir, "documents"))
    frames = M.sample_frames(docs, every_n_bytes=256, max_frames=8)
    return frames.groupBy("doc_id").agg(
        F.count("*").cast("bigint").alias("n_frames"),
        F.sum(F.octet_length("frame")).cast("bigint").alias("total_bytes"),
    )


@register(
    "x_llm_multimodal_features",
    oracle=None,  # byte-level histograms aren't expressible over DuckDB's
    # string functions (ord() is codepoint, not byte); determinism +
    # composition with cosine_topk asserted in tests instead.
    description="Payload → fixed-dim feature vector (embedding shape), "
    "composed into the similarity operators.",
    tags=("llm", "multimodal", "pandas-udf", "similarity"),
)
def x_llm_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = M.with_binary_payload(_t(spark, sf_dir, "documents"))
    return M.extract_features(docs)


@register(
    "llm_multimodal_decode",
    oracle="""
    WITH b AS (
      SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    ), p AS (
      SELECT doc_id, greatest(1, (n + 2) // 3) AS px FROM b
    ), d AS (
      SELECT doc_id, CAST(ceil(sqrt(CAST(px AS DOUBLE))) AS BIGINT) AS w, px
      FROM p
    ), dd AS (
      SELECT doc_id, w, (px + w - 1) // w AS h FROM d
    )
    SELECT doc_id,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           255            AS maxval,
           CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
                + w * h * 3 AS BIGINT) AS n_bytes
    FROM dd
    """,
    description="REAL image decode tier: text bytes are packed into valid "
    "binary PPM (P6) images (operators/multimodal.encode_ppm) and the "
    "decoder parses the actual header bytes per Arrow batch — no codec "
    "library, no stub. The oracle re-derives the expected raster geometry "
    "(near-square, isqrt-based) and full file size from the text length.",
    tags=("llm", "multimodal", "pandas-udf", "decode"),
)
def llm_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return M.extract_ppm_meta(M.with_ppm_payload(docs))


@register(
    "llm_multimodal_audio",
    oracle="""
    WITH b AS (
      SELECT doc_id, octet_length(encode(text)) AS n FROM documents
    ), s AS (
      SELECT doc_id, (n + (n % 2)) // 2 AS n_samples FROM b
    )
    SELECT doc_id,
           8000                                     AS sample_rate,
           CAST(n_samples AS BIGINT)                AS n_samples,
           CAST(n_samples * 1000 // 8000 AS BIGINT) AS duration_ms
    FROM s
    """,
    description="REAL audio decode tier: text bytes packed into valid "
    "RIFF/WAVE 16-bit PCM mono (operators/multimodal.encode_wav) and the "
    "decoder parses + validates the actual chunk structure per Arrow "
    "batch. Oracle re-derives sample count and duration from byte length.",
    tags=("llm", "multimodal", "pandas-udf", "decode", "audio"),
)
def llm_multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return M.extract_wav_meta(M.with_wav_payload(docs))


@register(
    "llm_sequence_packing",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
               AS ntok
      FROM documents
    ), packed AS (
      SELECT source, doc_id, ntok,
             coalesce(sum(ntok) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS start_offset
      FROM toks
    )
    SELECT source,
           CAST(start_offset // 2048 AS BIGINT) AS bin_id,
           CAST(count(*) AS BIGINT)             AS n_docs,
           CAST(sum(ntok) AS BIGINT)            AS bin_tokens
    FROM packed
    GROUP BY source, start_offset // 2048
    """,
    description="Sequence packing (concat-and-chunk pretraining batches): "
    "per-shard deterministic document order, token stream cut every 2048 "
    "BPE-ish tokens, docs assigned to the bin of their first token. "
    "Per-shard windows keep packing parallel (operators/text."
    "pack_sequences).",
    tags=("llm", "pipeline", "packing", "text"),
)
def llm_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", T.token_count_bpe("text").alias("ntok")
    )
    packed = T.pack_sequences(
        docs, tokens_col="ntok", capacity=2048, shard_col="source",
        order_col="doc_id",
    )
    return packed.groupBy("source", "bin_id").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("ntok").cast("bigint").alias("bin_tokens"),
    )


@register(
    "llm_data_mixing",
    oracle=r"""
    WITH drawn AS (
      SELECT doc_id, source,
             len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
               AS ntok,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 8))::BIGINT
               / 4294967296.0 AS u,
             CASE WHEN source IN ('src0', 'src1', 'src2') THEN 0.9
                  WHEN source IN ('src3', 'src4')         THEN 0.5
                  ELSE 0.2 END AS frac
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(ntok) AS BIGINT) AS kept_tokens
    FROM drawn WHERE u < frac
    GROUP BY source
    """,
    description="Deterministic data mixing (source-ratio resampling): the "
    "keep decision is md5(doc_id, salt) as a uniform draw against a "
    "per-source target fraction — reproducible across engines/runs/"
    "partitionings, unlike seeded RNG sampling (operators/mixing.py).",
    tags=("llm", "pipeline", "mixing", "sampling"),
)
def llm_data_mixing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.mixing import mix_sample

    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", T.token_count_bpe("text").alias("ntok")
    )
    frac = (
        F.when(F.col("source").isin("src0", "src1", "src2"), F.lit(0.9))
        .when(F.col("source").isin("src3", "src4"), F.lit(0.5))
        .otherwise(F.lit(0.2))
    )
    kept = mix_sample(docs, frac, key_col="doc_id", salt="mix")
    return kept.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_kept"),
        F.sum("ntok").cast("bigint").alias("kept_tokens"),
    )


@register(
    "llm_transitive_dedup",
    oracle=f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks
    ), ex AS (
      SELECT doc_id, unnest(list_distinct(s)) AS shingle FROM sh
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
    ), pairs AS (
      SELECT c.id_a, c.id_b
      FROM cand c JOIN sh a ON a.doc_id = c.id_a JOIN sh b ON b.doc_id = c.id_b
      WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
            / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.8
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION SELECT id_b, id_a FROM pairs
    ), nodes AS (SELECT DISTINCT a AS id FROM edges),
    reach AS (
      SELECT id AS a, id AS b FROM nodes
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON e.a = r.b
    ), comp AS (SELECT a AS id, min(b) AS comp FROM reach GROUP BY a),
    losers AS (SELECT id FROM comp WHERE id <> comp)
    SELECT d.doc_id, d.lang, d.source
    FROM documents d LEFT JOIN losers l ON d.doc_id = l.id
    WHERE l.id IS NULL
    """,
    description="Transitive-closure dedup: exact n-gram Jaccard pairs "
    "(threshold 0.8) feed connected components, keeping one survivor per "
    "duplicate CHAIN (A~B, B~C drops both B and C even when A!~C) — the "
    "dedup + graph operators composed (operators/dedup.dedup_by_"
    "components, operators/graph); oracle chains the inverted-index pair SQL into a "
    "recursive-CTE closure.",
    tags=("llm", "dedup", "graph", "pipeline"),
)
def llm_transitive_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.graph import dedup_by_components

    docs = _t(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, threshold=0.8)
    return dedup_by_components(docs, pairs, id_col="doc_id").select(
        "doc_id", "lang", "source"
    )


@register(
    "llm_vocab_topk",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split(lower(text), ' '), x -> x <> '')) AS token
      FROM documents
    ),
    counts AS (SELECT token, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY token)
    SELECT token, cnt FROM counts
    ORDER BY cnt DESC, token
    LIMIT 20
    """,
    description="Global vocabulary top-k (the Zipf head a tokenizer trainer "
    "inspects first): explode tokens -> count -> top-20 with deterministic "
    "(count, token) tie-break. Partial aggregation collapses counts "
    "map-side; only the vocabulary reaches the shuffle, and TakeOrdered "
    "keeps the top-k without a global sort.",
    tags=("llm", "text", "vocab"),
)
def llm_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens(F.col("text"), lowercase=True)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), "token")
        .limit(20)
    )


@register(
    "llm_repetition_stats",
    oracle="""
    WITH t AS (
      SELECT doc_id,
             list_filter(string_split(lower(text), ' '), x -> x <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 3
               THEN list_transform(range(1, len(toks) - 1),
                      i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
               ELSE []::VARCHAR[] END AS grams
      FROM t
    )
    SELECT doc_id,
           CAST(len(grams) AS BIGINT)                 AS n_grams,
           CAST(len(list_distinct(grams)) AS BIGINT)  AS n_unique_grams,
           CASE WHEN len(grams) > 0
             THEN round((len(grams) - len(list_distinct(grams)))
                        / CAST(len(grams) AS DOUBLE), 6)
             ELSE 0.0 END                             AS dup_gram_ratio
    FROM g
    """,
    description="Within-doc duplicate-trigram ratio (Gopher repetition "
    "quality rule, operators/text.py:ngram_repetition_stats): flags "
    "degenerate text that length/stopword checks miss. Pure per-row list "
    "codegen, zero shuffle.",
    tags=("llm", "text", "quality"),
)
def llm_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return T.ngram_repetition_stats(docs, "text", n=3).select(
        "doc_id", "n_grams", "n_unique_grams", "dup_gram_ratio"
    )


@register(
    "llm_boilerplate_tokens",
    oracle="""
    WITH pairs AS (
      SELECT DISTINCT doc_id, unnest(list_filter(
               string_split(lower(text), ' '), x -> x <> '')) AS token
      FROM documents
    ),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents)
    SELECT token,
           CAST(count(*) AS BIGINT) AS doc_freq,
           round(count(*) / (SELECT n_docs FROM n), 6) AS doc_frac
    FROM pairs
    GROUP BY token
    HAVING count(*) > 0.5 * (SELECT n_docs FROM n)
    """,
    description="Corpus boilerplate/stopword discovery "
    "(operators/text.py:boilerplate_tokens): tokens in >50% of docs by "
    "document frequency. array_distinct BEFORE explode keeps the shuffle "
    "at vocab-per-doc rows, not token occurrences.",
    tags=("llm", "text", "boilerplate"),
)
def llm_boilerplate_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return T.boilerplate_tokens(docs, "text", min_doc_frac=0.5)


@register(
    "llm_pii_scrub",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 text || ' contact user' || doc_id || '@mail-' || doc_id
                      || '.example.com or ' || (100 + doc_id % 900) || '-555-'
                      || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      || ' ip 10.0.' || (doc_id % 256) || '.' || ((doc_id * 7) % 256),
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\\b\\d{3}[-.]\\d{3,4}[-.]\\d{4}\\b', '<PHONE>', 'g'),
             '\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b', '<IP>', 'g') AS scrubbed
    FROM documents
    """,
    description="PII scrub pass (operators/text.py:scrub_pii): chained "
    "regexp redaction of emails/phones/IPv4 (email first so hostile "
    "half-matches cannot survive). Fixture docs carry no PII, so each doc "
    "gets a deterministic synthesized contact tail — the scrubbed output "
    "must collapse it to <EMAIL>/<PHONE>/<IP> on both engines.",
    tags=("llm", "text", "pii"),
)
def llm_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    tail = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id"),
        F.lit("@mail-"), F.col("doc_id"), F.lit(".example.com or "),
        (F.lit(100) + F.col("doc_id") % 900).cast("string"),
        F.lit("-555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit("."), ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    return docs.select("doc_id", T.scrub_pii(tail).alias("scrubbed"))


@register(
    "llm_quantize_embeddings",
    oracle="""
    WITH s AS (
      SELECT vec_id, embedding,
             list_max(list_transform(embedding,
               x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS scale
      FROM embeddings
    )
    SELECT vec_id,
           CAST(floor(scale * 1e6) AS BIGINT) AS q_scale_micro,
           array_to_string(list_transform(embedding,
             x -> CAST(greatest(-127, least(127,
               CAST(floor(CAST(x AS DOUBLE) / scale + 0.5) AS BIGINT))) AS VARCHAR)
           ), ',') AS q_csv
    FROM s
    """,
    description="Symmetric int8 embedding quantization "
    "(operators/similarity.py:quantize_int8): per-vector scale = "
    "max|v|/127, components floor(v/scale + 0.5) clamped — the 4x "
    "storage cut before ANN rescoring. floor-based rounding and "
    "micro-unit scales keep both engines bit-identical; zero shuffle.",
    tags=("llm", "embedding", "quantization"),
)
def llm_quantize_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.similarity import quantize_int8

    emb = _t(spark, sf_dir, "embeddings")
    out = quantize_int8(emb, "embedding", prefix="q")
    return out.select(
        "vec_id",
        "q_scale_micro",
        F.array_join(F.transform("q_vec", lambda x: x.cast("string")), ",").alias(
            "q_csv"
        ),
    )


@register(
    "llm_decontaminate",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks
    ), ev AS (
      SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0
    ), tr AS (
      SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0
    ), hits AS (
      SELECT t.doc_id, count(*) AS n
      FROM tr t JOIN ev e ON t.g = e.g GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_shared,
           coalesce(h.n, 0) > 0 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    description="Benchmark decontamination: training docs sharing any word "
    "3-gram with the held-out eval slice (doc_id % 97 == 0) are flagged. "
    "Eval shingle set is broadcast; train side probed map-side.",
    tags=("llm", "decontam"),
)
def llm_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    return D.contamination(train, eval_df)


@register(
    "llm_decontaminate_strict",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ), sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS s FROM toks
    ), ev AS (
      SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 97 = 0
    ), tr AS (
      SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 97 <> 0
    ), hits AS (
      SELECT t.doc_id, count(*) AS n
      FROM tr t JOIN ev e ON t.g = e.g GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(h.n, 0) AS BIGINT) AS n_shared,
           coalesce(h.n, 0) >= 5 AS contaminated
    FROM (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0) d
    LEFT JOIN hits h ON d.doc_id = h.doc_id
    """,
    description="Thresholded decontamination (operators/dedup.py:"
    "contamination min_shared=5): a doc is contaminated only when ≥5 "
    "distinct eval 3-grams co-occur — the common-vocabulary-tolerant pass "
    "for corpora where any-overlap saturates (the 100x stress run showed "
    "an eval slice covering the whole 3-gram vocabulary, flagging 100% of "
    "docs). Same broadcast-probe plan as llm_decontaminate; only the "
    "flag predicate changes.",
    tags=("llm", "decontam"),
)
def llm_decontaminate_strict(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    train = docs.filter(F.col("doc_id") % 97 != 0)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    return D.contamination(train, eval_df, min_shared=5)


@register(
    "llm_duplicate_spans",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ), base AS (
      SELECT doc_id, len(t) AS n_tokens, t FROM toks
    ), pg AS (
      SELECT doc_id, u.pos AS pos, md5(u.g) AS gk
      FROM (SELECT doc_id,
                   unnest(list_transform(range(1, n_tokens - 1),
                     i -> struct_pack(pos := i,
                                      g := t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS u
            FROM base WHERE n_tokens >= 3)
    ), dup AS (
      SELECT gk FROM pg GROUP BY gk HAVING count(*) >= 2
    ), cov AS (
      SELECT doc_id, count(DISTINCT cpos) AS covered
      FROM (SELECT p.doc_id, unnest(range(p.pos, p.pos + 3)) AS cpos
            FROM pg p JOIN dup d ON p.gk = d.gk)
      GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(coalesce(c.covered, 0) AS BIGINT) AS covered_tokens,
           round(CASE WHEN b.n_tokens > 0
                      THEN CAST(coalesce(c.covered, 0) AS DOUBLE) / b.n_tokens
                      ELSE 0.0 END, 4) AS dup_fraction
    FROM base b LEFT JOIN cov c ON b.doc_id = c.doc_id
    """,
    description="Duplicate-span coverage (Lee et al. 2022 exact-substring "
    "dedup diagnostic): fraction of each doc's tokens inside a corpus-"
    "repeated 3-gram. Inverted-index equi joins only; no all-pairs.",
    tags=("llm", "dedup", "spans"),
)
def llm_duplicate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return D.duplicate_span_coverage(docs)


@register(
    "llm_substring_dedup",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_SQL_TOKS} AS t FROM documents
    ), base AS (
      SELECT doc_id, len(t) AS n_tokens, t FROM toks
    ), pg AS (
      SELECT doc_id, u.pos AS pos, md5(u.g) AS gk
      FROM (SELECT doc_id,
                   unnest(list_transform(range(1, n_tokens - 1),
                     i -> struct_pack(pos := i,
                                      g := t[i] || ' ' || t[i+1] || ' ' || t[i+2]))) AS u
            FROM base WHERE n_tokens >= 3)
    ), dup AS (
      SELECT gk, min(struct_pack(d := doc_id, p := pos)) AS canon
      FROM pg GROUP BY gk HAVING count(*) >= 2
    ), rmpos AS (
      SELECT p.doc_id, unnest(range(p.pos, p.pos + 3)) AS rpos
      FROM pg p JOIN dup g ON p.gk = g.gk
      WHERE NOT (p.doc_id = g.canon.d AND p.pos = g.canon.p)
    ), rm AS (
      SELECT doc_id, list(DISTINCT rpos) AS rm FROM rmpos GROUP BY doc_id
    ), kept AS (
      SELECT b.doc_id, b.n_tokens,
             list_transform(
               list_filter(range(1, b.n_tokens + 1),
                           p -> NOT coalesce(list_contains(r.rm, p), false)),
               p -> b.t[p]) AS kept
      FROM base b LEFT JOIN rm r ON b.doc_id = r.doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
           coalesce(array_to_string(kept, ' '), '') AS clean_text
    FROM kept
    """,
    description="Exact-substring REMOVAL dedup (the removal half of Lee "
    "et al. 2022; llm_duplicate_spans is the diagnostic half): every "
    "non-canonical occurrence of a corpus-repeated 3-gram is excised at "
    "the token level, the lexicographically-first (doc_id, pos) copy "
    "survives, overlaps merge positionally. Canonical pick rides the "
    "same single map-side-combinable aggregation as the occurrence "
    "count; rebuild is a per-doc codegen filter, never a corpus window.",
    tags=("llm", "dedup", "spans"),
)
def llm_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return D.exact_substring_remove(docs)


@register(
    "llm_wet_extract",
    oracle=r"""
    WITH raw AS (
      SELECT doc_id,
             '<html><head><title>t</title><style>p{color:red}</style>'
             || '<script>var x = "<p>not text</p>";</script></head><body>'
             || '<!-- nav --><h1>Doc ' || doc_id || '</h1><p>' || text
             || '</p><div>footer &amp; more &lt;tags&gt;</div></body></html>'
             AS html
      FROM documents
    ), wet AS (
      SELECT doc_id,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          replace(replace(replace(replace(replace(replace(
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              html,
              '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
              '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
              '(?s)<!--.*?-->', ' ', 'g'),
              '(?i)<(?:br\s*/?|/p|/div|/h[1-6]|/li|/tr|/table|/title)\s*>', chr(10), 'g'),
              '(?s)<[^>]*>', ' ', 'g'),
            '&nbsp;', ' '), '&quot;', '"'), '&#39;', chr(39)),
            '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
          '[ \t\x0b\f\r]+', ' ', 'g'),
          ' ?\n ?', chr(10), 'g'),
          '\n{2,}', chr(10), 'g'),
          '^\s+|\s+$', '', 'g') AS wet_text
      FROM raw
    )
    SELECT doc_id, wet_text,
           CAST(len(string_split(wet_text, chr(10))) AS BIGINT) AS n_lines
    FROM wet
    """,
    description="WET-style HTML→text extraction (operators/text.py:"
    "html_to_text — the CommonCrawl WARC→WET step): script/style/comment "
    "subtrees dropped, block closers become newlines, tags stripped, "
    "named entities decoded, whitespace collapsed. Fixture docs are "
    "wrapped in a deterministic HTML template whose script body contains "
    "decoy markup the extractor must NOT leak. Zero-shuffle codegen "
    "regexp chain, RE2-compatible so the DuckDB oracle recomputes it "
    "verbatim.",
    tags=("llm", "text", "html", "wet"),
)
def llm_wet_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.text import html_to_text

    docs = _t(spark, sf_dir, "documents")
    html = F.concat(
        F.lit(
            '<html><head><title>t</title><style>p{color:red}</style>'
            '<script>var x = "<p>not text</p>";</script></head><body>'
            "<!-- nav --><h1>Doc "
        ),
        F.col("doc_id").cast("string"),
        F.lit("</h1><p>"),
        F.col("text"),
        F.lit("</p><div>footer &amp; more &lt;tags&gt;</div></body></html>"),
    )
    return docs.select(
        "doc_id",
        html_to_text(html).alias("wet_text"),
    ).withColumn(
        "n_lines", F.size(F.split("wet_text", "\n")).cast("bigint")
    )


@register(
    "llm_crawl_pipeline",
    oracle=r"""
    WITH urls AS (
      SELECT doc_id, lang, source, text,
             'HTTPS://WWW.' || upper(source) || '.Example.COM:443/' || lang
             || '/Article-' || (doc_id % 50)
             || '/?utm_source=feed&ref=rss&id=' || (doc_id % 50)
             || '&utm_campaign=x#sec' || (doc_id % 7) AS url
      FROM documents
    ), parts AS (
      SELECT doc_id, lang, source, text,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
        lower(regexp_extract(url, '^[^:]+://([^/?#]+)', 1)) AS hostport,
        regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1) AS rawpath,
        regexp_extract(url, '^[^#]*?\?([^#]*)', 1) AS q
      FROM urls
    ), step AS (
      SELECT doc_id, lang, source, text, scheme,
        CASE WHEN scheme = 'https'
             THEN regexp_replace(regexp_replace(hostport, '^www\.', ''), ':443$', '')
             WHEN scheme = 'http'
             THEN regexp_replace(regexp_replace(hostport, '^www\.', ''), ':80$', '')
             ELSE regexp_replace(hostport, '^www\.', '') END AS host,
        CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/'
             ELSE regexp_replace(rawpath, '/+$', '') END AS path,
        array_to_string(list_sort(list_filter(string_split(q, '&'),
            p -> p <> '' AND NOT regexp_matches(p,
                 '^(utm_[^=]*|fbclid|gclid)='))), '&') AS qs
      FROM parts
    ), canon AS (
      SELECT doc_id, lang, source, text,
             scheme || '://' || host || path
             || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS curl
      FROM step
    ), urlkept AS (
      SELECT doc_id, lang, source, text, curl FROM (
        SELECT *, row_number() OVER (PARTITION BY curl ORDER BY doc_id) AS rn
        FROM canon) WHERE rn = 1
    ), en AS (
      SELECT doc_id, source, text, curl FROM urlkept
      WHERE regexp_extract(curl, 'example\.com/([a-z]+)/', 1) = 'en'
    ), raw AS (
      SELECT doc_id, curl,
             '<html><head><title>t</title><style>p{color:red}</style>'
             || '<script>var x = "<p>not text</p>";</script></head><body>'
             || '<!-- nav --><p>' || text
             || '</p><div>footer &amp; more &lt;tags&gt;</div></body></html>'
             AS html
      FROM en
    ), wet AS (
      SELECT doc_id, curl,
        regexp_replace(regexp_replace(regexp_replace(regexp_replace(
          replace(replace(replace(replace(replace(replace(
            regexp_replace(regexp_replace(regexp_replace(regexp_replace(regexp_replace(
              html,
              '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
              '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
              '(?s)<!--.*?-->', ' ', 'g'),
              '(?i)<(?:br\s*/?|/p|/div|/h[1-6]|/li|/tr|/table|/title)\s*>', chr(10), 'g'),
              '(?s)<[^>]*>', ' ', 'g'),
            '&nbsp;', ' '), '&quot;', '"'), '&#39;', chr(39)),
            '&lt;', '<'), '&gt;', '>'), '&amp;', '&'),
          '[ \t\x0b\f\r]+', ' ', 'g'),
          ' ?\n ?', chr(10), 'g'),
          '\n{2,}', chr(10), 'g'),
          '^\s+|\s+$', '', 'g') AS wet_text
      FROM raw
    ), final AS (
      SELECT doc_id, curl, wet_text FROM (
        SELECT *, row_number() OVER (PARTITION BY wet_text ORDER BY doc_id) AS rn2
        FROM wet) WHERE rn2 = 1
    )
    SELECT regexp_extract(curl, 'https://([^./]+)\.', 1) AS source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(list_filter(string_split_regex(wet_text, '\s+'),
                                    x -> x <> ''))) AS BIGINT) AS n_tokens
    FROM final GROUP BY 1
    """,
    description="Crawl-to-corpus CAPSTONE: real .warc.gz files (HTML "
    "payloads, messy tracking URLs) read through the warclite source, "
    "then URL canonicalization + dedup → language filter from the "
    "canonical path → WET HTML→text extraction → exact text dedup → "
    "per-source token accounting, ALL IN ONE PLAN. The oracle re-derives "
    "the entire chain from the parquet source of truth, so every stage "
    "(gzip parse, URL normalize, regex extraction, both dedups) is "
    "value-hash-checked end-to-end. Per-file WARC partitions feed "
    "zero-shuffle codegen stages; the only wide ops are the two dedup "
    "groupBys and the final per-source aggregate.",
    tags=("llm", "pipeline", "warc", "wet", "url", "dedup"),
)
def llm_crawl_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.io.warc import register_warc_source, stage_documents_warc
    from ops_spark.operators.dedup import exact_dedup
    from ops_spark.operators.text import canonicalize_url, html_to_text, tokens

    d = stage_documents_warc(sf_dir, html=True)
    register_warc_source(spark)
    w = spark.read.format("warclite").option("path", d).load()
    docs = w.select(
        F.regexp_extract("record_id", r"doc-(\d+)", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.decode(F.col("payload"), "UTF-8").alias("html"),
        canonicalize_url(F.col("target_uri")).alias("curl"),
    )
    kept = exact_dedup(docs, ["curl"], "doc_id")
    en = kept.filter(
        F.regexp_extract("curl", r"example\.com/([a-z]+)/", 1) == "en"
    )
    wet = en.withColumn("wet_text", html_to_text(F.col("html")))
    final = exact_dedup(wet, ["wet_text"], "doc_id")
    return (
        final.withColumn(
            "source", F.regexp_extract("curl", r"https://([^./]+)\.", 1)
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.size(tokens(F.col("wet_text"))))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )


@register(
    "llm_url_dedup",
    oracle=r"""
    WITH urls AS (
      SELECT doc_id,
             'HTTPS://WWW.' || upper(source) || '.Example.COM:443/' || lang
             || '/Article-' || (doc_id % 50)
             || '/?utm_source=feed&ref=rss&id=' || (doc_id % 50)
             || '&utm_campaign=x#sec' || (doc_id % 7) AS url
      FROM documents
    ), parts AS (
      SELECT doc_id,
        lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\-]*)://', 1)) AS scheme,
        lower(regexp_extract(url, '^[^:]+://([^/?#]+)', 1)) AS hostport,
        regexp_extract(url, '^[^:]+://[^/?#]*([^?#]*)', 1) AS rawpath,
        regexp_extract(url, '^[^#]*?\?([^#]*)', 1) AS q
      FROM urls
    ), step AS (
      SELECT doc_id, scheme,
        CASE WHEN scheme = 'https'
             THEN regexp_replace(regexp_replace(hostport, '^www\.', ''), ':443$', '')
             WHEN scheme = 'http'
             THEN regexp_replace(regexp_replace(hostport, '^www\.', ''), ':80$', '')
             ELSE regexp_replace(hostport, '^www\.', '') END AS host,
        CASE WHEN regexp_replace(rawpath, '/+$', '') = '' THEN '/'
             ELSE regexp_replace(rawpath, '/+$', '') END AS path,
        array_to_string(list_sort(list_filter(string_split(q, '&'),
            p -> p <> '' AND NOT regexp_matches(p,
                 '^(utm_[^=]*|fbclid|gclid)='))), '&') AS qs
      FROM parts
    ), canon AS (
      SELECT doc_id,
             scheme || '://' || host || path
             || CASE WHEN qs <> '' THEN '?' || qs ELSE '' END AS curl
      FROM step
    )
    SELECT curl AS canonical_url,
           CAST(min(doc_id) AS BIGINT) AS keeper_doc_id,
           CAST(count(*) AS BIGINT) AS n_urls
    FROM canon GROUP BY 1
    """,
    description="URL canonicalization + dedup (operators/text.py:"
    "canonicalize_url) — the first pass a web-crawl pipeline runs before "
    "any content hashing: fold scheme+host case, strip www./default "
    "port/trailing slashes/fragment, drop utm_*/fbclid/gclid tracking "
    "params, SORT surviving params, then keep min(doc_id) per canonical "
    "URL. Fixture docs carry no URL, so each doc gets a deterministic "
    "synthesized messy URL whose doc_id%50 collisions the dedup must "
    "find. Zero-shuffle codegen until the one groupBy on the canonical "
    "key.",
    tags=("llm", "text", "url", "dedup"),
)
def llm_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.text import canonicalize_url

    docs = _t(spark, sf_dir, "documents")
    m50 = (F.col("doc_id") % 50).cast("string")
    url = F.concat(
        F.lit("HTTPS://WWW."),
        F.upper(F.col("source")),
        F.lit(".Example.COM:443/"),
        F.col("lang"),
        F.lit("/Article-"),
        m50,
        F.lit("/?utm_source=feed&ref=rss&id="),
        m50,
        F.lit("&utm_campaign=x#sec"),
        (F.col("doc_id") % 7).cast("string"),
    )
    return (
        docs.select("doc_id", canonicalize_url(url).alias("curl"))
        .groupBy(F.col("curl").alias("canonical_url"))
        .agg(
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_urls"),
        )
    )


@register(
    "llm_unicode_normalize",
    oracle="""
    WITH dec AS (
      SELECT doc_id, text || ' cafe' || chr(769) AS raw FROM documents
    )
    SELECT doc_id,
           CAST(length(raw) AS BIGINT) AS len_raw,
           CAST(length(nfc_normalize(raw)) AS BIGINT) AS len_nfc,
           length(nfc_normalize(raw)) <> length(raw) AS changed
    FROM dec
    """,
    description="Unicode NFC normalization (Pandas-UDF tier — Spark has no "
    "built-in normalizer; DuckDB oracle uses nfc_normalize). A decomposed "
    "e+COMBINING-ACUTE suffix is planted so the pass provably composes it.",
    tags=("llm", "text", "unicode"),
)
def llm_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    raw = F.concat(F.col("text"), F.lit(" café"))
    out = docs.select(
        "doc_id",
        F.length(raw).cast("bigint").alias("len_raw"),
        F.length(T.normalize_unicode(raw)).cast("bigint").alias("len_nfc"),
    )
    return out.withColumn("changed", F.col("len_nfc") != F.col("len_raw"))


@register(
    "llm_quality_filter",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t,
             length(text) AS nc,
             len(regexp_extract_all(text, '[^\w\s]')) AS punct,
             len(regexp_extract_all(text, '[0-9]')) AS digits
      FROM documents
    ), m AS (
      SELECT doc_id, len(t) AS ntok, nc, punct, digits,
             len(list_filter(t, x -> list_contains(['the','a','of','and','is'],
                                                   lower(x)))) AS nstop
      FROM s
    ), f AS (
      SELECT doc_id, ntok,
        round(CASE WHEN ntok > 0 THEN CAST(nc AS DOUBLE) / ntok ELSE 0.0 END, 4) AS f_avg,
        round(CASE WHEN ntok > 0 THEN CAST(nstop AS DOUBLE) / ntok ELSE 0.0 END, 4) AS f_stop,
        round(CASE WHEN nc > 0 THEN CAST(punct AS DOUBLE) / nc ELSE 0.0 END, 4) AS f_punct,
        round(CASE WHEN nc > 0 THEN CAST(digits AS DOUBLE) / nc ELSE 0.0 END, 4) AS f_digit
      FROM m
    )
    SELECT doc_id,
           CAST(floor((-1.2 + (CAST(least(ntok, 100) AS DOUBLE) / 100.0) * 1.5
                      + f_avg * 0.35 + f_stop * 4.0
                      + f_punct * (-6.0) + f_digit * (-3.0)) * 10000.0 + 0.5)
                AS BIGINT) AS quality_logit_e4,
           (-1.2 + (CAST(least(ntok, 100) AS DOUBLE) / 100.0) * 1.5
                      + f_avg * 0.35 + f_stop * 4.0
                      + f_punct * (-6.0) + f_digit * (-3.0)) > 0 AS keep
    FROM f
    """,
    description="Model-based quality filter: linear classifier logit over "
    "the text-stats features (fixed auditable weights standing in for "
    "trained coefficients; +,*,/ only so the oracle recomputes the logit "
    "bit-for-bit). Zero-shuffle codegen.",
    tags=("llm", "text", "quality"),
)
def llm_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return T.quality_logit(docs).select("doc_id", "quality_logit_e4", "keep")


@register(
    "x_llm_bpe_merges",
    oracle=None,  # k-iteration driver loop is not single-statement SQL;
    # pinned instead against a pure-Python Sennrich reference in
    # tests/test_operators.py::test_bpe_merges_match_reference
    description="BPE vocabulary induction (Sennrich et al. 2016): learn the "
    "first 8 merges from the documents corpus. One corpus pass builds the "
    "distinct-word frequency table; each merge is a vocab-sized "
    "pair-explode + groupBy + 1-row argmax collect, with the merge applied "
    "as a JVM higher-order-function fold (operators/text.py:bpe_merges).",
    tags=("llm", "text", "bpe", "iterative"),
)
def x_llm_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    merges = T.bpe_merges(docs, n_merges=8)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_freq bigint"
    )


@register(
    "llm_paragraph_dedup",
    oracle="""
    WITH two_para AS (
      SELECT a.doc_id,
             a.text || chr(10) || chr(10) || b.text AS text
      FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    ), p AS (
      SELECT doc_id,
             generate_subscripts(l, 1) - 1 AS pos,
             unnest(l) AS para
      FROM (SELECT doc_id, string_split(text, chr(10) || chr(10)) AS l
            FROM two_para)
    ), kept AS (
      SELECT doc_id, pos, para FROM p WHERE para <> ''
      QUALIFY row_number() OVER (PARTITION BY md5(para)
                                 ORDER BY doc_id, pos) = 1
    )
    SELECT doc_id,
           string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text,
           CAST(count(*) AS BIGINT) AS n_paras
    FROM kept GROUP BY doc_id
    """,
    description="Paragraph-level exact dedup (Dolma-style sub-document "
    "pass; operators/dedup.py:paragraph_dedup): a two-paragraph corpus is "
    "built by chaining consecutive docs (so every paragraph appears in "
    "two documents), then only first occurrences survive and documents "
    "reassemble from their remaining paragraphs. Two digest/doc-keyed "
    "shuffles, no global sort.",
    tags=("llm", "dedup", "paragraph"),
)
def llm_paragraph_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    nxt = docs.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("text").alias("text_b")
    )
    two_para = docs.join(nxt, "doc_id").select(
        "doc_id", F.concat_ws("\n\n", "text", "text_b").alias("text")
    )
    return D.paragraph_dedup(two_para)


@register(
    "llm_bm25_scores",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS t
      FROM documents
    ), tf AS (
      SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
    ), dfreq AS (
      SELECT t, count(*) AS df FROM tf GROUP BY 1
    ), consts AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
    ), q(query_id, t) AS (
      VALUES (1, 'table'), (1, 'hash'),
             (2, 'spark'), (2, 'sort'), (2, 'window'),
             (3, 'merge'), (3, 'batch')
    ), s AS (
      SELECT q.query_id, tf.doc_id,
             ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tf.tf * 2.2
                / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / c.avgdl))) AS s
      FROM tf JOIN q ON tf.t = q.t
              JOIN dl ON tf.doc_id = dl.doc_id
              JOIN dfreq d ON tf.t = d.t
              CROSS JOIN consts c
    )
    SELECT query_id, doc_id,
           CAST(floor(sum(s) * 100.0 + 0.5) AS BIGINT) AS score_e2
    FROM s GROUP BY 1, 2
    """,
    description="Bulk Okapi BM25 (operators/retrieval.py): a 3-query "
    "battery scored against every document — tf/df/dl from one exploded "
    "token stream (map-side combinable), corpus constants on a 1-row "
    "broadcast, query terms a broadcast dim. Scores quantized to e2 "
    "micro-units (ln differs across libms in the last ulp; continuous "
    "scores make quantized buckets stable).",
    tags=("llm", "retrieval", "bm25"),
)
def llm_bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.retrieval import bm25_scores

    docs = _t(spark, sf_dir, "documents")
    q = spark.createDataFrame(
        [(1, "table"), (1, "hash"), (2, "spark"), (2, "sort"), (2, "window"),
         (3, "merge"), (3, "batch")],
        "query_id int, term string",
    )
    out = bm25_scores(docs, q)
    return out.select(
        "query_id",
        "doc_id",
        F.floor(F.col("score") * 100.0 + 0.5).cast("bigint").alias("score_e2"),
    )


@register(
    "llm_dsir_weights",
    oracle=r"""
    WITH rtoks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ), rb AS (
      SELECT doc_id,
             ('0x' || substr(md5(f), 1, 15))::BIGINT % 4096 AS bucket
      FROM (SELECT doc_id, unnest(list_concat(t,
                     list_transform(range(1, len(t)),
                                    i -> t[i] || ' ' || t[i+1]))) AS f
            FROM rtoks)
    ), tb AS (
      SELECT ('0x' || substr(md5(f), 1, 15))::BIGINT % 4096 AS bucket
      FROM (SELECT unnest(list_concat(t,
                     list_transform(range(1, len(t)),
                                    i -> t[i] || ' ' || t[i+1]))) AS f
            FROM (SELECT list_filter(string_split_regex(lower(text), '\s+'),
                                     x -> x <> '') AS t
                  FROM documents WHERE lang = 'en'))
    ), rc AS (
      SELECT bucket, count(*) AS cr FROM rb GROUP BY 1
    ), tc AS (
      SELECT bucket, count(*) AS ct FROM tb GROUP BY 1
    ), rt AS (SELECT sum(cr) AS tr FROM rc
    ), tt_ AS (SELECT sum(ct) AS tt FROM tc
    ), llr AS (
      SELECT rc.bucket,
             CAST(floor((ln(coalesce(tc.ct, 0) + 1.0) - ln(tt + 4096.0)
                         - ln(cr + 1.0) + ln(tr + 4096.0)) * 1e4 + 0.5)
                  AS BIGINT) AS llr_e4
      FROM rc LEFT JOIN tc USING (bucket) CROSS JOIN rt CROSS JOIN tt_
    ), pd AS (
      SELECT doc_id, bucket, count(*) AS c FROM rb GROUP BY 1, 2
    )
    SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_features,
           CAST(sum(c * llr_e4) AS BIGINT) AS weight_e4
    FROM pd JOIN llr USING (bucket) GROUP BY 1
    """,
    description="DSIR importance weights (Xie et al. 2023): every doc "
    "scored by hashed-unigram+bigram log-likelihood ratio against the "
    "lang='en' target slice — the data-selection pass a pretraining "
    "pipeline runs to resample raw data toward a quality target. "
    "Per-bucket llr quantized to e4 micro-units in a fixed a-b-c+d "
    "evaluation order, per-doc totals summed as BIGINT (exact, "
    "order-independent). Bucket tables bounded at n_buckets=4096 rows "
    "and broadcast; totals ride 1-row scalar broadcasts.",
    tags=("llm", "retrieval", "dsir", "sampling"),
)
def llm_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.retrieval import dsir_importance

    docs = _t(spark, sf_dir, "documents")
    return dsir_importance(
        docs, docs.filter(F.col("lang") == "en"), target_subset=True
    )


@register(
    "llm_dsir_sample",
    oracle=r"""
    WITH rtoks AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'),
                                 x -> x <> '') AS t
      FROM documents
    ), rb AS (
      SELECT doc_id,
             ('0x' || substr(md5(f), 1, 15))::BIGINT % 4096 AS bucket
      FROM (SELECT doc_id, unnest(list_concat(t,
                     list_transform(range(1, len(t)),
                                    i -> t[i] || ' ' || t[i+1]))) AS f
            FROM rtoks)
    ), tb AS (
      SELECT ('0x' || substr(md5(f), 1, 15))::BIGINT % 4096 AS bucket
      FROM (SELECT unnest(list_concat(t,
                     list_transform(range(1, len(t)),
                                    i -> t[i] || ' ' || t[i+1]))) AS f
            FROM (SELECT list_filter(string_split_regex(lower(text), '\s+'),
                                     x -> x <> '') AS t
                  FROM documents WHERE lang = 'en'))
    ), rc AS (
      SELECT bucket, count(*) AS cr FROM rb GROUP BY 1
    ), tc AS (
      SELECT bucket, count(*) AS ct FROM tb GROUP BY 1
    ), rt AS (SELECT sum(cr) AS tr FROM rc
    ), tt_ AS (SELECT sum(ct) AS tt FROM tc
    ), llr AS (
      SELECT rc.bucket,
             CAST(floor((ln(coalesce(tc.ct, 0) + 1.0) - ln(tt + 4096.0)
                         - ln(cr + 1.0) + ln(tr + 4096.0)) * 1e4 + 0.5)
                  AS BIGINT) AS llr_e4
      FROM rc LEFT JOIN tc USING (bucket) CROSS JOIN rt CROSS JOIN tt_
    ), pd AS (
      SELECT doc_id, bucket, count(*) AS c FROM rb GROUP BY 1, 2
    ), w AS (
      SELECT doc_id, CAST(sum(c * llr_e4) AS BIGINT) AS weight_e4
      FROM pd JOIN llr USING (bucket) GROUP BY 1
    ), scored AS (
      SELECT doc_id, weight_e4,
             CAST(weight_e4 + floor(-ln(-ln(
               (('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':dsir'), 1, 15))::BIGINT
                + 1.0) / 1152921504606846977.0)) * 1e4 + 0.5) AS BIGINT)
             AS score_e4
      FROM w
    )
    SELECT doc_id, weight_e4, score_e4
    FROM scored ORDER BY score_e4 DESC, doc_id LIMIT 50
    """,
    description="DSIR's selection step: Gumbel-top-k over the importance "
    "weights — an exact softmax sample without replacement, with the "
    "Gumbel noise DERIVED from md5(doc_id:salt) so the sample is "
    "reproducible and oracle-checkable. Selection is TakeOrdered(k) "
    "(per-partition heap + driver merge), never a global sort.",
    tags=("llm", "retrieval", "dsir", "sampling"),
)
def llm_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.retrieval import dsir_gumbel_topk

    docs = _t(spark, sf_dir, "documents")
    return dsir_gumbel_topk(
        docs, docs.filter(F.col("lang") == "en"), k=50, target_subset=True
    )


@register(
    "x_llm_doremi_mixture",
    oracle=None,  # the EG loop's exp() is driver-side float math over the
    # bounded domain table; the per-domain loss aggregation is exact-int.
    # Weight ordering/sum/smoothing invariants are pinned in
    # test_operators.py::test_doremi_mixture_upweights_hard_domains
    description="DoReMi-lite mixture optimization (Xie et al. 2023): "
    "per-domain LM loss (char-bigram negative mean log-prob, exact e4 "
    "integer means) drives Group-DRO exponentiated-gradient reweighting; "
    "output is the step-averaged, uniform-smoothed domain mixture a "
    "pretraining run would sample with. One corpus aggregation; only the "
    "~|domains|-row table reaches the driver.",
    tags=("llm", "mixing", "doremi"),
)
def x_llm_doremi_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.mixing import doremi_mixture
    from ops_spark.operators.text import char_bigram_lm_scores

    docs = _t(spark, sf_dir, "documents")
    lm = char_bigram_lm_scores(docs)
    j = docs.select("doc_id", "source").join(lm, "doc_id")
    return doremi_mixture(
        j.withColumn(
            "loss_e4",
            F.floor(-F.col("avg_logp") * 1e4 + 0.5).cast("bigint"),
        ),
        "source",
        "loss_e4",
    )


@register(
    "llm_rrf_hybrid",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS t
      FROM documents
    ), tf AS (
      SELECT doc_id, t, count(*) AS tf FROM toks GROUP BY 1, 2
    ), dl AS (
      SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1
    ), dfreq AS (
      SELECT t, count(*) AS df FROM tf GROUP BY 1
    ), consts AS (
      SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl
    ), q(query_id, t) AS (
      VALUES (1, 'table'), (1, 'hash'),
             (2, 'spark'), (2, 'sort'), (2, 'window'),
             (3, 'merge'), (3, 'batch')
    ), s AS (
      SELECT q.query_id, tf.doc_id,
             ln(1.0 + (c.n_docs - d.df + 0.5) / (d.df + 0.5))
             * (tf.tf * 2.2
                / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / c.avgdl))) AS s
      FROM tf JOIN q ON tf.t = q.t
              JOIN dl ON tf.doc_id = dl.doc_id
              JOIN dfreq d ON tf.t = d.t
              CROSS JOIN consts c
    ), bm AS (
      SELECT query_id, doc_id,
             CAST(floor(sum(s) * 100.0 + 0.5) AS BIGINT) AS score
      FROM s GROUP BY 1, 2
    ), bmr AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
      FROM bm
    ), qv AS (
      SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
      FROM embeddings WHERE vec_id IN (1, 2, 3)
    ), den AS (
      SELECT q.query_id, e.vec_id AS doc_id,
             CAST(floor(
               round(list_dot_product(e.embedding::DOUBLE[], q.qv)
                     / (sqrt(list_dot_product(e.embedding::DOUBLE[],
                                              e.embedding::DOUBLE[]))
                        * sqrt(list_dot_product(q.qv, q.qv))), 6)
               * 1e6 + 0.5) AS BIGINT) AS score
      FROM embeddings e CROSS JOIN qv q
    ), denr AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id) AS rank
      FROM den
    ), contrib AS (
      SELECT query_id, doc_id,
             CAST(floor(1e12 / (60.0 + rank)) AS BIGINT) AS c
      FROM bmr WHERE rank <= 20
      UNION ALL
      SELECT query_id, doc_id,
             CAST(floor(1e12 / (60.0 + rank)) AS BIGINT) AS c
      FROM denr WHERE rank <= 20
    ), fused AS (
      SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS rrf_e12
      FROM contrib GROUP BY 1, 2
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, rrf_e12,
           CAST(rank AS INT) AS rank
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                                       ORDER BY rrf_e12 DESC, doc_id) AS rank
          FROM fused)
    WHERE rank <= 10
    """,
    description="Hybrid retrieval via reciprocal-rank fusion (Cormack et "
    "al. 2009): BM25 lexical ranking fused with dense cosine ranking, "
    "top-20 per list, rrf_k=60. Both input scores are integer-quantized "
    "before ranking and RRF contributions sum in exact e12 micro-units, "
    "so the fusion is order-independent and engine-exact. All windows "
    "and the fusion groupBy key on query_id — candidate sets bounded by "
    "per-list top-k, never corpus size.",
    tags=("llm", "retrieval", "bm25", "ann", "hybrid"),
)
def llm_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.retrieval import bm25_scores, rrf_fuse

    docs = _t(spark, sf_dir, "documents")
    emb = _t(spark, sf_dir, "embeddings")
    q_terms = spark.createDataFrame(
        [(1, "table"), (1, "hash"), (2, "spark"), (2, "sort"), (2, "window"),
         (3, "merge"), (3, "batch")],
        "query_id bigint, term string",
    )
    bm = bm25_scores(docs, q_terms).select(
        "query_id",
        "doc_id",
        F.floor(F.col("score") * 100.0 + 0.5).cast("bigint").alias("score"),
    )
    qv = emb.filter(F.col("vec_id").isin(1, 2, 3)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    dense = S.cosine_topk(emb, qv, k=20).select(
        "query_id",
        F.col("vec_id").alias("doc_id"),
        F.floor(F.col("sim") * 1e6 + 0.5).cast("bigint").alias("score"),
    )
    return rrf_fuse([bm, dense], rrf_k=60, topk=10, per_list_k=20)


@register(
    "llm_source_overlap",
    oracle=f"""
    WITH toks AS (
      SELECT source, {_SQL_TOKS} AS t FROM documents
    ), sh AS (
      SELECT DISTINCT source, unnest({_SQL_SHINGLES.replace("t", "t", 1)}) AS g
      FROM (SELECT source, t FROM toks)
    )
    SELECT a.source AS source_a, b.source AS source_b,
           CAST(count(*) AS BIGINT) AS shared_shingles
    FROM sh a JOIN sh b ON a.g = b.g AND a.source < b.source
    GROUP BY 1, 2
    """,
    description="Cross-source contamination matrix: distinct word 3-grams "
    "shared between every source pair — the corpus-analytics input to "
    "mixing/decontam decisions (which sources leak into each other). "
    "Distinct (source, shingle) pairs collapse map-side BEFORE the "
    "self-equi-join on the shingle key; the pair count is bounded by "
    "shingle source-frequency, never all-docs.",
    tags=("llm", "decontam", "analytics"),
)
def llm_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # repartition by the shingle key BEFORE the distinct: HashPartitioning(g)
    # satisfies the (source, g) dedup clustering AND the join-on-g
    # distribution, so the explode runs once (AQE stage cache shares the one
    # g-exchange between both join sides) and the join adds no shuffle.
    sh = (
        docs.select(
            "source",
            F.explode(D.shingles(T.tokens(F.col("text")))).alias("g"),
        )
        .repartition("g")
        .dropDuplicates(["source", "g"])
    )
    a = sh.select(F.col("source").alias("source_a"), "g")
    b = sh.select(F.col("source").alias("source_b"), F.col("g").alias("g_b"))
    return (
        a.join(b, (F.col("g") == F.col("g_b")) & (F.col("source_a") < F.col("source_b")))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("shared_shingles"))
    )


@register(
    "llm_span_corruption",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, generate_subscripts(l, 1) - 1 AS pos, unnest(l) AS tok
      FROM (SELECT doc_id,
                   list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS l
            FROM documents WHERE doc_id < 200)
    ), m AS (
      SELECT doc_id, pos, tok,
             (('0x' || substr(md5(doc_id || ':' || pos), 1, 4))::BIGINT % 100) < 15
               AS masked
      FROM toks
    ), sp1 AS (
      SELECT doc_id, pos, tok, masked,
             masked AND NOT coalesce(
               lag(masked) OVER (PARTITION BY doc_id ORDER BY pos), FALSE)
               AS new_span
      FROM m
    ), sp AS (
      SELECT doc_id, pos, tok, masked, new_span,
             sum(CASE WHEN new_span THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS span_id
      FROM sp1
    )
    SELECT doc_id,
           coalesce(string_agg(
             CASE WHEN NOT masked THEN tok
                  WHEN new_span THEN '<extra_id_' || (span_id - 1) || '>' END,
             ' ' ORDER BY pos), '') AS input_text,
           coalesce(string_agg(
             CASE WHEN masked THEN
               CASE WHEN new_span
                    THEN '<extra_id_' || (span_id - 1) || '> ' || tok
                    ELSE tok END END,
             ' ' ORDER BY pos), '') AS target_text,
           CAST(max(span_id) AS BIGINT) AS n_spans
    FROM sp GROUP BY doc_id
    """,
    description="T5-style span corruption (operators/text.py:"
    "span_corruption): ~15% of tokens masked by md5(doc:pos) draw, masked "
    "runs collapse to <extra_id_k> sentinels in the input and expand after "
    "their sentinel in the target. Pure function of the data — identical "
    "(input, target) pairs on any engine, run, or partitioning.",
    tags=("llm", "text", "pretraining"),
)
def llm_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return T.span_corruption(docs)


@register(
    "llm_chunking",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS t
      FROM documents
    ), c AS (
      SELECT doc_id,
             unnest(list_transform(range(0, CAST((len(t) - 1) // 25 AS INT) + 1),
               k -> struct_pack(
                 chunk_id := CAST(k AS INT),
                 chunk_text := array_to_string(t[k*25 + 1 : k*25 + 30], ' '),
                 n_chunk_tokens := CAST(len(t[k*25 + 1 : k*25 + 30]) AS BIGINT)
               ))) AS u
      FROM toks WHERE len(t) > 0
    )
    SELECT doc_id, u.chunk_id AS chunk_id, u.chunk_text AS chunk_text,
           u.n_chunk_tokens AS n_chunk_tokens
    FROM c
    """,
    description="Overlapping token-window chunking (operators/text.py:"
    "chunk_documents): 30-token windows every 25 tokens (5-token overlap), "
    "final window ragged — the RAG/embedding-index prep pass. Zero "
    "shuffles; (doc, k) fully determines chunk k for incremental "
    "re-embedding.",
    tags=("llm", "text", "chunking"),
)
def llm_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return T.chunk_documents(docs, chunk_tokens=30, stride=25)


@register(
    "llm_split_assign",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             ('0x' || substr(md5(doc_id || ':split-v1'), 1, 6))::BIGINT % 100
               AS bucket
      FROM documents
    )
    SELECT doc_id, bucket,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    description="Deterministic train/val/test split (operators/text.py:"
    "split_assign): md5(id:salt) buckets — a pure function of the key, so "
    "docs never migrate between splits as the corpus grows. Zero shuffle.",
    tags=("llm", "split"),
)
def llm_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return T.split_assign(docs).select("doc_id", "bucket", "split")


@register(
    "llm_incremental_dedup",
    oracle="""
    WITH hist AS (
      SELECT DISTINCT md5(text) AS digest FROM documents WHERE doc_id < 400
    ), batch AS (
      SELECT doc_id, text, lang, source FROM documents WHERE doc_id >= 400
      QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    )
    SELECT b.doc_id, b.lang, b.source
    FROM batch b LEFT JOIN hist h ON md5(b.text) = h.digest
    WHERE h.digest IS NULL
    """,
    description="Incremental exact dedup (operators/dedup.py:"
    "incremental_exact_dedup): today's batch (doc_id >= 400) dedups "
    "within itself then anti-joins the historical digest index "
    "(doc_id < 400) — cost scales with the increment, not the corpus. "
    "The production day-to-day shape of dedup; the streaming twin is "
    "dropDuplicates state.",
    tags=("llm", "dedup", "incremental"),
)
def llm_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    hist = docs.filter(F.col("doc_id") < 400).select(
        F.md5("text").alias("digest")
    ).distinct()
    batch = docs.filter(F.col("doc_id") >= 400)
    survivors, _updated = D.incremental_exact_dedup(
        batch, hist, ["text"], "doc_id"
    )
    return survivors.select("doc_id", "lang", "source")


@register(
    "llm_quality_dedup",
    oracle="""
    WITH fp AS (
      SELECT doc_id, lang,
             md5(array_to_string(list_sort(list_distinct(
               list_filter(string_split_regex(lower(text), '\\s+'), x -> x <> '')
             )), ' ')) AS fprint,
             length(text) AS nc
      FROM documents
    )
    SELECT doc_id, lang, fprint
    FROM fp
    QUALIFY row_number() OVER (PARTITION BY fprint
                               ORDER BY nc DESC, doc_id) = 1
    """,
    description="Quality-policy dedup: within each fingerprint-collision "
    "cluster keep the LONGEST document (ties to lowest id) instead of the "
    "lowest id — survivor selection is a pluggable ORDER BY on the same "
    "one-shuffle digest window (exact_dedup generalized).",
    tags=("llm", "dedup", "policy"),
)
def llm_quality_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window as W

    docs = _t(spark, sf_dir, "documents").withColumn(
        "fprint", T.fingerprint("text")
    )
    w = W.partitionBy("fprint").orderBy(
        F.length("text").desc(), F.col("doc_id").asc()
    )
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "lang", "fprint")
    )


@register(
    "llm_corpus_dashboard",
    oracle=r"""
    WITH s AS (
      SELECT source, lang, text,
             len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))
               AS ntok,
             md5(text) AS digest
      FROM documents
    )
    SELECT source, lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(ntok) AS BIGINT) AS total_tokens,
           CAST(min(ntok) AS BIGINT) AS min_tokens,
           CAST(max(ntok) AS BIGINT) AS max_tokens,
           CAST(count(DISTINCT digest) AS BIGINT) AS n_distinct,
           CAST(count(*) - count(DISTINCT digest) AS BIGINT) AS n_exact_dups
    FROM s GROUP BY 1, 2
    """,
    description="Corpus health dashboard: per (source, lang) document and "
    "token counts plus exact-dup counts in ONE aggregation pass — the "
    "monitoring rollup a pipeline emits per ingest. count(DISTINCT digest) "
    "rides the same shuffle via Spark's expand-based distinct-agg rewrite.",
    tags=("llm", "analytics", "dashboard"),
)
def llm_corpus_dashboard(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    ntok = F.size(T.tokens(F.col("text")))
    return (
        docs.select(
            "source",
            "lang",
            ntok.alias("ntok"),
            F.md5("text").alias("digest"),
        )
        .groupBy("source", "lang")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("ntok").cast("bigint").alias("total_tokens"),
            F.min("ntok").cast("bigint").alias("min_tokens"),
            F.max("ntok").cast("bigint").alias("max_tokens"),
            F.count_distinct("digest").cast("bigint").alias("n_distinct"),
            (F.count("*") - F.count_distinct("digest"))
            .cast("bigint")
            .alias("n_exact_dups"),
        )
    )


@register(
    "llm_pipeline_full",
    oracle=f"""
    WITH s AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, '\\s+'), x -> x <> '') AS t,
             length(text) AS nc,
             len(regexp_extract_all(text, '[^\\w\\s]')) AS punct,
             len(regexp_extract_all(text, '[0-9]')) AS digits
      FROM documents
    ), m AS (
      SELECT doc_id, text, t, len(t) AS ntok, nc, punct, digits,
             len(list_filter(t, x -> list_contains(['the','a','of','and','is'],
                                                   lower(x)))) AS nstop
      FROM s
    ), f AS (  -- stage 1: linear quality filter
      SELECT doc_id, text, t, ntok
      FROM (SELECT *,
              round(CASE WHEN ntok > 0 THEN CAST(nc AS DOUBLE)/ntok ELSE 0.0 END, 4) AS f_avg,
              round(CASE WHEN ntok > 0 THEN CAST(nstop AS DOUBLE)/ntok ELSE 0.0 END, 4) AS f_stop,
              round(CASE WHEN nc > 0 THEN CAST(punct AS DOUBLE)/nc ELSE 0.0 END, 4) AS f_punct,
              round(CASE WHEN nc > 0 THEN CAST(digits AS DOUBLE)/nc ELSE 0.0 END, 4) AS f_digit
            FROM m)
      WHERE (-1.2 + (CAST(least(ntok, 100) AS DOUBLE) / 100.0) * 1.5
             + f_avg * 0.35 + f_stop * 4.0
             + f_punct * (-6.0) + f_digit * (-3.0)) > 0
    ), d AS (  -- stage 2: exact dedup, lowest id survives
      SELECT doc_id, text, t, ntok FROM f
      QUALIFY row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) = 1
    ), sh AS (
      SELECT doc_id, {_SQL_SHINGLES} AS sset FROM d
    ), ev AS (  -- stage 3: decontaminate vs the eval slice
      SELECT DISTINCT unnest({_SQL_SHINGLES}) AS g
      FROM (SELECT {_SQL_TOKS} AS t FROM documents WHERE doc_id % 97 = 0)
    ), dirty AS (
      SELECT DISTINCT s2.doc_id
      FROM (SELECT doc_id, unnest(sset) AS g FROM sh) s2 JOIN ev USING (g)
      WHERE s2.doc_id % 97 <> 0
    )
    SELECT d.doc_id,
           CAST(d.ntok AS BIGINT) AS n_tokens,
           CASE WHEN (('0x' || substr(md5(d.doc_id || ':split-v1'), 1, 6))::BIGINT
                      % 100) < 80 THEN 'train'
                WHEN (('0x' || substr(md5(d.doc_id || ':split-v1'), 1, 6))::BIGINT
                      % 100) < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM d
    LEFT JOIN dirty ON d.doc_id = dirty.doc_id
    WHERE dirty.doc_id IS NULL AND d.doc_id % 97 <> 0
    """,
    description="The full pretraining intake pipeline as ONE oracle-checked "
    "chain: model-based quality filter → exact dedup (lowest id per md5) → "
    "benchmark decontamination (3-gram overlap vs the doc_id%97 eval "
    "slice) → deterministic split assignment. Every stage reuses an "
    "individually-verified operator; the oracle replays all four in CTEs. "
    "Plan: zero-shuffle filter, one digest window, one broadcast probe + "
    "doc groupBy, zero-shuffle split — four stages, two shuffles.",
    tags=("llm", "pipeline", "flagship"),
)
def llm_pipeline_full(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    kept = T.quality_logit(docs).filter(F.col("keep")).select("doc_id", "text")
    deduped = D.exact_dedup(kept, ["text"], "doc_id")
    train = deduped.filter(F.col("doc_id") % 97 != 0)
    eval_df = docs.filter(F.col("doc_id") % 97 == 0)
    flags = D.contamination(train, eval_df)
    clean = train.join(
        flags.filter(~F.col("contaminated")).select("doc_id"), "doc_id"
    )
    out = T.split_assign(clean)
    return out.select(
        "doc_id",
        F.size(T.tokens(F.col("text"))).cast("bigint").alias("n_tokens"),
        "split",
    )


@register(
    "llm_gopher_rules",
    oracle=r"""
    WITH t AS (
      SELECT doc_id, text,
             list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS w
      FROM documents
    ), m AS (
      SELECT doc_id,
             len(w) AS n_words,
             CASE WHEN len(w) > 0
               THEN CAST(list_sum(list_transform(w, x -> length(x))) AS DOUBLE) / len(w)
               ELSE 0.0 END AS mean_len,
             CASE WHEN len(w) > 0
               THEN CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE) / len(w)
               ELSE 0.0 END AS sym,
             CASE WHEN len(w) > 0
               THEN CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]'))) AS DOUBLE) / len(w)
               ELSE 0.0 END AS alpha,
             len(list_filter(w, x -> list_contains(
               ['the','be','to','of','and','that','have','with'], lower(x)))) AS n_stop
      FROM t
    )
    SELECT doc_id,
           CAST(n_words AS BIGINT) AS n_words,
           round(mean_len, 4) AS mean_word_len,
           round(sym, 4) AS symbol_ratio,
           round(alpha, 4) AS alpha_frac,
           CAST(n_stop AS BIGINT) AS n_stopwords,
           CAST(CASE WHEN n_words BETWEEN 10 AND 100000
                      AND mean_len BETWEEN 2.0 AND 12.0
                      AND sym <= 0.1 AND alpha >= 0.8 AND n_stop >= 2
                 THEN 1 ELSE 0 END AS BIGINT) AS passes_gopher
    FROM m
    """,
    description="Gopher-rule quality screen: per-rule signal columns + the "
    "composite verdict (word count, mean word length, symbol ratio, "
    "alpha-word fraction, stopword floor).",
    tags=("llm", "text", "quality"),
)
def llm_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return T.gopher_rules(docs).select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "symbol_ratio",
        "alpha_frac",
        "n_stopwords",
        F.col("passes_gopher").cast("bigint").alias("passes_gopher"),
    )


@register(
    "llm_global_shuffle",
    oracle="""
    SELECT doc_id,
           CAST(row_number() OVER (ORDER BY md5('42:' || doc_id), doc_id) - 1
                AS BIGINT) AS pos,
           CAST((row_number() OVER (ORDER BY md5('42:' || doc_id), doc_id) - 1) % 8
                AS BIGINT) AS shard
    FROM documents
    """,
    description="Deterministic seeded global training order (md5 order key) "
    "+ round-robin shard assignment — computed as bucket-prefix counts + "
    "per-bucket windows, never a single-partition global window.",
    tags=("llm", "training", "shuffle"),
)
def llm_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.mixing import global_order_index

    docs = _t(spark, sf_dir, "documents")
    return global_order_index(docs, "doc_id", seed="42", n_shards=8).select(
        "doc_id", "pos", "shard"
    )


@register(
    "llm_tfidf_topk",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                x -> x <> '')) AS term
      FROM documents
    ), tf AS (
      SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term
    ), dfreq AS (
      SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (
      SELECT count(DISTINCT doc_id) AS n_docs FROM documents
    )
    SELECT doc_id, term,
           round(tf * (ln((n_docs + 1.0) / (df + 1.0)) + 1.0), 4) AS tfidf
    FROM tf JOIN dfreq USING (term) CROSS JOIN n
    QUALIFY row_number() OVER (PARTITION BY doc_id
                               ORDER BY tfidf DESC, term) <= 3
    """,
    description="Top-3 characteristic terms per document by smoothed TF-IDF "
    "(scikit-learn idf form), deterministic term tie-break.",
    tags=("llm", "text", "retrieval"),
)
def llm_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.retrieval import tfidf_topk

    docs = _t(spark, sf_dir, "documents")
    return tfidf_topk(docs, "doc_id", "text", k=3)


@register(
    "llm_ngram_lm_score",
    oracle="""
    WITH g AS (
      SELECT doc_id,
             unnest(CASE WHEN length(text) >= 2
               THEN list_transform(range(1, length(text)),
                                   i -> substring(text, i, 2))
               ELSE []::VARCHAR[] END) AS bg
      FROM documents
    ), model AS (
      SELECT bg, count(*) AS c FROM g GROUP BY bg
    ), ctx AS (
      SELECT substring(bg, 1, 1) AS p, sum(c) AS cc FROM model GROUP BY p
    ), v AS (
      SELECT count(DISTINCT ch) AS v FROM (
        SELECT unnest(list_transform(range(1, length(text) + 1),
                                     i -> substring(text, i, 1))) AS ch
        FROM documents
      )
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           round(avg(ln((c + 1.0) / (cc + v))), 4) AS avg_logp
    FROM g JOIN model USING (bg)
           JOIN ctx ON substring(g.bg, 1, 1) = ctx.p
           CROSS JOIN v
    GROUP BY doc_id
    """,
    description="KenLM-style fluency score: corpus-trained char-bigram LM "
    "with add-one smoothing; per-doc mean log-probability flags OCR noise "
    "and encoding damage.",
    tags=("llm", "text", "quality"),
)
def llm_ngram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return T.char_bigram_lm_scores(docs).select("doc_id", "n_bigrams", "avg_logp")


@register(
    "llm_fasttext_score",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '') AS t
      FROM documents
    ), feats AS (
      SELECT doc_id,
             list_concat(t,
               CASE WHEN len(t) >= 2
                 THEN list_transform(range(1, len(t)),
                                     i -> t[i] || ' ' || t[i+1])
                 ELSE []::VARCHAR[] END) AS fs
      FROM toks
    ), scored AS (
      SELECT doc_id,
             CAST(len(fs) AS BIGINT) AS n_feats,
             CAST(coalesce(list_sum(list_transform(fs, f ->
               (('0x' || substr(md5('w#' || CAST(
                   (('0x' || substr(md5(f), 1, 15))::BIGINT % 262144)
                 AS VARCHAR)), 1, 15))::BIGINT % 2001) - 1000
             )), 0) AS BIGINT) AS w_sum_units
      FROM feats
    )
    SELECT doc_id, n_feats, w_sum_units, w_sum_units > 0 AS keep
    FROM scored
    """,
    description="fastText-style hashed bag-of-n-grams linear classifier "
    "inference (operators/text.py:hashed_bow_score): unigram+bigram "
    "hashing trick into 2^18 weight buckets, exact integer micro-unit "
    "weight sum, zero shuffle. The model-based quality-filter slot of "
    "DCLM/fastText pipelines; swap the hash-derived weights for exported "
    "trained weights via a broadcast map to productionize.",
    tags=("llm", "text", "quality", "classifier"),
)
def llm_fasttext_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return T.hashed_bow_score(docs)


@register(
    "llm_inverted_index",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             unnest(list_distinct(list_filter(
               string_split_regex(lower(text), '\s+'), x -> x <> ''))) AS term
      FROM documents
    ), r AS (
      SELECT doc_id, term,
             row_number() OVER (PARTITION BY term ORDER BY doc_id) AS rn
      FROM toks
    )
    SELECT term, CAST(count(*) AS BIGINT) AS df,
           array_to_string(list_sort(list(doc_id) FILTER (WHERE rn <= 64)),
                           ',') AS postings
    FROM r GROUP BY term
    """,
    description="Capped inverted-index build "
    "(operators/retrieval.py:inverted_index): per-term document frequency "
    "+ first 64 postings, rank-capped BEFORE the array is built so a "
    "stopword's postings can never blow an aggregation buffer; window and "
    "groupBy share the term key (one shuffle).",
    tags=("llm", "retrieval", "index"),
)
def llm_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ops_spark.operators.retrieval import inverted_index

    docs = _t(spark, sf_dir, "documents")
    return inverted_index(docs, max_postings=64)


@register(
    "llm_perplexity_buckets",
    oracle="""
    WITH grams AS (
      SELECT doc_id,
             unnest(CASE WHEN length(text) >= 2
               THEN list_transform(range(1, length(text)),
                                   i -> substring(text, i, 2))
               ELSE []::VARCHAR[] END) AS bg
      FROM documents
    ), model AS (
      SELECT bg, count(*) AS c FROM grams GROUP BY bg
    ), sc AS (
      SELECT doc_id, count(*) AS n, sum(c) AS sum_c
      FROM grams JOIN model USING (bg) GROUP BY doc_id
    ), scored AS (
      SELECT d.doc_id, d.lang,
             CAST((sum_c * 1000000) // n AS BIGINT) AS fluency_e6
      FROM sc JOIN documents d USING (doc_id)
    ), hist AS (
      SELECT lang, fluency_e6, count(*) AS hn FROM scored GROUP BY 1, 2
    ), cuts AS (
      SELECT lang, fluency_e6,
        CASE WHEN 3 * sum(hn) OVER (PARTITION BY lang ORDER BY fluency_e6 DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 <= sum(hn) OVER (PARTITION BY lang) THEN 'head'
             WHEN 3 * sum(hn) OVER (PARTITION BY lang ORDER BY fluency_e6 DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 <= 2 * sum(hn) OVER (PARTITION BY lang) THEN 'middle'
             ELSE 'tail' END AS bucket
      FROM hist
    )
    SELECT s.doc_id, s.lang, s.fluency_e6, c.bucket
    FROM scored s JOIN cuts c USING (lang, fluency_e6)
    """,
    description="CCNet-style per-language head/middle/tail bucketing "
    "(operators/text.py:fluency_score_e6 + tertile_buckets): exact-integer "
    "bigram-frequency fluency proxy, tertile cut computed on the bounded "
    "(lang, score) histogram instead of ntile over whole-language sort "
    "partitions — the skew-safe form of CCNet's perplexity split.",
    tags=("llm", "text", "quality", "ccnet"),
)
def llm_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    scored = docs.select("doc_id", "lang").join(
        T.fluency_score_e6(docs), "doc_id"
    )
    return T.tertile_buckets(scored, "fluency_e6", "lang").select(
        "doc_id", "lang", "fluency_e6", "bucket"
    )


@register(
    "llm_url_blocklist",
    oracle="""
    WITH hosts AS (
      SELECT doc_id,
             source || '.example.' ||
             CASE WHEN lang = 'de' THEN 'net' ELSE 'com' END AS host
      FROM documents
    ), bl(domain, category) AS (
      VALUES ('example.net', 'geo'), ('src1.example.com', 'ads'),
             ('src7.example.com', 'adult'), ('src1.example.net', 'ads-specific')
    ), sfx AS (
      SELECT doc_id,
             unnest(list_transform(range(1, least(len(ls), 4) + 1),
                    k -> array_to_string(ls[len(ls)-k+1:], '.'))) AS s
      FROM (SELECT doc_id, string_split(host, '.') AS ls FROM hosts)
    ), best AS (
      SELECT doc_id, category FROM (
        SELECT doc_id, category,
               row_number() OVER (PARTITION BY doc_id
                 ORDER BY length(domain) DESC, category ASC, domain ASC) AS rn
        FROM sfx JOIN bl ON s = domain
      ) WHERE rn = 1
    )
    SELECT h.doc_id, h.host, b.category
    FROM hosts h LEFT JOIN best b USING (doc_id)
    """,
    description="UT1-style URL blocklist filter "
    "(operators/text.py:host_suffixes + blocklist_categories): host "
    "dot-suffix explode turns parent-domain matching into an EQUI-join "
    "(hash-joinable against a multi-million-row blocklist, no nested "
    "loop); longest matching domain wins. Null category = clean.",
    tags=("llm", "text", "filter", "crawl"),
)
def llm_url_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    hosts = docs.select(
        "doc_id",
        F.concat(
            F.col("source"),
            F.lit(".example."),
            F.when(F.col("lang") == "de", "net").otherwise("com"),
        ).alias("host"),
    )
    bl = spark.createDataFrame(
        [
            ("example.net", "geo"),
            ("src1.example.com", "ads"),
            ("src7.example.com", "adult"),
            ("src1.example.net", "ads-specific"),
        ],
        "domain string, category string",
    )
    return T.blocklist_categories(hosts, bl)
