"""Custom operators the reference lacks, built Spark-first.

Everything here is a DataFrame→DataFrame composition of built-in
pyspark.sql.functions (JVM-side, codegen) unless genuinely impossible, in
which case it is an Arrow-batched Pandas UDF (never row-at-a-time Python).
Each operator documents its shuffle contract — what it partitions on and
why the plan survives a 100 TB input.
"""

from ops_spark.operators import (  # noqa: F401
    asof,
    dedup,
    graph,
    multimodal,
    similarity,
    skew,
    text,
)
from ops_spark.operators.asof import asof_join
from ops_spark.operators.dedup import (
    embedding_dedup,
    exact_dedup,
    minhash_lsh_dedup,
    ngram_jaccard_pairs,
)
from ops_spark.operators.graph import connected_components, dedup_by_components, pagerank
from ops_spark.operators.similarity import ann_topk, cosine_topk, ivf_topk

__all__ = [
    "asof_join",
    "exact_dedup",
    "minhash_lsh_dedup",
    "ngram_jaccard_pairs",
    "embedding_dedup",
    "connected_components",
    "dedup_by_components",
    "pagerank",
    "cosine_topk",
    "ann_topk",
    "ivf_topk",
]
