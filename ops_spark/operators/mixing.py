"""Deterministic data mixing (source-ratio resampling) for training sets.

A pretraining corpus is assembled by DOWN/UP-weighting sources to target
proportions. Seeded RNG sampling (df.sample / TABLESAMPLE) is executor-
topology-dependent and not reproducible across engines; here the keep
decision is a pure function of (key, salt): the first 8 hex chars of
md5(key || ':' || salt) interpreted as a uniform 32-bit draw. The same
row survives in every engine, every run, every partitioning — the
property a 100 TB pipeline needs to be auditable and resumable.

Scale contract: the filter is a narrow per-row expression (JVM md5 +
arithmetic, whole-stage codegen) — zero shuffles; changing the mix is a
rescan, not a re-shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_U32 = float(1 << 32)


def hash_uniform(key: Column, salt: str) -> Column:
    """Deterministic uniform draw in [0, 1): md5-based, engine-portable
    (DuckDB: ('0x' || substr(md5(key || ':' || salt), 1, 8))::BIGINT / 2^32)."""
    h = F.md5(F.concat(key.cast("string"), F.lit(f":{salt}")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint") / F.lit(_U32)


def mix_sample(
    df: DataFrame,
    fractions: Column,
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Keep each row iff its deterministic draw < its target fraction.

    ``fractions`` is a Column expression mapping the row to its keep
    probability (e.g. a CASE over the source column, or a joined-in
    per-source ratio) — evaluated per row, so stratified mixing is just
    an expression, not N filtered unions.
    """
    return df.filter(hash_uniform(F.col(key_col), salt) < fractions)


def global_order_index(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: str = "42",
    n_shards: int = 8,
    prefix_len: int = 4,
    strata: tuple[str, ...] = (),
) -> DataFrame:
    """Deterministic seeded global training order: pos + shard per row.

    Training-data assembly needs a reproducible global shuffle: the same
    (corpus, seed) must yield the same example order on every engine, run,
    and cluster size. Order key = md5(seed || ':' || id); ``pos`` is the
    0-based global rank under (key, id); ``shard = pos % n_shards`` deals
    the shuffled order round-robin into equal-size shards.

    Scale contract — global rank WITHOUT a single-partition window and
    WITHOUT the sampled range partitioner (whose boundaries are not
    reproducible across re-executions):

    1. bucket = first ``prefix_len`` hex chars of the key, as an int.
       Buckets are md5-uniform (no skew) and PREFIX-ordered: sorting by
       (bucket, key) equals sorting by key.
    2. One narrow aggregation counts rows per bucket (map-side combine;
       at most 16^prefix_len metadata rows), a cumulative window over that
       tiny table yields each bucket's global offset, and the offsets
       broadcast-join back.
    3. Rank WITHIN a bucket is a window partitioned by bucket — 16^4
       buckets at 100 TB ≈ 1.5 GB per window partition; raise prefix_len
       to shrink them.

    Two corpus scans (count + rank), both shuffling only (bucket, id)-width
    rows; every step is a pure function of the data, so recomputation under
    failure reproduces identical positions.

    ``strata``: optional grouping columns; ``pos`` then restarts at 0
    within each stratum (the offsets table grows to |strata| × 16^p rows
    and the cumulative window partitions by stratum — still metadata-sized).
    """
    from pyspark.sql import Window

    s = list(strata)
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    base = df.withColumn("_okey", key).withColumn(
        "_bucket", F.conv(F.substring("_okey", 1, prefix_len), 16, 10).cast("bigint")
    )
    counts = base.groupBy(*s, "_bucket").agg(F.count(F.lit(1)).alias("_n"))
    # Cumulative offsets over the metadata-sized counts table: exclusive
    # prefix sum ordered by bucket. Window over <=|strata|*16^p rows
    # (single-partition only in the stratum-free case).
    w_off = (
        (Window.partitionBy(*s) if s else Window).orderBy("_bucket")
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        *s, "_bucket", F.coalesce(F.sum("_n").over(w_off), F.lit(0)).alias("_off")
    )
    w_rank = Window.partitionBy(*s, "_bucket").orderBy("_okey", id_col)
    ranked = (
        base.join(F.broadcast(offsets), [*s, "_bucket"])
        .withColumn(
            "pos", (F.col("_off") + F.row_number().over(w_rank) - 1).cast("bigint")
        )
        .withColumn("shard", F.pmod(F.col("pos"), F.lit(n_shards)).cast("bigint"))
    )
    return ranked.drop("_okey", "_bucket", "_off")


def stratified_split(
    df: DataFrame,
    eval_frac: float = 0.05,
    strata: tuple[str, ...] = ("source",),
    id_col: str = "doc_id",
    seed: str = "split",
) -> DataFrame:
    """EXACT-proportion train/eval split per stratum: ``ceil(eval_frac·n_s)``
    rows of every stratum land in eval, deterministically.

    ``split_assign`` (hash-bucket thresholding) gives each row an
    independent Bernoulli draw — per-stratum proportions are only correct
    in expectation, and a small or unlucky stratum can end up with zero
    eval rows. Here the stratum's rows are ranked by the seeded order key
    (``global_order_index`` with ``strata`` — no single-partition window,
    no sampled range partitioner) and the first ``ceil(eval_frac·n_s)``
    positions are eval: exact counts, reproducible under any partitioning,
    and adding a NEW stratum never reshuffles existing strata's membership
    (ranks are a pure function of the stratum's own rows + seed).

    Scale: two corpus scans (stratum-bucket counts + rank), the per-stratum
    totals table is |strata|-sized and broadcast back.
    """
    s = list(strata)
    ranked = global_order_index(df, id_col=id_col, seed=seed, strata=strata)
    totals = df.groupBy(*s).agg(F.count(F.lit(1)).alias("_n_s"))
    return (
        ranked.join(F.broadcast(totals), s)
        .withColumn(
            "split",
            F.when(
                F.col("pos") < F.ceil(F.lit(float(eval_frac)) * F.col("_n_s")),
                F.lit("eval"),
            ).otherwise(F.lit("train")),
        )
        .drop("_n_s", "shard")
    )


def temperature_resample(
    df: DataFrame,
    alpha: float = 0.5,
    target_rows: int | None = None,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-reweighted corpus resampling: source s is drawn with
    probability ∝ n_s^alpha (alpha<1 flattens the natural distribution —
    the multilingual-pretraining / DoReMi-adjacent mixing rule), realised
    as a DETERMINISTIC per-row copy count, never an RNG draw.

    Expected copies of a row in source s:
        c_s = (n_s^alpha / Σ_t n_t^alpha) · N_target / n_s
    (>1 upweights: the row is physically replicated; <1 downweights).
    The integer count is floor(c_s) plus one more iff the row's
    ``hash_uniform`` draw < frac(c_s) — so the realised corpus size is
    within one row per source of the target in expectation, and the SAME
    rows replicate in every engine/run/partitioning.

    Output: one row per emitted copy, with ``copy`` (0-based) so downstream
    packing/sharding can separate replicas. Scale contract: the per-source
    rate table is |sources| rows (broadcast back); emission is a narrow
    explode — no shuffle of the corpus at all.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n_s"))
    weights = counts.withColumn("_w", F.pow(F.col("_n_s").cast("double"), F.lit(float(alpha))))
    tot = weights.agg(
        F.sum("_w").alias("_w_sum"), F.sum("_n_s").alias("_n_total")
    )
    rates = weights.crossJoin(F.broadcast(tot)).select(
        source_col,
        (
            (F.col("_w") / F.col("_w_sum"))
            * (
                F.lit(float(target_rows)) if target_rows is not None
                else F.col("_n_total").cast("double")
            )
            / F.col("_n_s").cast("double")
        ).alias("_c"),
    )
    drawn = df.join(F.broadcast(rates), source_col).withColumn(
        "_k",
        (
            F.floor("_c")
            + F.when(
                hash_uniform(F.col(id_col), salt) < F.col("_c") - F.floor("_c"), 1
            ).otherwise(0)
        ).cast("int"),
    )
    # sequence(0, k-1) with k=0 would produce the DESCENDING [0, -1]; gate
    # emission on k >= 1 and explode an empty array otherwise.
    return (
        drawn.withColumn(
            "copy",
            F.explode(
                F.when(F.col("_k") >= 1, F.sequence(F.lit(0), F.col("_k") - 1))
                .otherwise(F.array().cast("array<int>"))
            ),
        )
        .drop("_c", "_k")
    )


def doremi_mixture(
    df: DataFrame,
    domain_col: str = "source",
    loss_col: str = "loss_e4",
    iters: int = 5,
    eta: float = 1.0,
    smoothing: float = 1e-3,
) -> DataFrame:
    """DoReMi-lite domain-mixture optimization (Xie et al. 2023,
    "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    Pretraining", arXiv:2305.10429): Group-DRO exponentiated-gradient
    ascent over per-domain excess loss — domains the (proxy) model finds
    hard get upweighted, and the returned mixture is the AVERAGE of the
    per-step weights (the paper's estimator), floored with a uniform
    smoothing term so no domain starves.

    ``loss_col`` carries an e4-quantized integer loss per document (any
    per-doc difficulty proxy: LM negative log-likelihood, quality-logit
    complement). Per-domain means come from ONE map-side-combinable
    aggregation over exact BIGINT sums; only the ~|domains|-row table is
    collected (bounded metadata — the same driver contract as IVF
    centroids / BPE argmax; domain counts are 10s-100s in practice, never
    corpus-scale). The EG loop is pure driver arithmetic over that tiny
    table; excess is normalized by the loss RANGE so eta is scale-free.

    Returns (domain, n_docs, avg_loss_e4, weight_e6) with weight_e6
    integer-quantized weights summing to ~1e6.
    """
    stats = (
        df.groupBy(F.col(domain_col).alias("domain"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.col(loss_col).cast("bigint")).alias("s"),
        )
        .select(
            "domain",
            "n_docs",
            F.floor(F.col("s") / F.col("n_docs") + 0.5)
            .cast("bigint")
            .alias("avg_loss_e4"),
        )
        .orderBy("domain")
        .collect()
    )
    domains = [r.domain for r in stats]
    losses = [float(r.avg_loss_e4) for r in stats]
    k = len(domains)
    mean = sum(losses) / k
    rng = max(losses) - min(losses) or 1.0
    excess = [(x - mean) / rng for x in losses]
    w = [1.0 / k] * k
    acc = [0.0] * k
    import math

    for _ in range(iters):
        w = [wi * math.exp(eta * ei) for wi, ei in zip(w, excess)]
        tot = sum(w)
        w = [wi / tot for wi in w]
        acc = [a + wi for a, wi in zip(acc, w)]
    avg = [a / iters for a in acc]
    final = [(1.0 - smoothing) * a + smoothing / k for a in avg]
    spark = df.sparkSession
    return spark.createDataFrame(
        [
            (d, int(r.n_docs), int(r.avg_loss_e4), int(fw * 1e6 + 0.5))
            for d, r, fw in zip(domains, stats, final)
        ],
        "domain string, n_docs bigint, avg_loss_e4 bigint, weight_e6 bigint",
    )
