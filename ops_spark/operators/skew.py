"""Skew-mitigation operators: salting for hot keys.

The OPS fork sidesteps skew structurally (per-node pre-merge makes every
reducer read one file) but loses per-partition size stats entirely
(reference: fake MapStatus, OpsPreShuffleWriter.java:290-295). Modern Spark
splits skewed partitions at runtime (AQE skew-join,
spark.sql.adaptive.skewJoin.* — enabled by ops_spark.session); the salting
operators here cover the cases AQE cannot: skewed AGGREGATION keys, and
joins where the skewed side must hash-join a non-broadcastable build side.

Pattern: explode the hot key into `salt_buckets` sub-keys, do the heavy
shuffle on (key, salt), then a cheap second aggregation/join on the
original key — two balanced shuffles instead of one straggler.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, salt_buckets: int = 16, salt_col: str = "__salt") -> DataFrame:
    """Attach a uniform salt column (hash of all columns → stable, no rand())."""
    return df.withColumn(
        salt_col, F.pmod(F.xxhash64(*df.columns), F.lit(salt_buckets)).cast("int")
    )


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 shuffles on (group, salt) — a hot key spreads over
    `salt_buckets` reducers; phase 2 merges the per-salt partials on the
    true key (tiny input: groups × buckets rows). Supported aggs:
    sum/count/min/max (the re-mergeable ones; avg = sum+count then divide).
    """
    mergers = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    firsts = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in mergers:
            raise ValueError(f"salted_agg supports {sorted(mergers)}, got {fn}")
    with_salt = salted(df, salt_buckets)
    partial = with_salt.groupBy(*group_cols, "__salt").agg(
        *[firsts[fn](c).alias(f"__p_{c}_{fn}") for c, fn in aggs.items()]
    )
    return partial.groupBy(*group_cols).agg(
        *[
            mergers[fn](f"__p_{c}_{fn}").alias(f"{fn}_{c}")
            for c, fn in aggs.items()
        ]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    on: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi join: salt the big side, REPLICATE the small side.

    The small side is exploded ×salt_buckets (must be the smaller relation —
    it is also what AQE would have had to broadcast); each copy carries one
    salt value so the join key becomes (on, salt) and the hot key's rows
    spread across salt_buckets tasks. Use when the small side exceeds the
    broadcast threshold but the big side has hot keys.
    """
    big = skewed.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets)).cast("int"),
    )
    replicated = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    out = big.join(replicated, [on, "__salt"], how)
    return out.drop("__salt")
