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
