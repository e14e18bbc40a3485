"""Bloom filter as a deterministic DataFrame aggregate.

Parity target: ``df.stat.bloomFilter`` (reference: common/sketch/src/main/
java/org/apache/spark/util/sketch/BloomFilter.java:42), which Spark exposes
to Scala/Java only — PySpark's DataFrameStatFunctions has no bloomFilter and
``bloom_filter_agg`` is not a public SQL function in Spark 4. This module
rebuilds the capability on public primitives:

- positions come from ``xxhash64(value, seed_i) % m`` — JVM-side codegen,
  deterministic across runs/partitions (no PYTHONHASHSEED involvement);
- the build aggregates positions into 64-bit bitmap words cluster-side
  (group by word index, ``bit_or`` of the bit masks — partial-aggregable,
  so map-side combine runs before the one shuffle), and the driver
  receives at most m/64 longs — the filter's own bitmap, never row- or
  set-bit-count-proportional driver traffic;
- membership is a pure Column expression: codegen'd bit tests against a
  literal word array for small filters, or an Arrow-batched numpy bit test
  against a broadcast bitmap for large ones (hashing stays JVM-side in both
  modes, so Python never needs to reproduce xxhash64).

Semantic parity, not bit parity: Spark's BloomFilter uses 32-bit Murmur3
double-hashing, so the two filters' bitmaps differ; the observable contract
(no false negatives, ~fpp false positives, deterministic) is property-tested
in tests/test_skew_stat.py.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Plans embed the word array literally below this bit count; larger filters
# switch to a broadcast bitmap + pandas UDF so the plan stays small.
_LITERAL_MAX_BITS = 1 << 20


def optimal_m_k(expected_items: int, fpp: float) -> tuple[int, int]:
    """Standard Bloom sizing: m = -n ln p / (ln 2)^2 bits (rounded up to a
    64-bit word), k = (m/n) ln 2 hash functions."""
    n = max(1, expected_items)
    m = math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))
    m = ((m + 63) // 64) * 64
    k = max(1, round(m / n * math.log(2)))
    return m, k


def _positions(col: Column, k: int, m: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m)).cast("long") for i in range(k)
    ]


@dataclass(frozen=True)
class BloomSketch:
    """An immutable built filter: m bits in uint64 words + k hash seeds."""

    m: int
    k: int
    words: np.ndarray  # uint64[m // 64]

    @property
    def n_set_bits(self) -> int:
        return int(np.unpackbits(self.words.view(np.uint8)).sum())

    def might_contain(self, col: Column) -> Column:
        """Membership test as a Column. False ⇒ definitely absent;
        True ⇒ present with probability ≈ 1 - fpp. Null input ⇒ null
        (mirrors SQL three-valued logic)."""
        if self.m <= _LITERAL_MAX_BITS:
            return self._might_contain_literal(col)
        return self._might_contain_broadcast(col)

    def _might_contain_literal(self, col: Column) -> Column:
        """All-JVM path: the word array rides in the plan as a literal and
        every bit test is codegen (shift/and) — zero Python in the hot loop."""
        words_lit = F.array(*[F.lit(int(w)) for w in self.words.view(np.int64)])
        # shiftleft() only takes a literal shift amount, so index a 64-entry
        # power-of-two literal array by (pos % 64) instead.
        pow2 = F.array(
            *[F.lit(int(np.int64(np.uint64(1) << np.uint64(i)))) for i in range(64)]
        )
        checks = []
        for pos in _positions(col, self.k, self.m):
            word = F.element_at(words_lit, F.floor(pos / 64).cast("int") + 1)
            bit = F.element_at(pow2, (pos % 64).cast("int") + 1)
            checks.append(word.bitwiseAND(bit) != 0)
        out = checks[0]
        for c in checks[1:]:
            out = out & c
        return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(out)

    def _might_contain_broadcast(self, col: Column) -> Column:
        """Large-filter path: positions are still hashed JVM-side; only the
        bit lookup crosses to Python, Arrow-batched against a broadcast
        numpy bitmap (words are process-local, not per-row serialized)."""
        from pyspark.sql.functions import pandas_udf

        words = self.words  # captured by value into the UDF closure

        @pandas_udf("boolean")
        def _test(pos_arrays: pd.Series) -> pd.Series:
            def check(arr: object) -> bool | None:
                if arr is None:
                    return None
                a = np.asarray(arr, dtype=np.int64)
                return bool(np.all((words[a // 64] >> (a % 64).astype(np.uint64)) & 1))

            return pos_arrays.map(check)

        pos_arr = F.when(
            col.isNull(), F.lit(None).cast("array<long>")
        ).otherwise(F.array(*_positions(col, self.k, self.m)))
        return _test(pos_arr)


def _word_bitmap_df(src: DataFrame, k: int, m: int) -> DataFrame:
    """(word index, 64-bit OR of that word's set bits) — ONE hash
    aggregation (partial bit_or map-side, final after the single shuffle),
    no distinct/Expand stage. Exposed for the plan-shape test."""
    return (
        src.select(F.explode(F.array(*_positions(F.col("v"), k, m))).alias("p"))
        .select(
            F.floor(F.col("p") / 64).cast("long").alias("w"),
            # shiftleft's Python wrapper wants a literal shift; the SQL
            # expression form accepts a column.
            F.expr("shiftleft(1L, CAST(p % 64 AS INT))").alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_build(
    df: DataFrame,
    col: str,
    expected_items: int | None = None,
    fpp: float = 0.03,
) -> BloomSketch:
    """Build a Bloom filter over ``df[col]`` (nulls skipped, like
    BloomFilter.putLong). ``expected_items`` defaults to a count(distinct)
    pass — pass it explicitly to skip that job.

    Scale: the cluster folds bit positions into bitmap WORDS (bit_or per
    word index — map-side combine, then one shuffle of ≤ m/64 groups); the
    driver receives at most m/64 longs, the same bytes the bitmap itself
    occupies. (Collecting set-bit positions as rows — the previous shape —
    costs ~100 B per set bit in driver Row objects: tens of GB for a 1e9-item
    filter versus the m/8 bytes collected here.)"""
    c = F.col(col)
    src = df.select(c.alias("v")).filter(c.isNotNull())
    if expected_items is None:
        expected_items = src.select(F.count_distinct("v")).head()[0] or 1
    m, k = optimal_m_k(expected_items, fpp)
    words = np.zeros(m // 64, dtype=np.uint64)
    for r in _word_bitmap_df(src, k, m).collect():
        words[r.w] = np.uint64(r.bits & 0xFFFFFFFFFFFFFFFF)
    return BloomSketch(m=m, k=k, words=words)
