"""As-of (most-recent-match) join as a first-class operator.

Absent in the reference (SURVEY §2.3: non-equi conditions fall to
BroadcastNestedLoopJoin / cartesian in 2.4's JoinSelection,
SparkStrategies.scala:148); the scale-first expression is union + one
partitioned window pass instead of a per-key nested loop:

1. tag both sides and union on (by-keys, time),
2. one window per by-key ordered by time carries the latest right-side
   payload forward (``last(..., ignorenulls=True)``),
3. keep left rows.

Cost at 100 TB: ONE shuffle of |L|+|R| on the by-keys — identical to an
equi join, no quadratic candidate stage, AQE-skew-splittable. pandas
exposes the same semantics single-node as ``merge_asof``; the property
test (tests/test_properties.py) pins this operator against it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str | list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: for each left row, attach the right row with the
    greatest ``on`` value <= the left row's (backward direction; ties at
    equal ``on`` DO match). Right rows tied on (by, on) are resolved to
    the greatest payload struct — document ties away upstream if that
    matters. Unmatched left rows keep nulls (left-outer semantics).

    ``by`` keys drive the shuffle; without them the window is a single
    partition (fine for small frames, not for 100 TB — always pass keys
    at scale).
    """
    if direction != "backward":
        raise NotImplementedError("only backward as-of is implemented")
    by_keys = [by] if isinstance(by, str) else list(by or [])
    payload_cols = [c for c in right.columns if c != on and c not in by_keys]
    payload_t = right.select(F.struct(*payload_cols).alias("p")).schema[0].dataType

    left_cols = [c for c in left.columns if c != on and c not in by_keys]
    l_tagged = left.select(
        *by_keys,
        F.col(on),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(payload_t).alias("__payload"),
        *left_cols,
    )
    r_tagged = right.select(
        *by_keys,
        F.col(on),
        F.lit(0).alias("__is_left"),
        F.struct(*payload_cols).alias("__payload"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # Right rows sort before left rows at identical `on` (__is_left ASC) so
    # a left row exactly at a right timestamp sees it (<= semantics);
    # __payload ASC means last() lands on the GREATEST struct among right
    # rows tied on (by, on) — the tie-break the docstring promises.
    w = (
        W.partitionBy(*by_keys)
        .orderBy(F.col(on).asc(), F.col("__is_left").asc(), F.col("__payload").asc())
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    matched = (
        unioned.withColumn("__m", F.last("__payload", ignorenulls=True).over(w))
        .filter(F.col("__is_left") == 1)
    )
    return matched.select(
        *by_keys,
        F.col(on),
        *left_cols,
        *[F.col(f"__m.{c}").alias(c) for c in payload_cols],
    )
