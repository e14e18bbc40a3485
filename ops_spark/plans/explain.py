"""Physical-plan introspection.

The reference exposes its execution strategy through the plan tree
(reference: QueryExecution.scala:77 executedPlan, EnsureRequirements.scala:38
exchange placement, WholeStageCodegenExec.scala:704 pipeline fusion). This
module reads the same signals from the formatted plan so tests — and the
shuffle-policy layer — can assert plan SHAPE, not just results:

- did the filter reach the parquet scan (PushedFilters)?
- did the small side broadcast (BroadcastHashJoin/BroadcastExchange)?
- how many shuffles (Exchange) does the query pay?
- is the hot path inside whole-stage codegen?
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class PlanSummary:
    n_shuffle_exchanges: int
    n_broadcast_exchanges: int
    n_broadcast_hash_joins: int
    n_sort_merge_joins: int
    n_shuffled_hash_joins: int
    n_nested_loop_joins: int
    n_cartesian: int
    has_pushed_filters: bool
    pushed_filters: list[str]
    has_partial_aggregate: bool
    has_wholestage_codegen: bool
    has_take_ordered: bool
    read_schemas: list[str]
    text: str

    def total_joins(self) -> int:
        return (
            self.n_broadcast_hash_joins
            + self.n_sort_merge_joins
            + self.n_shuffled_hash_joins
            + self.n_nested_loop_joins
            + self.n_cartesian
        )


def plan_summary(df: DataFrame) -> PlanSummary:
    """Summarize the physical plan (pre-execution AQE plan)."""
    qe = df._jdf.queryExecution()
    jvm = df._sc._jvm  # type: ignore[attr-defined]
    text = jvm.PythonSQLUtils.explainString(qe, "formatted")
    # codegen star-markers (`*(1) HashAggregate`) only appear in simple mode
    simple = jvm.PythonSQLUtils.explainString(qe, "simple")
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", text)
    pushed_nonempty = [p for p in pushed if p.strip()]
    read_schemas = re.findall(r"ReadSchema: (\S+)", text)
    # formatted mode names operators as numbered detail blocks: `(5) Exchange`
    block = lambda op: len(re.findall(rf"\(\d+\) {op}\b", text))
    return PlanSummary(
        n_shuffle_exchanges=block("Exchange"),
        n_broadcast_exchanges=block("BroadcastExchange"),
        n_broadcast_hash_joins=block("BroadcastHashJoin"),
        n_sort_merge_joins=block("SortMergeJoin"),
        n_shuffled_hash_joins=block("ShuffledHashJoin"),
        n_nested_loop_joins=block("BroadcastNestedLoopJoin"),
        n_cartesian=block("CartesianProduct"),
        has_pushed_filters=bool(pushed_nonempty),
        pushed_filters=pushed_nonempty,
        has_partial_aggregate="partial_" in text,
        has_wholestage_codegen=bool(re.search(r"\*\(\d+\)", simple)),
        has_take_ordered="TakeOrderedAndProject" in text,
        read_schemas=read_schemas,
        text=text,
    )
