from ops_spark.plans.explain import plan_summary
from ops_spark.plans.shuffle_policy import (
    ShufflePolicy,
    advise_partitions,
    observe_rows,
    rebalance,
    shuffle_report,
    spread,
    stage_shuffle_metrics,
)

__all__ = [
    "plan_summary",
    "ShufflePolicy",
    "advise_partitions",
    "observe_rows",
    "rebalance",
    "shuffle_report",
    "spread",
    "stage_shuffle_metrics",
]
