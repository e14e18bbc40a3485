from ops_spark.plans.cbo import (
    analyze,
    cbo,
    join_leaf_order,
    snapshot_tables,
    table_row_count_stat,
)
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
    "analyze",
    "cbo",
    "join_leaf_order",
    "plan_summary",
    "snapshot_tables",
    "table_row_count_stat",
    "ShufflePolicy",
    "advise_partitions",
    "observe_rows",
    "rebalance",
    "shuffle_report",
    "spread",
    "stage_shuffle_metrics",
]
