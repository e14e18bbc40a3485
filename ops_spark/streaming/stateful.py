"""Arbitrary stateful streaming operators (applyInPandasWithState).

Capability parity: the reference's FlatMapGroupsWithStateExec
(streaming/FlatMapGroupsWithStateExec.scala:44, GroupStateImpl.scala,
strategy SparkStrategies.scala:506) — re-expressed through modern PySpark's
applyInPandasWithState (Arrow-batched per-group state, the Python-native
descendant of flatMapGroupsWithState).

Scale notes: state lives in the state store keyed by group — at 100 TB the
group key must be high-cardinality-bounded (users, sessions), never content;
use RocksDB state store (spark.sql.streaming.stateStore.providerClass) for
state larger than executor heap.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ops_spark._pickle import register_self

# module-level fns ship to Python workers -> pickle by value
register_self(__name__)

USER_TOTALS_SCHEMA = (
    "user_id bigint, n_events bigint, total_value double, max_value double"
)
_STATE_SCHEMA = "n bigint, total double, mx double"


def _update_user_totals(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Running per-user totals: count, sum(value), max(value).

    Emits the updated aggregate once per batch the user appears in —
    deterministic for a bounded single-batch source (the batch-equivalence
    contract run_bounded relies on).
    """
    if state.exists:
        n, total, mx = state.get
    else:
        n, total, mx = 0, 0.0, float("-inf")
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [key[0]],
            "n_events": [n],
            "total_value": [round(total, 4)],
            "max_value": [mx],
        }
    )


def user_totals_stateful(events: DataFrame) -> DataFrame:
    """Per-user running totals via applyInPandasWithState."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=USER_TOTALS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


EXPIRING_SCHEMA = "user_id bigint, n_events bigint, status string"


def _expire_user_sessions(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Open a per-user session on data; when the user goes quiet for the
    timeout duration, the TIMEOUT callback (hasTimedOut=True, no input)
    emits the final 'expired' record and removes state — the
    GroupStateTimeout lifecycle (reference GroupStateImpl.scala timeout
    semantics) end to end, including Spark's no-data micro-batches that
    fire timers when no new input arrives."""
    if state.hasTimedOut:
        (n,) = state.get
        state.remove()
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "status": ["expired"]}
        )
        return
    n = state.get[0] if state.exists else 0
    for pdf in pdfs:
        n += len(pdf)
    state.update((n,))
    state.setTimeoutDuration(1500)
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "status": ["open"]})


def expiring_sessions(events: DataFrame) -> DataFrame:
    """Per-user sessions that emit a final record on processing-time
    timeout (the state-expiry half of the FlatMapGroupsWithState
    contract)."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _expire_user_sessions,
            outputStructType=EXPIRING_SCHEMA,
            stateStructType="n bigint",
            outputMode="update",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def user_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running totals via transformWithStateInPandas (Spark 4).

    The modern successor to applyInPandasWithState (reference
    FlatMapGroupsWithStateExec.scala:44 kin): typed state primitives
    (ValueState/ListState/MapState), timers, and TTL on a per-key handle.
    Requires the RocksDB state store provider — which is also the 100 TB
    posture: per-key state is spilled to local RocksDB + changelog
    checkpointing instead of being bounded by executor heap.

    ENV GAP: executing this operator needs protobuf (the TWS state-server
    protocol) which is absent from this image, so tests pin the logical
    plan only; stream_stateful_rocksdb runs the same semantics through
    applyInPandasWithState on RocksDB for the executable gate.
    """
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TotalsProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "totals", "n bigint, total double, mx double"
            )

        def handleInputRows(self, key, rows, timerValues):
            n, total, mx = 0, 0.0, float("-inf")
            if self._state.exists():
                n, total, mx = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                if len(pdf):
                    mx = max(mx, float(pdf["value"].max()))
            self._state.update((n, total, mx))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 4)],
                    "max_value": [mx],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            TotalsProcessor(),
            outputStructType=USER_TOTALS_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )
