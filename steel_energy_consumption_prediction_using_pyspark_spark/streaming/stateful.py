"""Custom stateful streaming operators via applyInPandasWithState.

The built-in windows (streaming/windows.py) cover time-bucketed
aggregation; this module is the escape hatch for per-key state machines
the built-ins can't express (running counters with custom eviction,
CEP-ish patterns). State lives in the state store (checkpointed,
fault-tolerant); each micro-batch delivers a key's new rows as pandas
DataFrames.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id long, n_events long, total_value double"
STATE_SCHEMA = "n long, total double"


def _running_totals(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (n, total) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [total]}
    )


def running_totals_per_user(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum(value)) maintained across
    micro-batches. Update mode: each batch emits the keys it touched."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# --- transformWithState (Spark 4 arbitrary-state API) -----------------------
#
# applyInPandasWithState (above) is the Spark 3.x escape hatch: ONE
# monolithic state tuple per key. transformWithStateInPandas is its
# Spark 4 successor — typed state variables (Value/List/Map) with
# per-variable TTL, timers, and initial-state bootstrap. The map-state
# operator below keeps a per-user event-type histogram: the state-store
# footprint is one map entry per (user, type), not one row per event —
# the bounded-state property that makes it run forever on a stream.
#
# Runtime dependency note: the TWS Python driver worker speaks
# protobuf to the JVM state server; in environments without
# google.protobuf the query fails at initialization
# (STREAMING_PYTHON_RUNNER_INITIALIZATION_FAILURE). The operator and
# its parity test gate on that import; applyInPandasWithState above
# has no such dependency and covers the same per-key-state semantics.

from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

TYPE_COUNTS_SCHEMA = "user_id long, event_type string, cnt long"


class _TypeCountsProcessor(StatefulProcessor):
    """Per-user event-type counts in a MapState, emitted (full map)
    whenever the key sees new rows."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "type_counts", "event_type string", "cnt long"
        )

    def handleInputRows(self, key, rows, timerValues):
        batch: dict[str, int] = {}
        for pdf in rows:
            for et, c in pdf["event_type"].value_counts().items():
                batch[et] = batch.get(et, 0) + int(c)
        for et, c in batch.items():
            prev = (
                self._counts.getValue((et,))[0]
                if self._counts.containsKey((et,))
                else 0
            )
            self._counts.updateValue((et,), (prev + c,))
        types, counts = [], []
        for k in self._counts.keys():
            types.append(k[0])
            counts.append(self._counts.getValue(k)[0])
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(types),
                "event_type": types,
                "cnt": counts,
            }
        )

    def close(self) -> None:
        pass


def type_counts_per_user(events: DataFrame) -> DataFrame:
    """Per-user event-type histogram via transformWithStateInPandas.
    Update mode: a micro-batch emits the full current map for every
    key it touched; the last emission per (user, type) is the final
    count."""
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=_TypeCountsProcessor(),
        outputStructType=TYPE_COUNTS_SCHEMA,
        outputMode="update",
        timeMode="none",
    )
